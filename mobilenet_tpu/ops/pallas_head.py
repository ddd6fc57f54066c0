"""Fused classifier head: [conv_last 1x1] -> pool -> [head 1x1] -> fc.

The head of every family is a chain of tiny ops at 7x7 (or res/32)
spatial: V3-Large runs conv_last (160 -> 960) + hswish, global average
pool, the post-pool head matmul (960 -> 1280) + hswish, and the fc
(1280 -> 1000) — four kernel launches plus elementwise glue for ~0.5
GMAC of actual work. The 2026-08-19 prefix attribution measured the
stretch at 1.43 ms/batch-256 against a 0.03 ms floor: launch/dispatch
overhead, not compute (reference analog: BASELINE.json:5's fused-epilogue
discipline, taken to the whole head).

This kernel runs the entire chain in ONE Pallas invocation, gridded over
batch tiles: the conv_last matmul on the MXU, the pool as an in-register
reduction over the resident spatial extent (the pallas_ir_v3 SE-gate
trick), and the post-pool matmuls back-to-back on VMEM-resident weights.
Numerics follow the XLA ops' exact op order and cast points
(ops/conv.py pointwise_conv -> global_avg_pool -> mobilenet_v3.head_matmul
-> ops/conv.fc): f32 accumulation, bias + activation in f32, cast to the
compute dtype between stages — same reassociation class as the fused
block kernels, gated by the routing tolerance (golden.ROUTING_BF16_*).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dw import _should_interpret


def _kact(y, act: str):
    if act == "linear":
        return y
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "relu6":
        return jnp.clip(y, 0.0, 6.0)
    assert act == "hswish", act
    return y * (jnp.clip(y + 3.0, 0.0, 6.0) * (1.0 / 6.0))


def _head_kernel(*refs, bn, hw, conv_act, post_acts, dt, n_post):
    if conv_act is not None:
        x_ref, cw_ref, cb_ref = refs[0], refs[1], refs[2]
        wrefs = refs[3 : 3 + 2 * n_post]
        o_ref = refs[3 + 2 * n_post]
    else:
        x_ref = refs[0]
        wrefs = refs[1 : 1 + 2 * n_post]
        o_ref = refs[1 + 2 * n_post]

    xv = x_ref[...]                                  # (BN*HW, C)
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    if conv_act is not None:
        y = jnp.dot(xv, cw_ref[...], precision=prec,
                    preferred_element_type=jnp.float32)
        y = _kact(y + cb_ref[0].astype(jnp.float32), conv_act)
        y = y.astype(dt)                             # conv_last cast point
    else:
        y = xv
    # global average pool over the resident spatial extent (f32 mean, cast
    # back — ops/conv.global_avg_pool's exact op order)
    e = y.shape[-1]
    pooled = jnp.mean(y.astype(jnp.float32).reshape(bn, hw, e), axis=1)
    h = pooled.astype(dt)
    for j, act in enumerate(post_acts):
        w_ref, b_ref = wrefs[2 * j], wrefs[2 * j + 1]
        v = jnp.dot(h, w_ref[...], precision=prec,
                    preferred_element_type=jnp.float32)
        v = _kact(v + b_ref[0].astype(jnp.float32), act)
        h = v.astype(dt)
    o_ref[...] = h


def head_fits(n: int, h: int, w: int, c: int,
              conv: Optional[Tuple], post: Sequence[Tuple],
              itemsize: int = 2) -> bool:
    """Static feasibility: one batch tile of the fused head under the
    scoped-VMEM cap (same style as the block kernels' est)."""
    return _pick_bn(n, h * w, c, conv, post, itemsize) > 0


def _est(bn, hw, c, conv, post, itm):
    e = int(conv[0].shape[1]) if conv is not None else c
    u_x = bn * hw * c * itm * 2            # pipelined in blocks
    u_y = bn * hw * e * (4 + itm)          # f32 conv out + cast
    wts = 0
    if conv is not None:
        wts += (c * e + e) * itm
    widths = []
    prev = e
    for w_, _b, _a in post:
        wts += (prev * int(w_.shape[1]) + int(w_.shape[1])) * itm
        widths.append(int(w_.shape[1]))
        prev = int(w_.shape[1])
    u_post = bn * (max(widths) if widths else e) * (4 + itm) * 2
    u_out = bn * prev * itm * 2
    return int(1.2 * (u_x + u_y + u_post + u_out)) + wts


def _pick_bn(n, hw, c, conv, post, itm):
    cap = int(13 * 2**20)
    bn = 0
    for cand in (256, 128, 64, 32, 16, 8, 4, 2, 1):
        if n % cand == 0 and (cand * hw) % 8 == 0 and _est(
                cand, hw, c, conv, post, itm) <= cap:
            bn = cand
            break
    return bn


@functools.partial(jax.jit, static_argnames=("conv_act", "post_acts",
                                             "interpret"))
def _call(x, conv_w, conv_b, post_flat, conv_act, post_acts, interpret):
    n, h, w, c = x.shape
    hw = h * w
    dt = x.dtype
    itm = jnp.dtype(dt).itemsize
    conv = (conv_w, conv_b, conv_act) if conv_act is not None else None
    post = [(post_flat[2 * j], post_flat[2 * j + 1], a)
            for j, a in enumerate(post_acts)]
    bn = _pick_bn(n, hw, c, conv, post, itm)
    assert bn, "head kernel does not fit VMEM; use the XLA ops"
    n_post = len(post)
    out_c = int(post[-1][0].shape[1]) if post else (
        int(conv_w.shape[1]) if conv is not None else c)

    in_specs = [pl.BlockSpec((bn * hw, c), lambda b: (b, 0),
                             memory_space=pltpu.VMEM)]
    args = [x.reshape(n * hw, c)]
    if conv is not None:
        e = int(conv_w.shape[1])
        in_specs += [
            pl.BlockSpec((c, e), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += [conv_w.astype(dt), conv_b.reshape(1, -1)]
    for w_, b_, _a in post:
        ki, ko = int(w_.shape[0]), int(w_.shape[1])
        in_specs += [
            pl.BlockSpec((ki, ko), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ko), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [w_.astype(dt), b_.reshape(1, -1)]

    kernel = functools.partial(
        _head_kernel, bn=bn, hw=hw, conv_act=conv_act,
        post_acts=tuple(post_acts), dt=dt, n_post=n_post)
    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bn, out_c), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_c), dt),
        interpret=interpret,
    )(*args)


def fused_head(
    x: jax.Array,
    conv: Optional[Tuple[jax.Array, jax.Array, str]],
    post: Sequence[Tuple[jax.Array, jax.Array, str]],
    *,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Run [conv_last] -> pool -> post-matmul chain in one Pallas kernel.

    x: (N, H, W, C) at the compute dtype. conv: (w (C,E), b, act) or None.
    post: [(w, b, act), ...] applied after the pool (the last is usually
    the fc with act="linear"). Returns (N, out_c) in x.dtype — the same
    value class as the XLA ops chain (pointwise_conv -> global_avg_pool ->
    matmul chain), within the bf16 reassociation tolerance."""
    if interpret is None:
        interpret = _should_interpret()
    conv_act = conv[2] if conv is not None else None
    conv_w = conv[0] if conv is not None else None
    conv_b = conv[1] if conv is not None else None
    post_flat = []
    for w_, b_, _a in post:
        post_flat += [w_, b_]
    return _call(x, conv_w, conv_b, tuple(post_flat), conv_act,
                 tuple(a for _w, _b, a in post), interpret)
