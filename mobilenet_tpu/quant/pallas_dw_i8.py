"""Pallas INT8 depthwise 3x3 kernel with fused per-layer requantization.

The int8 twin of ops/pallas_dw.py — "per-layer requantization in Pallas"
(BASELINE.json:10). int32 tap accumulation on the VPU; the requant epilogue
(float32 multiplier, in-domain ReLU6, round-half-even, clamp, int8 store) runs
in-kernel so quantized activations never leave VMEM in a wider type.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_dw import _pick_block_c, _pick_block_h, _should_interpret


def _requant_val(acc, m_vec, six_q, relu6):
    v = acc.astype(jnp.float32) * m_vec.astype(jnp.float32)
    v = jnp.maximum(v, 0.0)
    if relu6:
        v = jnp.minimum(v, six_q)
        if six_q < 127.5:
            # In-domain ReLU6 already bounds round(v) to [0, 127] (six_q is
            # 127.0 for the fixed 6/127 hidden scale): the final clip is
            # provably redundant — 2 fewer VPU ops per element, bit-identical.
            return jnp.round(v).astype(jnp.int8)
    return jnp.clip(jnp.round(v), -128, 127).astype(jnp.int8)


def _kernel_s1(x_ref, w_ref, b_ref, m_ref, o_ref, *, th, w_out, six_q, relu6):
    xv = x_ref[0]
    acc = jnp.zeros((th, w_out, xv.shape[-1]), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            tap = xv[dy : dy + th, dx : dx + w_out, :].astype(jnp.int32)
            acc = acc + tap * w_ref[dy, dx, :].astype(jnp.int32)
    acc = acc + b_ref[0].astype(jnp.int32)
    o_ref[...] = _requant_val(acc, m_ref[0], six_q, relu6)


def _kernel_s2(x_ref, w_ref, b_ref, m_ref, o_ref, *, th, w_out, six_q, relu6):
    # int32 up front: Mosaic can't shape-cast 8-bit vectors (int8 tiles are
    # (32,128)); the accumulator is int32 anyway.
    xv = x_ref[0].astype(jnp.int32)  # (2TH+2, W_in, CT), W_in even
    ct = xv.shape[-1]
    w_in = xv.shape[1]
    rows = xv.reshape(th + 1, 2, w_in, ct)
    row_phase = (rows[:, 0], rows[:, 1])

    def cols(r, dx):
        c2 = r.reshape(r.shape[0], w_in // 2, 2, ct)
        phase, off = (dx % 2), (dx // 2)
        return c2[:, off : off + w_out, phase, :]

    acc = jnp.zeros((th, w_out, ct), jnp.int32)
    for dy in range(3):
        r = row_phase[dy % 2]
        r_off = dy // 2
        for dx in range(3):
            tap = cols(r, dx)[r_off : r_off + th].astype(jnp.int32)
            acc = acc + tap * w_ref[dy, dx, :].astype(jnp.int32)
    acc = acc + b_ref[0].astype(jnp.int32)
    o_ref[...] = _requant_val(acc, m_ref[0], six_q, relu6)


@functools.partial(
    jax.jit, static_argnames=("stride", "six_q", "relu6", "block_h", "block_c", "interpret")
)
def depthwise_i8_pallas(
    x_i8: jax.Array,
    w_i8: jax.Array,  # (3, 3, 1, C)
    bias_i32: jax.Array,
    m: jax.Array,
    stride: int,
    six_q: float,
    relu6: bool = True,
    *,
    block_h: Optional[int] = None,
    block_c: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = _should_interpret()
    n, h, wdim, c = x_i8.shape
    assert w_i8.shape == (3, 3, 1, c)
    h_out = -(-h // stride)
    w_out = -(-wdim // stride)
    th = block_h or _pick_block_h(h_out)
    ct = block_c or _pick_block_c(c)
    if c % ct:
        ct = c
    while h_out % th:
        th -= 1

    def same_lo(size):
        out = -(-size // stride)
        total = max((out - 1) * stride + 3 - size, 0)
        return total // 2

    need_h = h_out + 2 if stride == 1 else 2 * h_out + 2
    need_w = w_out + 2 if stride == 1 else 2 * w_out + 2
    lo_h, lo_w = same_lo(h), same_lo(wdim)
    xp = jnp.pad(
        x_i8, ((0, 0), (lo_h, need_h - lo_h - h), (lo_w, need_w - lo_w - wdim), (0, 0))
    )
    w_in = need_w
    if stride == 1:
        th_in, row_stride = th + 2, th
        kernel = functools.partial(_kernel_s1, th=th, w_out=w_out, six_q=six_q, relu6=relu6)
    else:
        th_in, row_stride = 2 * th + 2, 2 * th
        kernel = functools.partial(_kernel_s2, th=th, w_out=w_out, six_q=six_q, relu6=relu6)

    wk = w_i8.reshape(3, 3, c)
    b2 = bias_i32.reshape(1, c)
    m2 = m.reshape(1, c)
    grid = (n, h_out // th, c // ct)

    if c == ct:
        x_index = lambda b_, i, j: (b_, i * row_stride, 0, 0)
    else:
        x_index = lambda b_, i, j: (b_, i * row_stride, 0, j * ct)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(th_in), pl.Element(w_in), pl.Element(ct)),
                x_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, ct), lambda b_, i, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda b_, i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ct), lambda b_, i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (pl.Squeezed(), th, w_out, ct),
            lambda b_, i, j: (b_, i, 0, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, c), jnp.int8),
        interpret=interpret,
    )(xp, wk, b2, m2)
