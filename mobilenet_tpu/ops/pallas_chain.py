"""Multi-block chain kernel: several identical separable blocks in ONE
Pallas call, intermediates never touching HBM.

STATUS: experimental, not routed by default — measured 2.97 ms vs 2.61 ms for
five separate fused-block calls on the 14x14x512 stretch (batch 256): the
in-kernel sequential dependency chain loses the cross-grid-step DMA/compute
pipelining that separate calls get, and HBM traffic there is not the
bottleneck. Kept as the starting point for a smarter software-pipelined
version.

MobileNet's tail has five identical (14x14, 512->512, stride 1) blocks
(SURVEY.md SS2 layers 14-23). At that size a whole image fits in a few
hundred KB of VMEM and all five blocks' weights total ~2.6 MB bf16, so the
entire stretch can run per-image with ZERO intermediate HBM traffic — the
logical conclusion of the dw+pw fusion (each fused block still writes its
output to HBM; the chain writes once per five blocks).

Requires: stride 1, H == W small enough that (BN, H+2, W+2, C) activations
plus stacked weights fit VMEM; every block same (C -> C) shape.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dw import _should_interpret


def _chain_kernel(x_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, o_ref, s_ref,
                  *, k_blocks, hh, ww, relu6, bn, out_dtype):
    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    act = x_ref[...]  # (BN, H, W, C)
    c = act.shape[-1]
    prec = (
        jax.lax.Precision.HIGHEST
        if pww_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    for k in range(k_blocks):
        s_ref[:, 1 : hh + 1, 1 : ww + 1, :] = act
        sv = s_ref[...]
        acc = jnp.zeros((bn, hh, ww, c), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = sv[:, dy : dy + hh, dx : dx + ww, :].astype(jnp.float32)
                acc = acc + tap * dww_ref[k, dy, dx, :].astype(jnp.float32)
        y = acc + dwb_ref[k].astype(jnp.float32)
        y = jnp.maximum(y, 0.0)
        if relu6:
            y = jnp.minimum(y, 6.0)
        y2 = y.astype(pww_ref.dtype).reshape(bn * hh * ww, c)
        out = jnp.dot(y2, pww_ref[k], preferred_element_type=jnp.float32,
                      precision=prec)
        out = out + pwb_ref[k].astype(jnp.float32)
        out = jnp.maximum(out, 0.0)
        if relu6:
            out = jnp.minimum(out, 6.0)
        act = out.reshape(bn, hh, ww, c).astype(act.dtype)
    o_ref[...] = act.astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("relu6", "block_n", "interpret")
)
def chained_blocks_pallas(
    x: jax.Array,        # (N, H, W, C)
    dw_ws: jax.Array,    # (K, 3, 3, C)  (reshaped from (3,3,1,C) stack)
    dw_bs: jax.Array,    # (K, C)
    pw_ws: jax.Array,    # (K, C, C)
    pw_bs: jax.Array,    # (K, C)
    relu6: bool = True,
    *,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    if interpret is None:
        interpret = _should_interpret()
    n, hh, ww, c = x.shape
    k_blocks = dw_ws.shape[0]
    assert pw_ws.shape == (k_blocks, c, c), pw_ws.shape

    bn = block_n or 1
    if block_n is None:
        # grow batch tile while activations stay small; weights are shared
        while (
            bn * 2 <= n and n % (bn * 2) == 0
            and bn * 2 * (hh + 2) * (ww + 2) * c * 4 * 3 < 4 * 2**20
            and bn * hh * ww < 1024
        ):
            bn *= 2
    while n % bn:
        bn -= 1

    kernel = functools.partial(
        _chain_kernel, k_blocks=k_blocks, hh=hh, ww=ww, relu6=relu6, bn=bn,
        out_dtype=x.dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(hh), pl.Element(ww), pl.Element(c)),
                lambda b_: (b_ * bn, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((k_blocks, 3, 3, c), lambda b_: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_blocks, c), lambda b_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_blocks, c, c), lambda b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_blocks, c), lambda b_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, hh, ww, c), lambda b_: (b_, 0, 0, 0), memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, hh, ww, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bn, hh + 2, ww + 2, c), x.dtype)],
        interpret=interpret,
    )(x, dw_ws, dw_bs, pw_ws, pw_bs)
