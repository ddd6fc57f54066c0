"""Fused depthwise+pointwise Pallas kernel: one separable block per call.

The core TPU-native optimization (SURVEY.md SS7 hard parts; cf. PAPERS.md
"Fusing Depthwise and Pointwise Convolutions"): the depthwise 3x3 result for a
row-tile never leaves VMEM — it feeds the pointwise MXU matmul directly, so
each block's intermediate (N,H,W,Cin) activation costs ZERO HBM traffic, and
no padded copy of the input is ever materialized in HBM either.

Key structures:
  - grid (N/BN, H_out/TH): BN images x TH output rows per step. BN > 1 for
    small-spatial layers so the MXU matmul M-dim (BN*TH*W') stays full and
    fixed per-step overheads amortize.
  - input row-windows are always fully IN-BOUNDS (element-window offsets
    clamped at the image bottom — OOB windows are a hard device error). Each
    step normalizes its window into a zero-bordered VMEM scratch tile (tiny
    position-dependent copies under @pl.when); borders are zeroed once at the
    first grid step and kept clean by the copy pattern, so the 9-tap stencil
    + MXU matmul run on ONE branch-free path.
  - stride 2 accumulates at FULL input width (9 in-bounds shifted FMAs — ~2x
    VPU flops, which are nearly free) and subsamples even columns with a
    single reshape-gather of the accumulator, instead of 9 strided gathers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dw import _should_interpret


# Stride-2 even-column selection strategy (A/B-measurable):
#   False — one reshape-gather of the f32 accumulator (round-1 design)
#   True  — keep full width, free lane-merge (W,C)->(W/2,2C), and drop odd
#           columns in the MXU with a K-zero-padded pointwise weight
#           [[W],[0]] — no gather at all (relayouts are the enemy;
#           docs/design.md SS3.2). Read at trace time.
# Default FALSE for bf16 — measured 11.21 (gather) vs 11.41 (MXU) ms/batch-256
# e2e at 1.0-224 (interleaved medians, tools/ab_s2.py): the bf16 act epilogue
# at full width costs more than the f32 gather saves. The int8 twin measured
# the OPPOSITE (MXU selection wins there; quant/pallas_block_i8.py).
S2_MXU_SUBSAMPLE = False


def _act(y, relu6):
    y = jnp.maximum(y, 0.0)
    if relu6:
        y = jnp.minimum(y, 6.0)
    return y


def _round_up(x, m):
    return -(-x // m) * m


def pick_tiles(n: int, h_out: int, wdim: int, cin: int, cout: int,
               stride: int, itemsize: int = 2,
               out_itemsize: Optional[int] = None) -> Tuple[int, int]:
    """(BN, TH): target MXU M-dim >= ~256 rows and <= ~6MB live VMEM.

    out_itemsize: byte size of the OUTPUT store (defaults to itemsize);
    the pw_epilogue=False partial mode writes float32 regardless of the
    input dtype, and sizing the out term at 2 bytes there would pick a
    tile one doubling too large for the calibrated scoped-VMEM budget."""
    c_pad = _round_up(cin, 128)
    co_pad = _round_up(cout, 128)
    if out_itemsize is None:
        out_itemsize = itemsize

    # Headroom factor for Mosaic's scoped-vmem stack allocator, calibrated
    # against observed compiles on v5e: the stride-2 full-width path keeps
    # ~3.5x the naive estimate live; stride 1 tracks the estimate closely.
    factor = 3.5 if stride == 2 else 1.0

    def est(bn, th):
        th_in = stride * th + 2
        win = bn * th_in * (wdim + 2) * c_pad * itemsize
        acc = bn * th * wdim * c_pad * 4
        out = bn * th * (wdim // stride) * co_pad * (4 + out_itemsize)
        weights = c_pad * co_pad * itemsize
        return factor * (3 * win + acc + out) + weights

    # Moderate row tiles (whole-image tiles measured slightly WORSE here:
    # single-window steps lose cross-step DMA/compute overlap), plus batch
    # tiling toward ~1024 MXU rows for the small-spatial layers.
    th = min(h_out, 16)
    while h_out % th:
        th -= 1
    bn = 1
    while (
        bn * 2 <= n
        and n % (bn * 2) == 0
        and bn * th * (wdim // stride) < 1024
        and est(bn * 2, th) < 8 * 1024 * 1024
    ):
        bn *= 2
    while est(bn, th) > 11 * 1024 * 1024 and th > 1:
        th -= 1
        while h_out % th:
            th -= 1
    return bn, th


def _block_kernel(
    x_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, o_ref, s_ref,
    *, th, w_out, stride, relu6, out_dtype, g, bn, wdim, mxu_subsample=False,
    pw_epilogue=True,
):
    i = pl.program_id(1)
    is_first_step = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    @pl.when(is_first_step)
    def _():
        # Zero once; the copy pattern below keeps borders clean afterwards.
        s_ref[...] = jnp.zeros_like(s_ref)

    # --- normalize window into the zero-bordered scratch tile -------------
    # scratch (BN, s_rows, W+2, C); image cols live at scratch cols
    # [1, W+1) for stride 1 and [0, W) for stride 2.
    if stride == 1:
        # scratch rows cover image rows [tile_start-1, tile_start+th]
        if g == 1:
            s_ref[:, 1 : th + 1, 1 : wdim + 1, :] = x_ref[...]
            @pl.when(jnp.logical_not(is_first_step))
            def _():
                s_ref[:, 0:1, 1 : wdim + 1, :] = jnp.zeros_like(s_ref[:, 0:1, 1 : wdim + 1, :])
                s_ref[:, th + 1 : th + 2, 1 : wdim + 1, :] = jnp.zeros_like(
                    s_ref[:, th + 1 : th + 2, 1 : wdim + 1, :])
        else:
            @pl.when(i == 0)
            def _():  # window = image rows [0, th+2)
                s_ref[:, 1 : th + 2, 1 : wdim + 1, :] = x_ref[:, 0 : th + 1]
                s_ref[:, 0:1, 1 : wdim + 1, :] = jnp.zeros_like(
                    s_ref[:, 0:1, 1 : wdim + 1, :])

            if g > 2:
                @pl.when(jnp.logical_and(i > 0, i < g - 1))
                def _():  # window = image rows [ts-1, ts+th+1)
                    s_ref[:, 0 : th + 2, 1 : wdim + 1, :] = x_ref[...]

            @pl.when(i == g - 1)
            def _():  # clamped window = image rows [ts-2, ts+th)
                s_ref[:, 0 : th + 1, 1 : wdim + 1, :] = x_ref[:, 1 : th + 2]
                s_ref[:, th + 1 : th + 2, 1 : wdim + 1, :] = jnp.zeros_like(
                    s_ref[:, th + 1 : th + 2, 1 : wdim + 1, :])
    else:
        # scratch rows cover image rows [2*ts, 2*ts+2th+1]; cols [0, W+1]
        if g == 1:
            s_ref[:, 0 : 2 * th, 0:wdim, :] = x_ref[...]
        else:
            @pl.when(i < g - 1)
            def _():
                s_ref[:, 0 : 2 * th + 2, 0:wdim, :] = x_ref[...]

            @pl.when(i == g - 1)
            def _():  # clamped window = image rows [2*ts-2, 2*ts+2th)
                s_ref[:, 0 : 2 * th, 0:wdim, :] = x_ref[:, 2 : 2 * th + 2]
                s_ref[:, 2 * th : 2 * th + 2, 0:wdim, :] = jnp.zeros_like(
                    s_ref[:, 2 * th : 2 * th + 2, 0:wdim, :])

    # --- branch-free 9-tap depthwise + MXU pointwise -----------------------
    sv = s_ref[...]
    c_in = sv.shape[-1]
    if stride == 1:
        acc = jnp.zeros((bn, th, w_out, c_in), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = sv[:, dy : dy + th, dx : dx + w_out, :].astype(jnp.float32)
                acc = acc + tap * dww_ref[dy, dx, :].astype(jnp.float32)
    else:
        # full-width accumulate; even-column selection either by one gather
        # or inside the MXU via the K-zero-padded weight (mxu_subsample).
        w_full = 2 * w_out
        pairs = sv.reshape(bn, th + 1, 2, wdim + 2, c_in)
        acc_f = jnp.zeros((bn, th, w_full, c_in), jnp.float32)
        for dy in range(3):
            r = pairs[:, dy // 2 : dy // 2 + th, dy % 2]  # (BN, th, W+2, C)
            for dx in range(3):
                tap = r[:, :, dx : dx + w_full, :].astype(jnp.float32)
                acc_f = acc_f + tap * dww_ref[dy, dx, :].astype(jnp.float32)
        if mxu_subsample:
            # epilogue at full width (odd columns are finite garbage that the
            # zero K-rows annihilate in the dot); lane-merge is free.
            y = _act(acc_f + dwb_ref[0].astype(jnp.float32), relu6)
            y2 = y.astype(pww_ref.dtype).reshape(bn * th * w_out, 2 * c_in)
            out = jnp.dot(
                y2, pww_ref[...], preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if pww_ref.dtype == jnp.float32
                           else jax.lax.Precision.DEFAULT),
            )
            if pw_epilogue:
                out = _act(out + pwb_ref[0].astype(jnp.float32), relu6)
            o_ref[...] = out.reshape(bn, th, w_out, -1).astype(out_dtype)
            return
        acc = acc_f.reshape(bn, th, w_out, 2, c_in)[:, :, :, 0, :]

    y = _act(acc + dwb_ref[0].astype(jnp.float32), relu6)
    y2 = y.astype(pww_ref.dtype).reshape(bn * th * w_out, c_in)
    # fp32 weights -> true-fp32 MXU passes (verify path); bf16 -> native MXU.
    prec = (
        jax.lax.Precision.HIGHEST
        if pww_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32, precision=prec)
    if pw_epilogue:
        out = _act(out + pwb_ref[0].astype(jnp.float32), relu6)
    o_ref[...] = out.reshape(bn, th, w_out, -1).astype(out_dtype)


def separable_block_pallas(
    x, dw_w, dw_b, pw_w, pw_b, stride, relu6=True, *,
    block_h=None, block_n=None, interpret=None, mxu_subsample=None,
    pw_epilogue=True,
):
    """Fused dw3x3(+BN+ReLU) -> pw1x1(+BN+ReLU). TF-SAME semantics.

    Requires even H, W for stride 2 (true for every MobileNet layer; odd
    shapes should use the unfused ops instead). mxu_subsample=None resolves
    the module default S2_MXU_SUBSAMPLE at call time (resolved OUTSIDE the
    jitted impl so it participates in the jit cache key).
    """
    if mxu_subsample is None:
        mxu_subsample = S2_MXU_SUBSAMPLE
    return _separable_block_impl(
        x, dw_w, dw_b, pw_w, pw_b, stride, relu6,
        block_h=block_h, block_n=block_n, interpret=interpret,
        mxu_subsample=bool(mxu_subsample), pw_epilogue=pw_epilogue,
    )


@functools.partial(
    jax.jit,
    static_argnames=("stride", "relu6", "block_h", "block_n", "interpret",
                     "mxu_subsample", "pw_epilogue"),
)
def _separable_block_impl(
    x: jax.Array,       # (N, H, W, Cin) unpadded
    dw_w: jax.Array,    # (3, 3, 1, Cin)
    dw_b: jax.Array,    # (Cin,)
    pw_w: jax.Array,    # (Cin, Cout)
    pw_b: jax.Array,    # (Cout,)
    stride: int,
    relu6: bool = True,
    *,
    block_h: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
    mxu_subsample: bool = False,
    pw_epilogue: bool = True,
) -> jax.Array:
    if interpret is None:
        interpret = _should_interpret()
    n, h, wdim, cin = x.shape
    cout = pw_w.shape[1]
    assert dw_w.shape == (3, 3, 1, cin)
    if stride == 2:
        assert h % 2 == 0 and wdim % 2 == 0, (h, wdim)
    h_out = -(-h // stride)
    w_out = -(-wdim // stride)

    bn_auto, th_auto = pick_tiles(
        n, h_out, wdim, cin, cout, stride, x.dtype.itemsize,
        out_itemsize=(x.dtype.itemsize if pw_epilogue else 4))
    th = block_h or th_auto
    while h_out % th:
        th -= 1
    bn = block_n or bn_auto
    while n % bn:
        bn -= 1
    g = h_out // th

    if stride == 1:
        th_in = th if g == 1 else th + 2
        s_rows = th + 2
        if g == 1:
            x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
        else:
            x_index = lambda b_, i: (
                b_ * bn, jnp.clip(i * th - 1, 0, h - (th + 2)), 0, 0)
    else:
        th_in = 2 * th if g == 1 else 2 * th + 2
        s_rows = 2 * th + 2
        if g == 1:
            x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
        else:
            x_index = lambda b_, i: (
                b_ * bn, jnp.minimum(i * 2 * th, h - (2 * th + 2)), 0, 0)

    # The lane-merge (W, C) -> (W/2, 2C) at the accumulator is a pure lane
    # regroup ONLY when C is a multiple of 128; otherwise Mosaic rejects the
    # shape cast on hw (hit at alpha=0.75: cin=192 dense s2 blocks).
    sub = bool(mxu_subsample) and stride == 2 and cin % 128 == 0
    # pw_epilogue=False emits the RAW pointwise accumulation in float32 (no
    # bias, no activation): the tensor-parallel path psums row-sharded
    # partials across the model axis BEFORE the epilogue can apply
    # (parallel/tp_fused.py) — bias+relu do not commute with the sum.
    out_dtype = x.dtype if pw_epilogue else jnp.float32
    kernel = functools.partial(
        _block_kernel, th=th, w_out=w_out, stride=stride, relu6=relu6,
        out_dtype=out_dtype, g=g, bn=bn, wdim=wdim, mxu_subsample=sub,
        pw_epilogue=pw_epilogue,
    )
    if sub:
        # K-zero-padded pointwise weight: lanes [0,C) = even columns keep W,
        # lanes [C,2C) = odd columns hit zeros.
        pw_arg = jnp.concatenate([pw_w, jnp.zeros_like(pw_w)], axis=0)
    else:
        pw_arg = pw_w

    return pl.pallas_call(
        kernel,
        grid=(n // bn, g),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(th_in), pl.Element(wdim), pl.Element(cin)),
                x_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, cin), lambda b_, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cin), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pw_arg.shape, lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, th, w_out, cout),
            lambda b_, i: (b_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, s_rows, wdim + 2, cin), x.dtype)],
        interpret=interpret,
    )(x, dw_w.reshape(3, 3, cin), dw_b.reshape(1, cin), pw_arg, pw_b.reshape(1, cout))
