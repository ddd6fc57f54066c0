"""Fused INT8 depthwise+pointwise block: per-layer requantization in VMEM.

The int8 twin of ops/pallas_block.py and the closest TPU analog of the
reference's fixed-point FPGA pipeline (SURVEY.md SS2 C7, BASELINE.json:10):

    window (int8) --VPU int32 9-tap dw--> acc
      --requant (f32 mult, round-half-even, clamp) --> int8 tile in VMEM
      --MXU s8 x s8 -> s32 pointwise (2x bf16 MXU rate) --> acc
      --requant--> int8 out tile

Quantized activations cross HBM exactly once per block, at 1 byte/element —
half the bf16 path's traffic — and the intermediate dw result never leaves
VMEM. Requant semantics are bit-identical to quant/ops.py and the C++ oracle
(same m/six_q constants, jnp.round == nearbyintf).

Same halo/scratch/batch-tiling structure as the float kernel; windows are
read as int8 and widened to int32 immediately (Mosaic cannot shape-cast 8-bit
vectors).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_dw import _should_interpret
from .pallas_block_packed_i8 import _requant_f32  # single requant definition


# Stride-2 even-column selection strategy (A/B-measurable; see
# ops/pallas_block.py S2_MXU_SUBSAMPLE): True = free lane-merge + K-zero-
# padded s8 pointwise weight instead of the f32 accumulator reshape-gather.
# Default TRUE for int8 — measured 12.18 vs 12.40 ms/batch-256 e2e at 1.0-224
# (interleaved medians, tools/ab_s2.py): the i8 gather costs more than the
# full-width requant. The bf16 twin measured the OPPOSITE (gather wins there).
S2_MXU_SUBSAMPLE = True


def _requant(acc_i32, m_vec, six_q, relu6, dtype=jnp.int8):
    return _requant_f32(acc_i32, m_vec, six_q, relu6).astype(dtype)


def _round_up(x, m):
    return -(-x // m) * m


def pick_tiles_i8(n: int, h_out: int, wdim: int, cin: int, cout: int,
                  stride: int, in_itemsize: int = 1) -> Tuple[int, int]:
    """(BN, TH) for the int8 block: int32 widening makes windows 4B/elem.

    `in_itemsize`: byte size of the INPUT/scratch dtype — 1 for int8, 2 when
    the block consumes bf16-carried integers (forward_i8's bf16_carry option).
    The scratch window follows the input dtype, so carried blocks add
    (itemsize-1)x the raw window bytes on top of the int8-calibrated model
    (previously the estimate assumed 1 B/elem and understated carried-block
    VMEM by up to 2x)."""
    c_pad = _round_up(cin, 128)
    co_pad = _round_up(cout, 128)
    factor = 3.5 if stride == 2 else 1.5  # widened window costs more than bf16

    def est(bn, th):
        th_in = stride * th + 2
        win = bn * th_in * (wdim + 2) * c_pad * 4  # int32-widened
        acc = bn * th * wdim * c_pad * 4
        out = bn * th * (wdim // stride) * co_pad * 5
        extra = bn * th_in * (wdim + 2) * c_pad * (in_itemsize - 1)
        return factor * (3 * win + acc + out) + c_pad * co_pad + extra

    th = min(h_out, 16)
    while h_out % th:
        th -= 1
    bn = 1
    while (
        bn * 2 <= n and n % (bn * 2) == 0
        and bn * th * (wdim // stride) < 256
        and est(bn * 2, th) < 6.5 * 1024 * 1024
    ):
        bn *= 2
    while est(bn, th) > 11 * 1024 * 1024 and th > 1:
        th -= 1
        while h_out % th:
            th -= 1
    return bn, th


def _kernel(
    x_ref, dww_ref, dwb_ref, dwm_ref, pww_ref, pwb_ref, pwm_ref, o_ref, s_ref,
    *, th, w_out, stride, relu6, g, bn, wdim, dw_six_q, pw_six_q,
    mxu_subsample=False,
):
    i = pl.program_id(1)
    is_first_step = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    @pl.when(is_first_step)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    # --- window normalization (same pattern as the float kernel) ----------
    if stride == 1:
        if g == 1:
            s_ref[:, 1 : th + 1, 1 : wdim + 1, :] = x_ref[...]
        else:
            @pl.when(i == 0)
            def _():
                s_ref[:, 1 : th + 2, 1 : wdim + 1, :] = x_ref[:, 0 : th + 1]
                s_ref[:, 0:1, 1 : wdim + 1, :] = jnp.zeros_like(
                    s_ref[:, 0:1, 1 : wdim + 1, :])

            if g > 2:
                @pl.when(jnp.logical_and(i > 0, i < g - 1))
                def _():
                    s_ref[:, 0 : th + 2, 1 : wdim + 1, :] = x_ref[...]

            @pl.when(i == g - 1)
            def _():
                s_ref[:, 0 : th + 1, 1 : wdim + 1, :] = x_ref[:, 1 : th + 2]
                s_ref[:, th + 1 : th + 2, 1 : wdim + 1, :] = jnp.zeros_like(
                    s_ref[:, th + 1 : th + 2, 1 : wdim + 1, :])
    else:
        if g == 1:
            s_ref[:, 0 : 2 * th, 0:wdim, :] = x_ref[...]
        else:
            @pl.when(i < g - 1)
            def _():
                s_ref[:, 0 : 2 * th + 2, 0:wdim, :] = x_ref[...]

            @pl.when(i == g - 1)
            def _():
                s_ref[:, 0 : 2 * th, 0:wdim, :] = x_ref[:, 2 : 2 * th + 2]
                s_ref[:, 2 * th : 2 * th + 2, 0:wdim, :] = jnp.zeros_like(
                    s_ref[:, 2 * th : 2 * th + 2, 0:wdim, :])

    # --- 9-tap depthwise as f32 FMAs with EXACT int semantics ---------------
    # |x|,|w| <= 127, so each product <= 16129 and the 9-tap sum + bias stays
    # far below 2^24: f32 FMAs yield the same integers as i32 arithmetic in
    # any order (measured speed parity with i32 on the VPU; kept for
    # structural unity with the float kernels).
    # (Mosaic can't cast i8->f32 directly; widen through i32. bf16-carried
    # inputs — same integers stored as bf16 — skip the i8 widen entirely.)
    sv = s_ref[...]
    if sv.dtype == jnp.int8:
        sv = sv.astype(jnp.int32)
    sv = sv.astype(jnp.float32)
    c_in = sv.shape[-1]
    if stride == 1:
        acc = jnp.zeros((bn, th, w_out, c_in), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = sv[:, dy : dy + th, dx : dx + w_out, :]
                acc = acc + tap * dww_ref[dy, dx, :].astype(jnp.float32)
    else:
        w_full = 2 * w_out
        pairs = sv.reshape(bn, th + 1, 2, wdim + 2, c_in)
        acc_f = jnp.zeros((bn, th, w_full, c_in), jnp.float32)
        for dy in range(3):
            r = pairs[:, dy // 2 : dy // 2 + th, dy % 2]
            for dx in range(3):
                acc_f = acc_f + r[:, :, dx : dx + w_full, :] * dww_ref[dy, dx, :].astype(jnp.float32)
        if mxu_subsample:
            # requant at full width (odd columns are finite garbage the zero
            # K-rows annihilate); lane-merge (W,C)->(W/2,2C) is free; f32
            # reshape before the i8 cast (i8 shape-casts relayout).
            acc_f = acc_f + dwb_ref[0].astype(jnp.float32)
            mid = _requant_f32(acc_f, dwm_ref[0], dw_six_q, relu6).reshape(
                bn * th * w_out, 2 * c_in).astype(jnp.int8)
            out32 = jax.lax.dot_general(
                mid, pww_ref[...],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out32 = out32 + pwb_ref[0].astype(jnp.int32)
            o_ref[...] = _requant(out32, pwm_ref[0], pw_six_q, relu6,
                                  o_ref.dtype).reshape(bn, th, w_out, -1)
            return
        acc = acc_f.reshape(bn, th, w_out, 2, c_in)[:, :, :, 0, :]

    acc = acc + dwb_ref[0].astype(jnp.float32)
    # Cast-before-reshape here is deliberate (opposite of the packed kernels):
    # these reshapes only merge/split MAJOR dims (lane dim stays cout), which
    # is free for i8 — and reshaping the f32 value instead was measured 1.4 ms
    # SLOWER across B2-12 (broke the requant->store fusion).
    mid_i8 = _requant(acc, dwm_ref[0], dw_six_q, relu6)

    # --- int8 MXU pointwise + requant --------------------------------------
    lhs = mid_i8.reshape(bn * th * w_out, c_in)
    out32 = jax.lax.dot_general(
        lhs, pww_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out32 = out32 + pwb_ref[0].astype(jnp.int32)
    o_ref[...] = _requant(out32, pwm_ref[0], pw_six_q, relu6,
                          o_ref.dtype).reshape(bn, th, w_out, -1)


def separable_block_i8(
    x_i8, dw_w_i8, dw_bias_i32, dw_m, pw_w_i8, pw_bias_i32, pw_m,
    stride, dw_six_q, pw_six_q, relu6=True, *,
    block_h=None, block_n=None, interpret=None, mxu_subsample=None,
    out_dtype=jnp.int8,
):
    """Fused int8 block. mxu_subsample=None resolves the module default
    S2_MXU_SUBSAMPLE at call time (outside the jitted impl so it keys the
    jit cache).

    bf16 carriage: x may be int8 OR bfloat16 holding the same integers, and
    out_dtype=bfloat16 stores the requantized integers as bf16 (exact for
    |v| <= 127). Carried blocks skip the i8 -> i32 -> f32 window widen (a
    relayout on (32,128) int8 tiles) and the i8 output store, at 2x the HBM
    bytes on that boundary — a win for the small-spatial back half of the
    network. Bit-identical integers either way.
    """
    if mxu_subsample is None:
        mxu_subsample = S2_MXU_SUBSAMPLE
    return _separable_block_i8_impl(
        x_i8, dw_w_i8, dw_bias_i32, dw_m, pw_w_i8, pw_bias_i32, pw_m,
        stride, dw_six_q, pw_six_q, relu6,
        block_h=block_h, block_n=block_n, interpret=interpret,
        mxu_subsample=bool(mxu_subsample), out_dtype=out_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=("stride", "dw_six_q", "pw_six_q", "relu6", "block_h",
                     "block_n", "interpret", "mxu_subsample", "out_dtype"),
)
def _separable_block_i8_impl(
    x_i8: jax.Array,        # (N, H, W, Cin) int8 or bf16-carried integers
    dw_w_i8: jax.Array,     # (3, 3, 1, Cin)
    dw_bias_i32: jax.Array,
    dw_m: jax.Array,
    pw_w_i8: jax.Array,     # (Cin, Cout)
    pw_bias_i32: jax.Array,
    pw_m: jax.Array,
    stride: int,
    dw_six_q: float,
    pw_six_q: float,
    relu6: bool = True,
    *,
    block_h: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
    mxu_subsample: bool = False,
    out_dtype=jnp.int8,
) -> jax.Array:
    if interpret is None:
        interpret = _should_interpret()
    n, h, wdim, cin = x_i8.shape
    cout = pw_w_i8.shape[1]
    assert dw_w_i8.shape == (3, 3, 1, cin)
    if stride == 2:
        assert h % 2 == 0 and wdim % 2 == 0
    h_out = -(-h // stride)
    w_out = -(-wdim // stride)

    bn_auto, th_auto = pick_tiles_i8(
        n, h_out, wdim, cin, cout, stride,
        in_itemsize=jnp.dtype(x_i8.dtype).itemsize)
    th = block_h or th_auto
    while h_out % th:
        th -= 1
    bn = block_n or bn_auto
    while n % bn:
        bn -= 1
    g = h_out // th

    if stride == 1:
        th_in = th if g == 1 else th + 2
        scratch = pltpu.VMEM((bn, th + 2, wdim + 2, cin), x_i8.dtype)
        if g == 1:
            x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
        else:
            x_index = lambda b_, i: (
                b_ * bn, jnp.clip(i * th - 1, 0, h - (th + 2)), 0, 0)
    else:
        th_in = 2 * th if g == 1 else 2 * th + 2
        scratch = pltpu.VMEM((bn, 2 * th + 2, wdim + 2, cin), x_i8.dtype)
        if g == 1:
            x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
        else:
            x_index = lambda b_, i: (
                b_ * bn, jnp.minimum(i * 2 * th, h - (2 * th + 2)), 0, 0)

    # The f32 lane-merge (W, C) -> (W/2, 2C) is a pure lane regroup ONLY when
    # C is a multiple of 128; Mosaic rejects the shape cast on hw otherwise
    # (hit at alpha=0.75: cin=192 dense s2 blocks — interpret mode accepts
    # the cast, so only the hw tier catches it).
    sub = bool(mxu_subsample) and stride == 2 and cin % 128 == 0
    kernel = functools.partial(
        _kernel, th=th, w_out=w_out, stride=stride, relu6=relu6, g=g, bn=bn,
        wdim=wdim, dw_six_q=dw_six_q, pw_six_q=pw_six_q, mxu_subsample=sub,
    )
    if sub:
        pw_arg = jnp.concatenate([pw_w_i8, jnp.zeros_like(pw_w_i8)], axis=0)
    else:
        pw_arg = pw_w_i8

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
            pl.BlockSpec((1, cin), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(pw_arg.shape, lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, th, w_out, cout),
            lambda b_, i: (b_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w_out, cout), out_dtype),
        scratch_shapes=[scratch],
        interpret=interpret,
    )(
        x_i8, dw_w_i8.reshape(3, 3, cin), dw_bias_i32.reshape(1, cin),
        dw_m.reshape(1, cin), pw_arg, pw_bias_i32.reshape(1, cout),
        pw_m.reshape(1, cout),
    )
