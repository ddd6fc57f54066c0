"""Lane-packed fused INT8 blocks: the quantized twins of
ops/pallas_block_packed.py (BASELINE.json:10 — per-layer requantization in
Pallas, here at full lane occupancy for narrow-channel layers).

Same layout algebra as the float kernels — pack R = 128/Cin pixels per lane
vector (free NHWC reshape), column taps as 32-bit lane rolls (the int8 window
is widened to int32 on read, which also satisfies Mosaic's 32-bit-only
rotate), block-diagonal / selection pointwise weights on the MXU's native
s8 x s8 -> s32 path — with the exact requant epilogues of quant/ops.py
(float32 multiplier, in-domain ReLU6, round-half-to-even), so outputs remain
BIT-IDENTICAL to the int8 oracles.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_dw import _should_interpret


def _requant_f32(acc_i32, m_vec, six_q, relu6):
    """Requant value in f32 (already rounded + bounded to int8 range).

    The int8 CAST is deliberately left to the caller so any reshape happens
    on the f32 value first: Mosaic shape-casts of 8-bit vectors (e.g. the
    (M, R*Cout) -> (BN, TH, out_cols, 128) lane regroup at the store) are a
    relayout on (32,128) int8 tiles — reshape in f32, cast last.
    """
    v = acc_i32.astype(jnp.float32) * m_vec.astype(jnp.float32)
    v = jnp.maximum(v, 0.0)
    if relu6:
        v = jnp.minimum(v, six_q)
        if six_q < 127.5:
            # In-domain ReLU6 already bounds round(v) to [0, 127] (six_q is
            # 127.0 for the fixed 6/127 hidden scale): the final clip is
            # provably redundant, bit-identical.
            return jnp.round(v)
    return jnp.clip(jnp.round(v), -128, 127)


def _requant(acc_i32, m_vec, six_q, relu6):
    return _requant_f32(acc_i32, m_vec, six_q, relu6).astype(jnp.int8)


def _shift_cols(v, direction):
    if v.shape[2] == 1:
        return jnp.zeros_like(v)
    if direction > 0:
        return jnp.pad(v[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))
    return jnp.pad(v[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))


def _pw_requant(out32, pwm_ref, pw_six_q, relu6, pw_linear):
    """pw epilogue: V1's in-domain ReLU6 requant, or the V2 linear-
    bottleneck requant (clip(round(acc*m), -128, 127) — the exact op order
    of quant/v2._pw_i8_linear_dev / pw_i8_linear)."""
    if pw_linear:
        v = out32.astype(jnp.float32) * pwm_ref[0].astype(jnp.float32)
        return jnp.clip(jnp.round(v), -128, 127)
    return _requant_f32(out32, pwm_ref[0], pw_six_q, relu6)


def _s1_kernel(x_ref, dww_ref, dwb_ref, dwm_ref, pww_ref, pwb_ref, pwm_ref,
               o_ref, s_ref, *, th, w4, r, cin, relu6, g, bn, out_cols,
               dw_six_q, pw_six_q, pw_linear=False):
    i = pl.program_id(1)
    is_first_step = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    @pl.when(is_first_step)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    if g == 1:
        s_ref[:, 1 : th + 1, :, :] = x_ref[...]
    else:
        @pl.when(i == 0)
        def _():
            s_ref[:, 1 : th + 2, :, :] = x_ref[:, 0 : th + 1]
            s_ref[:, 0:1, :, :] = jnp.zeros_like(s_ref[:, 0:1, :, :])

        if g > 2:
            @pl.when(jnp.logical_and(i > 0, i < g - 1))
            def _():
                s_ref[:, 0 : th + 2, :, :] = x_ref[...]

        @pl.when(i == g - 1)
        def _():
            s_ref[:, 0 : th + 1, :, :] = x_ref[:, 1 : th + 2]
            s_ref[:, th + 1 : th + 2, :, :] = jnp.zeros_like(
                s_ref[:, th + 1 : th + 2, :, :])

    # f32 taps with EXACT int semantics: |x|,|w| <= 127, 9 products + bias
    # < 2^24, so f32 FMAs produce the same integers as i32 arithmetic
    # (measured speed parity with i32 mul+add on the VPU; kept for structural
    # unity with the float kernels). Mosaic can't cast i8->f32 directly;
    # widen through i32 (rolls are 32-bit either way).
    sv = s_ref[...].astype(jnp.int32).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
    group = lane // cin
    rolled_l = pltpu.roll(sv, 128 - cin, axis=3)
    left_tap = jnp.where(group == r - 1, _shift_cols(rolled_l, -1), rolled_l)
    rolled_r = pltpu.roll(sv, cin, axis=3)
    right_tap = jnp.where(group == 0, _shift_cols(rolled_r, +1), rolled_r)
    taps = (right_tap, sv, left_tap)

    acc = jnp.zeros((bn, th, w4, 128), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            acc = acc + taps[dx][:, dy : dy + th] * dww_ref[dy, dx, :].astype(jnp.float32)
    acc = acc + dwb_ref[0].astype(jnp.float32)
    mid = _requant_f32(acc, dwm_ref[0], dw_six_q, relu6).reshape(
        bn * th * w4, 128).astype(jnp.int8)

    out32 = jax.lax.dot_general(
        mid, pww_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out32 = out32 + pwb_ref[0].astype(jnp.int32)
    o_ref[...] = _pw_requant(out32, pwm_ref, pw_six_q, relu6,
                             pw_linear).reshape(
        bn, th, out_cols, 128).astype(jnp.int8)


def _s2_kernel(x_ref, dww_ref, dwb_ref, dwm_ref, pww_ref, pwb_ref, pwm_ref,
               o_ref, s_ref, *, th, w4, r, cin, relu6, g, bn, out_cols,
               dw_six_q, pw_six_q, pw_linear=False):
    i = pl.program_id(1)
    is_first_step = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    @pl.when(is_first_step)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    if g == 1:
        s_ref[:, 0 : 2 * th, 0:w4, :] = x_ref[...]
    else:
        @pl.when(i < g - 1)
        def _():
            s_ref[:, 0 : 2 * th + 2, 0:w4, :] = x_ref[...]

        @pl.when(i == g - 1)
        def _():
            s_ref[:, 0 : 2 * th, 0:w4, :] = x_ref[:, 2 : 2 * th + 2]
            s_ref[:, 2 * th : 2 * th + 2, 0:w4, :] = jnp.zeros_like(
                s_ref[:, 2 * th : 2 * th + 2, 0:w4, :])

    sv = s_ref[...].astype(jnp.int32).astype(jnp.float32)  # f32-exact taps (see _s1_kernel)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
    group = lane // cin
    roll1 = pltpu.roll(sv, 128 - cin, axis=3)
    shift1 = jnp.where(group == r - 1, _shift_cols(roll1, -1), roll1)
    roll2 = pltpu.roll(sv, (128 - 2 * cin) % 128, axis=3)
    shift2 = jnp.where(group >= r - 2, _shift_cols(roll2, -1), roll2)
    taps = (sv, shift1, shift2)

    n_pairs = sv.shape[1] // 2
    acc = jnp.zeros((bn, th, w4 + 1, 128), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            t = taps[dx].reshape(bn, n_pairs, 2, w4 + 1, 128)[
                :, dy // 2 : dy // 2 + th, dy % 2]
            acc = acc + t * dww_ref[dy, dx, :].astype(jnp.float32)
    acc = acc[:, :, 0:w4, :] + dwb_ref[0].astype(jnp.float32)
    mid = _requant_f32(acc, dwm_ref[0], dw_six_q, relu6).reshape(
        bn * th * w4, 128).astype(jnp.int8)

    out32 = jax.lax.dot_general(
        mid, pww_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out32 = out32 + pwb_ref[0].astype(jnp.int32)
    o_ref[...] = _pw_requant(out32, pwm_ref, pw_six_q, relu6,
                             pw_linear).reshape(
        bn, th, out_cols, 128).astype(jnp.int8)


def _common_call(kernel_fn, x_packed, stride, args, *, th, bn, g, th_in, w4,
                 out_cols, h_out, n, x_index, interpret, scratch_rows):
    return pl.pallas_call(
        kernel_fn,
        grid=(n // bn, g),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(th_in), pl.Element(w4), pl.Element(128)),
                x_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, 128), lambda b_, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(args[3].shape, lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, args[4].shape[1]), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, args[5].shape[1]), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, th, out_cols, 128), lambda b_, i: (b_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, out_cols, 128), jnp.int8),
        scratch_shapes=[pltpu.VMEM((bn, scratch_rows, w4 + (0 if stride == 1 else 1),
                                    128), jnp.int8)],
        interpret=interpret,
    )(x_packed, *args)


@functools.partial(
    jax.jit,
    static_argnames=("cin", "cout", "stride", "dw_six_q", "pw_six_q", "relu6",
                     "pw_linear", "block_h", "block_n", "interpret"),
)
def separable_block_packed_i8(
    x_packed: jax.Array,   # (N, H, W*Cin/128, 128) int8, lane = j*Cin + c
    dw_w_i8: jax.Array,    # (3, 3, 1, Cin)
    dw_bias_i32: jax.Array,
    dw_m: jax.Array,
    pw_w_i8: jax.Array,    # (Cin, Cout)
    pw_bias_i32: jax.Array,
    pw_m: jax.Array,
    cin: int,
    cout: int,
    stride: int,
    dw_six_q: float,
    pw_six_q: float,
    relu6: bool = True,
    *,
    pw_linear: bool = False,
    block_h: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Packed int8 fused block (stride 1 or 2). Output is packed int8:
    R*Cout/128 lane groups for stride 1, (R/2)*Cout/128 for stride 2.
    pw_linear=True swaps the pw epilogue for the V2 linear-bottleneck
    requant (no activation — quant/v2._pw_i8_linear_dev's exact ops)."""
    if interpret is None:
        interpret = _should_interpret()
    n, h, w4, lanes = x_packed.shape
    r = 128 // cin
    assert lanes == 128 and 128 % cin == 0
    if stride == 1:
        assert r * cout % 128 == 0
        out_cols = w4 * (r * cout) // 128
        h_out = h
        pw_lanes = r * cout
        sel = jnp.eye(r, dtype=jnp.int8)
    else:
        assert r % 2 == 0 and (r // 2) * cout % 128 == 0 and h % 2 == 0
        out_cols = w4 * ((r // 2) * cout) // 128
        h_out = h // 2
        pw_lanes = (r // 2) * cout
        sel = jnp.zeros((r, r // 2), jnp.int8).at[
            2 * jnp.arange(r // 2), jnp.arange(r // 2)].set(1)

    th = block_h or min(h_out, 16)
    while h_out % th:
        th -= 1
    bn = block_n or 1
    if block_n is None:
        while (
            bn * 2 <= n and n % (bn * 2) == 0 and bn * th * w4 < 256
            and bn * 2 * (stride * th + 2) * (w4 + 1) * 128 * 4 < 2**22
        ):
            bn *= 2
    while n % bn:
        bn -= 1
    g = h_out // th

    if stride == 1:
        th_in = th if g == 1 else th + 2
        scratch_rows = th + 2
        if g == 1:
            x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
        else:
            x_index = lambda b_, i: (
                b_ * bn, jnp.clip(i * th - 1, 0, h - (th + 2)), 0, 0)
        kfn = _s1_kernel
    else:
        th_in = 2 * th if g == 1 else 2 * th + 2
        scratch_rows = 2 * th + 2
        if g == 1:
            x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
        else:
            x_index = lambda b_, i: (
                b_ * bn, jnp.minimum(i * 2 * th, h - (2 * th + 2)), 0, 0)
        kfn = _s2_kernel

    dww = jnp.tile(dw_w_i8.reshape(3, 3, cin), (1, 1, r))
    dwb = jnp.tile(dw_bias_i32.reshape(1, cin), (1, r))
    dwm = jnp.tile(dw_m.reshape(1, cin), (1, r))
    pww = jnp.kron(sel, pw_w_i8)  # (128, pw_lanes)
    rep = pw_lanes // cout
    pwb = jnp.tile(pw_bias_i32.reshape(1, cout), (1, rep))
    pwm = jnp.tile(pw_m.reshape(1, cout), (1, rep))

    kernel = functools.partial(
        kfn, th=th, w4=w4, r=r, cin=cin, relu6=relu6, g=g, bn=bn,
        out_cols=out_cols, dw_six_q=dw_six_q, pw_six_q=pw_six_q,
        pw_linear=pw_linear,
    )
    return _common_call(
        kernel, x_packed, stride, (dww, dwb, dwm, pww, pwb, pwm),
        th=th, bn=bn, g=g, th_in=th_in, w4=w4, out_cols=out_cols,
        h_out=h_out, n=n, x_index=x_index, interpret=interpret,
        scratch_rows=scratch_rows,
    )


# ---------------------------------------------------------------------------
# Named-activation packed block (the V3 block-0 class): bf16-carried ints,
# stride 1, LINEAR projection, quant/v3's calibrated requant (a, inv_s)
# instead of V1's fixed (m, six_q). Residual joins OUTSIDE in the packed
# bf16 domain (measured free there; an unpacked (...,16) add costs 8x lane
# waste — benchmarks/v3_campaign_raw.log block-0 A/B).
# ---------------------------------------------------------------------------


def _named_requant_f32(acc_f32, a_vec, inv_s, act, fold=None):
    """quant/v3._requant_named_* twin on an f32 EXACT-integer accumulator.

    fold=True (quant/v3.FOLDED_REQUANT, the round-5 canonical order) is
    the single-multiplier form: m = f32(a)*f32(inv_s) computed on the
    (1, C) vector once, so relu/linear requants cost ONE full-tensor mul
    instead of two (and hswish folds inv_s/6 the same way) — the fold is
    a SCHEME order, mirrored bit-for-bit by the numpy oracle.

    relu lives in the clip's lower bound either way (round-5): for
    m > 0, clip(rint(max(v,0)*s), -128, 127) == clip(rint(v*s), 0, 127)
    bit-for-bit — a negative v scales negative, rounds to <= 0, and
    clips to the same 0 the max produced — saving one more full-tensor
    VPU op. The EXACT gates prove the identity on every path. Entries
    thread `fold` as a static (the EO_EXPAND pattern) for tools/abx.py;
    fold=None reads the knob at trace time."""
    if fold is None:
        from . import v3 as _v3

        fold = _v3.FOLDED_REQUANT
    if fold:
        if act == "hswish":
            v = acc_f32 * a_vec.astype(jnp.float32)
            t = jnp.clip(v + jnp.float32(3.0), 0.0, 6.0)
            return jnp.clip(
                jnp.round((v * t)
                          * (jnp.float32(inv_s) * jnp.float32(1.0 / 6.0))),
                -128, 127)
        assert act in ("relu", "linear"), act
        m = a_vec.astype(jnp.float32) * jnp.float32(inv_s)
        lo = jnp.float32(0.0) if act == "relu" else -128
        return jnp.clip(jnp.round(acc_f32 * m), lo, 127)
    v = acc_f32 * a_vec.astype(jnp.float32)
    if act == "relu":
        return jnp.clip(jnp.round(v * jnp.float32(inv_s)),
                        jnp.float32(0.0), 127)
    if act == "hswish":
        g = jnp.clip(v + jnp.float32(3.0), 0.0, 6.0) * jnp.float32(1.0 / 6.0)
        v = v * g
    else:
        assert act == "linear", act
    return jnp.clip(jnp.round(v * jnp.float32(inv_s)), -128, 127)


def _named_s1_kernel(x_ref, dww_ref, dwb_ref, da_ref, pww_ref, pwb_ref,
                     pa_ref, o_ref, s_ref, *, th, w4, r, cin, act, g, bn,
                     out_cols, d_inv, p_inv, out_dtype, fold):
    import jax as _jax

    i = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, i == 0))
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    if g == 1:
        s_ref[:, 1 : th + 1, :, :] = x_ref[...]
    else:
        @pl.when(i == 0)
        def _():
            s_ref[:, 1 : th + 2, :, :] = x_ref[:, 0 : th + 1]
            s_ref[:, 0:1, :, :] = jnp.zeros_like(s_ref[:, 0:1, :, :])

        if g > 2:
            @pl.when(jnp.logical_and(i > 0, i < g - 1))
            def _():
                s_ref[:, 0 : th + 2, :, :] = x_ref[...]

        @pl.when(i == g - 1)
        def _():
            s_ref[:, 0 : th + 1, :, :] = x_ref[:, 1 : th + 2]
            s_ref[:, th + 1 : th + 2, :, :] = jnp.zeros_like(
                s_ref[:, th + 1 : th + 2, :, :])

    sv = s_ref[...].astype(jnp.float32)  # exact ints (bf16 carrier)
    lane = _jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
    group = lane // cin
    rolled_l = pltpu.roll(sv, 128 - cin, axis=3)
    left_tap = jnp.where(group == r - 1, _shift_cols(rolled_l, -1), rolled_l)
    rolled_r = pltpu.roll(sv, cin, axis=3)
    right_tap = jnp.where(group == 0, _shift_cols(rolled_r, +1), rolled_r)
    taps = (right_tap, sv, left_tap)

    acc = jnp.zeros((bn, th, w4, 128), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            t = taps[dx][:, dy : dy + th]
            acc = acc + t * dww_ref[dy, dx, :].astype(jnp.float32)

    yd = _named_requant_f32(acc + dwb_ref[0].astype(jnp.float32),
                            da_ref[0], d_inv, act, fold)
    # LINEAR projection as an exact bf16 MXU dot: yd ints <= 127 and the
    # block-diagonal kron keeps |dot| <= Cin*127^2 (2.58e5 at Cin=16) —
    # exact in the f32 accumulator; bias joins in f32 (bound checked at
    # the routing site against concrete quantized constants).
    y2 = yd.astype(jnp.bfloat16).reshape(bn * th * w4, 128)
    out = jnp.dot(y2, pww_ref[...],
                  preferred_element_type=jnp.float32)
    out = out + pwb_ref[0].astype(jnp.float32)
    q = _named_requant_f32(out, pa_ref[0], p_inv, "linear", fold)
    o_ref[...] = q.reshape(bn, th, out_cols, 128).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cin", "cout", "act", "d_inv", "p_inv", "out_dtype",
                     "block_h", "block_n", "interpret", "fold"),
)
def packed_block_i8_named(
    x_packed,              # (N, H, W*Cin/128, 128) bf16-carried ints
    dw_w_i8, dw_bias_i32, dw_a,
    pw_w_i8, pw_bias_i32, pw_a,
    cin: int, cout: int, act: str, d_inv: float, p_inv: float,
    out_dtype: str = "bfloat16", *,
    block_h: Optional[int] = None, block_n: Optional[int] = None,
    interpret: Optional[bool] = None, fold: Optional[bool] = None,
):
    """Stride-1 lane-packed named-act int8 block (V3 block-0 class).

    x_packed carries bf16 integers (quant/v3's carriage — pack() of the
    carried activation); returns the packed LINEAR projection output on
    the int8 grid in `out_dtype` (bf16 to keep the carriage, int8 at a
    carriage boundary). Bit-identical to quant/v3's XLA ops sequence
    (dw requant -> linear prj requant); the residual, when the block has
    one, is the caller's packed-domain add + clip.
    """
    if interpret is None:
        interpret = _should_interpret()
    out_dtype = jnp.dtype(out_dtype)
    n, h, w4, lanes = x_packed.shape
    assert lanes == 128 and 128 % cin == 0 and x_packed.dtype == jnp.bfloat16
    r = 128 // cin
    assert r * cout % 128 == 0, (r, cout)
    out_cols = w4 * (r * cout) // 128

    def est(bn_, th_):
        u_win = bn_ * (th_ + 2) * w4 * 128
        u_mid = bn_ * th_ * w4 * 128
        u_out = bn_ * th_ * out_cols * 128
        return (3 * u_win * 2 + 2 * u_out * 2 + u_mid * 2
                + (3 * u_win + u_mid + u_out) * 4)

    cap = int(16.3 * 2 ** 20)
    th = block_h or h
    while th > 1 and (h % th or est(1, th) > cap):
        th -= 1
    bn = block_n or 1
    if block_n is None:
        while (bn * 2 <= n and n % (bn * 2) == 0 and bn * th * w4 < 256
               and est(bn * 2, th) < cap):
            bn *= 2
    while n % bn:
        bn -= 1
    g = h // th
    th_in = th if g == 1 else th + 2
    if g == 1:
        x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
    else:
        x_index = lambda b_, i: (
            b_ * bn, jnp.clip(i * th - 1, 0, h - (th + 2)), 0, 0)

    dww = jnp.tile(dw_w_i8.reshape(3, 3, cin), (1, 1, r))
    dwb = jnp.tile(dw_bias_i32.reshape(1, cin), (1, r))
    da = jnp.tile(dw_a.reshape(1, cin).astype(jnp.float32), (1, r))
    pww = jnp.kron(jnp.eye(r, dtype=jnp.int8), pw_w_i8).astype(jnp.bfloat16)
    pwb = jnp.tile(pw_bias_i32.reshape(1, cout), (1, r))
    pa = jnp.tile(pw_a.reshape(1, cout).astype(jnp.float32), (1, r))

    kernel = functools.partial(
        _named_s1_kernel, th=th, w4=w4, r=r, cin=cin, act=act, g=g, bn=bn,
        out_cols=out_cols, d_inv=float(d_inv), p_inv=float(p_inv),
        out_dtype=out_dtype, fold=fold)
    return pl.pallas_call(
        kernel,
        grid=(n // bn, g),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(th_in), pl.Element(w4),
                 pl.Element(128)),
                x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 128), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, r * cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r * cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r * cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, th, out_cols, 128),
                               lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, out_cols, 128), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, th + 2, w4, 128), jnp.bfloat16)],
        interpret=interpret,
    )(x_packed, dww, dwb, da, pww, pwb, pa)


# ---------------------------------------------------------------------------
# Named-act packed EXPAND + stride-2 block: the int8 twins of the float
# packed-expand route (models/mobilenet_v3.py block-1 class; design.md
# §3.3d). Block 1 of int8 V3-Large measured 8.95 of 26.1 ms/batch-256
# (tools/prefix_attr.py --model v3 --int8, 2026-08-19) — the same (…, 16)
# lane-occupancy disease the float route cured. The expansion runs as one
# full-width kron matmul on the bf16-carried integers (exact f32 integer
# accumulation — |dot| <= Cin*127², bias bound checked at the routing
# site), requants with the exact quant/v3 op order, and lands directly in
# the packed layout of E; the stride-2 dw + LINEAR projection then runs on
# the named-act twin of ops/pallas_block_packed._packed_s2_kernel.
# ---------------------------------------------------------------------------


def packed_expand_i8_named(x_carry, exp_w_i8, exp_b_i32, exp_a, inv_s,
                           act: str):
    """Expansion 1x1 of a narrow bf16-CARRIED int8 layer in the lane-packed
    layout: (N*H*(W*Cin/128), 128) @ kron(I_R, We) with R = 128/Cin, then
    the quant/v3 named requant. The bf16 MXU dot accumulates EXACT f32
    integers (products <= 127², <= Cin terms per output; the zero
    off-diagonal kron blocks add exact zeros), so acc equals the oracle's
    i32 accumulator bit-for-bit and the requant twin keeps the int8 EXACT
    contract. Returns (N, H, W, E) bf16 carrying the requantized integers
    (the kron's pixel-major lane order makes the reshape free)."""
    from ..ops.pallas_block_packed import pack  # noqa: PLC0415

    n, h, w, cin = x_carry.shape
    assert x_carry.dtype == jnp.bfloat16
    e = int(exp_w_i8.shape[1])
    r = 128 // cin
    assert 128 % cin == 0 and (w * cin) % 128 == 0, (cin, w)
    xp = pack(x_carry, cin)
    w4 = xp.shape[2]
    kw = jnp.kron(jnp.eye(r, dtype=jnp.int8), exp_w_i8).astype(jnp.bfloat16)
    acc = jnp.dot(xp.reshape(n * h * w4, 128), kw,
                  preferred_element_type=jnp.float32)
    acc = acc + jnp.tile(exp_b_i32.reshape(1, e), (1, r)).astype(jnp.float32)
    a_t = jnp.tile(exp_a.reshape(1, e).astype(jnp.float32), (1, r))
    q = _named_requant_f32(acc, a_t[0], float(inv_s), act)
    return q.reshape(n, h, w, e).astype(jnp.bfloat16)


def _named_s2_kernel(x_ref, dww_ref, dwb_ref, da_ref, pww_ref, pwb_ref,
                     pa_ref, o_ref, s_ref, *, th, w4, r, cin, act, g, bn,
                     out_cols, d_inv, p_inv, out_dtype, fold):
    import jax as _jax

    i = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, i == 0))
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    # rows cover image rows [2*ts, 2*ts+2th+1]; col W4 stays a zero border
    if g == 1:
        s_ref[:, 0 : 2 * th, 0:w4, :] = x_ref[...]
    else:
        @pl.when(i < g - 1)
        def _():
            s_ref[:, 0 : 2 * th + 2, 0:w4, :] = x_ref[...]

        @pl.when(i == g - 1)
        def _():
            s_ref[:, 0 : 2 * th, 0:w4, :] = x_ref[:, 2 : 2 * th + 2]
            s_ref[:, 2 * th : 2 * th + 2, 0:w4, :] = jnp.zeros_like(
                s_ref[:, 2 * th : 2 * th + 2, 0:w4, :])

    sv = s_ref[...].astype(jnp.float32)  # exact ints (bf16 carrier)
    lane = _jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
    group = lane // cin
    roll1 = pltpu.roll(sv, 128 - cin, axis=3)              # pixel p+1
    shift1 = jnp.where(group == r - 1, _shift_cols(roll1, -1), roll1)
    roll2 = pltpu.roll(sv, (128 - 2 * cin) % 128, axis=3)  # pixel p+2
    shift2 = jnp.where(group >= r - 2, _shift_cols(roll2, -1), roll2)
    taps = (sv, shift1, shift2)

    n_pairs = sv.shape[1] // 2
    acc = jnp.zeros((bn, th, w4 + 1, 128), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            t = taps[dx].reshape(bn, n_pairs, 2, w4 + 1, 128)[
                :, dy // 2 : dy // 2 + th, dy % 2]
            acc = acc + t * dww_ref[dy, dx, :].astype(jnp.float32)

    yd = _named_requant_f32(
        acc[:, :, 0:w4, :] + dwb_ref[0].astype(jnp.float32),
        da_ref[0], d_inv, act, fold)
    # LINEAR projection as an exact bf16 MXU dot (the named s1 kernel's
    # argument: |dot| <= E*127² plus the bias bound checked at the routing
    # site keep the f32 accumulator an exact integer).
    y2 = yd.astype(jnp.bfloat16).reshape(bn * th * w4, 128)
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32)
    out = out + pwb_ref[0].astype(jnp.float32)
    q = _named_requant_f32(out, pa_ref[0], p_inv, "linear", fold)
    o_ref[...] = q.reshape(bn, th, out_cols, 128).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cin", "cout", "act", "d_inv", "p_inv", "out_dtype",
                     "block_h", "block_n", "interpret", "fold"),
)
def packed_block_i8_named_s2(
    x_packed,              # (N, H, W*Cin/128, 128) bf16-carried ints
    dw_w_i8, dw_bias_i32, dw_a,
    pw_w_i8, pw_bias_i32, pw_a,
    cin: int, cout: int, act: str, d_inv: float, p_inv: float,
    out_dtype: str = "bfloat16", *,
    block_h: Optional[int] = None, block_n: Optional[int] = None,
    interpret: Optional[bool] = None, fold: Optional[bool] = None,
):
    """Stride-2 lane-packed named-act int8 block (V3 block-1 stage 2).

    The named twin of ops/pallas_block_packed.separable_block_packed_s2
    with pw_epilogue=False: dw 3x3 s2 via the A[p]-everywhere + even-lane
    selection algebra (same taps, same row windows), quant/v3's requant
    after the dw and after the LINEAR projection. Bit-identical to the
    XLA ops sequence. Returns the (R/2)-packed layout of cout (dense NHWC
    when (R/2)*cout == 128 — the caller pads the projection to 128 zero
    cols, which requant maps to exact zeros)."""
    if interpret is None:
        interpret = _should_interpret()
    out_dtype = jnp.dtype(out_dtype)
    n, h, w4, lanes = x_packed.shape
    assert lanes == 128 and x_packed.dtype == jnp.bfloat16
    r = 128 // cin
    assert 128 % cin == 0 and r % 2 == 0, (cin, r)
    assert (r // 2) * cout % 128 == 0, (r, cout)
    assert h % 2 == 0
    h_out = h // 2
    out_cols = w4 * ((r // 2) * cout) // 128

    th = block_h or min(h_out, 16)
    while h_out % th:
        th -= 1
    bn = block_n or 1
    if block_n is None:
        while (
            bn * 2 <= n and n % (bn * 2) == 0 and bn * th * w4 < 256
            and bn * 2 * (2 * th + 2) * (w4 + 1) * 128 * 4 < 2**22
        ):
            bn *= 2
    while n % bn:
        bn -= 1
    g = h_out // th

    th_in = 2 * th if g == 1 else 2 * th + 2
    if g == 1:
        x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
    else:
        x_index = lambda b_, i: (
            b_ * bn, jnp.minimum(i * 2 * th, h - (2 * th + 2)), 0, 0)

    dww = jnp.tile(dw_w_i8.reshape(3, 3, cin), (1, 1, r))
    dwb = jnp.tile(dw_bias_i32.reshape(1, cin), (1, r))
    da = jnp.tile(dw_a.reshape(1, cin).astype(jnp.float32), (1, r))
    # selection: out lane block j' takes A's lane block j = 2*j'
    sel = jnp.zeros((r, r // 2), jnp.int8).at[
        2 * jnp.arange(r // 2), jnp.arange(r // 2)].set(1)
    pww = jnp.kron(sel, pw_w_i8).astype(jnp.bfloat16)
    pwb = jnp.tile(pw_bias_i32.reshape(1, cout), (1, r // 2))
    pa = jnp.tile(pw_a.reshape(1, cout).astype(jnp.float32), (1, r // 2))

    kernel = functools.partial(
        _named_s2_kernel, th=th, w4=w4, r=r, cin=cin, act=act, g=g, bn=bn,
        out_cols=out_cols, d_inv=float(d_inv), p_inv=float(p_inv),
        out_dtype=out_dtype, fold=fold)
    return pl.pallas_call(
        kernel,
        grid=(n // bn, g),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(th_in), pl.Element(w4),
                 pl.Element(128)),
                x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, 128), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, (r // 2) * cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, (r // 2) * cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, (r // 2) * cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, th, out_cols, 128),
                               lambda b_, i: (b_, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, out_cols, 128), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, 2 * th + 2, w4 + 1, 128),
                                   jnp.bfloat16)],
        interpret=interpret,
    )(x_packed, dww, dwb, da, pww, pwb, pa)


def _named_s2_se_kernel(x_ref, dww_ref, dwb_ref, da_ref, ssel_ref,
                        s1w_ref, s1b_ref, s1a_ref, s2w_ref, s2b_ref,
                        s2a_ref, pww_ref, pwb_ref, pa_ref, o_ref, s_ref,
                        *, w4, r, cin, act, bn, h_out, out_cols, d_inv,
                        s1_inv, p_inv, hw_inv, out_dtype, fold):
    """Whole-image stride-2 lane-packed named block WITH the quantized SE
    gate in-kernel (V3-Small block 0: t=1, k3 s2, SE, relu — its XLA int8
    fallback measured 8.08 -> 4.28 ms/batch-256 across the 2026-08-20
    session and this kernel is the roofline answer: one bf16 read of the
    packed 112² image, everything else in VMEM).

    dw taps: the _named_s2_kernel algebra (A[p]-everywhere lane rolls +
    even-block selection in the projection). SE: per-channel sums over the
    SELECTED pixels only via an f32 dot with the 0/1 selection-sum matrix
    (partial sums <= 127*H*W < 2^24 — exact in any order), then byte-for-
    byte the ir_v3_i8 SE sequence: rint mean -> s8 pooled -> s8 SE dots ->
    relu requant -> hard-sigmoid gate in f32 -> rint(z*gate) on every lane
    (odd blocks are redundant and discarded by the projection selection).
    """
    import jax as _jax

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    th = h_out  # whole image: SE needs the full extent before the gate
    s_ref[:, 0 : 2 * th, 0:w4, :] = x_ref[...]

    sv = s_ref[...].astype(jnp.float32)  # exact ints (bf16 carrier)
    lane = _jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
    group = lane // cin
    roll1 = pltpu.roll(sv, 128 - cin, axis=3)              # pixel p+1
    shift1 = jnp.where(group == r - 1, _shift_cols(roll1, -1), roll1)
    roll2 = pltpu.roll(sv, (128 - 2 * cin) % 128, axis=3)  # pixel p+2
    shift2 = jnp.where(group >= r - 2, _shift_cols(roll2, -1), roll2)
    taps = (sv, shift1, shift2)

    n_pairs = sv.shape[1] // 2
    acc = jnp.zeros((bn, th, w4 + 1, 128), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            t = taps[dx].reshape(bn, n_pairs, 2, w4 + 1, 128)[
                :, dy // 2 : dy // 2 + th, dy % 2]
            acc = acc + t * dww_ref[dy, dx, :].astype(jnp.float32)

    yd = _named_requant_f32(
        acc[:, :, 0:w4, :] + dwb_ref[0].astype(jnp.float32),
        da_ref[0], d_inv, act, fold)  # f32 ints, A-space (bn, th, w4, 128)

    # --- quantized SE gate: selected-pixel channel sums -> ir_v3_i8 SE ---
    # The lane->channel fold crosses lanes, so it must be an MXU dot with
    # the 0/1 selection-sum matrix — but at Precision.HIGHEST: a default
    # f32 dot lowers to a SINGLE-PASS bf16 matmul in Mosaic, and lane sums
    # up to 127*H*W ~ 1e5 need 17 mantissa bits — the hw smoke caught +-1
    # pooled shifts (2026-08-20; interpret mode was exact). HIGHEST runs
    # the bf16x3 decomposition: hi/lo parts sum back exactly, products
    # with 0/1 are exact, f32 partials stay < 2^24 — exact in any order.
    # (Lane-dim reshapes and ::2 strides both fail Mosaic lowering; the
    # dot is the only supported cross-lane fold here.)
    lane_sums = jnp.sum(yd, axis=(1, 2))  # (bn, 128) exact ints
    ch_sums = jax.lax.dot_general(
        lane_sums, ssel_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)
    pooled = jnp.clip(jnp.round(ch_sums * jnp.float32(hw_inv)),
                      -128, 127).astype(jnp.int8)
    g1 = _named_requant_f32(
        (_jax.lax.dot_general(
            pooled, s1w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32) + s1b_ref[0]).astype(
                jnp.float32),
        s1a_ref[0], s1_inv, "relu", fold).astype(jnp.int8)
    acc2 = _jax.lax.dot_general(
        g1, s2w_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32) + s2b_ref[0]
    v = acc2.astype(jnp.float32) * s2a_ref[0].astype(jnp.float32)
    gate = jnp.clip(v + jnp.float32(3.0), 0.0, 6.0) * jnp.float32(1.0 / 6.0)
    gate_l = jnp.tile(gate, (1, r))  # lane j*cin+c <- gate[c]
    yd = jnp.clip(jnp.round(yd * gate_l[:, None, None, :]), -128, 127)

    # --- LINEAR projection (selection kron) — _named_s2_kernel epilogue ---
    y2 = yd.astype(jnp.bfloat16).reshape(bn * th * w4, 128)
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32)
    out = out + pwb_ref[0].astype(jnp.float32)
    q = _named_requant_f32(out, pa_ref[0], p_inv, "linear", fold)
    o_ref[...] = q.reshape(bn, th, out_cols, 128).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cin", "cout", "act", "d_inv", "s1_inv", "p_inv",
                     "out_dtype", "block_n", "interpret", "fold"),
)
def packed_block_i8_named_s2_se(
    x_packed,              # (N, H, W*Cin/128, 128) bf16-carried ints
    dw_w_i8, dw_bias_i32, dw_a,
    se1_w_i8, se1_b_i32, se1_a, se2_w_i8, se2_b_i32, se2_a,
    pw_w_i8, pw_bias_i32, pw_a,
    cin: int, cout: int, act: str, d_inv: float, s1_inv: float,
    p_inv: float, out_dtype: str = "bfloat16", *,
    block_n: Optional[int] = None, interpret: Optional[bool] = None,
    fold: Optional[bool] = None,
):
    """Stride-2 lane-packed named-act int8 block with in-kernel SE (no
    expand — the t=1 V3-Small block-0 shape). Whole-image tiles only (the
    SE pool needs the full extent); bit-identical to the XLA ops sequence
    (dw requant -> _se_i8 -> linear prj requant). Returns the
    (R/2)-packed layout of the ZERO-PADDED cout (caller pads projection
    cols so (R/2)*cout_p % 128 == 0; requant maps them to exact zeros)."""
    if interpret is None:
        interpret = _should_interpret()
    out_dtype = jnp.dtype(out_dtype)
    n, h, w4, lanes = x_packed.shape
    assert lanes == 128 and x_packed.dtype == jnp.bfloat16
    r = 128 // cin
    assert 128 % cin == 0 and r % 2 == 0, (cin, r)
    assert (r // 2) * cout % 128 == 0, (r, cout)
    assert h % 2 == 0
    h_out = h // 2
    out_cols = w4 * ((r // 2) * cout) // 128
    se_mid = int(se1_w_i8.shape[1])

    bn = block_n or 1
    while n % bn:
        bn -= 1

    dww = jnp.tile(dw_w_i8.reshape(3, 3, cin), (1, 1, r))
    dwb = jnp.tile(dw_bias_i32.reshape(1, cin), (1, r))
    da = jnp.tile(dw_a.reshape(1, cin).astype(jnp.float32), (1, r))
    # selection-sum matrix: lane j*cin+c sums into channel c for EVEN j
    # (the valid stride-2 output pixels; odd blocks are tap redundancy)
    sel_sum = np.zeros((128, cin), np.float32)
    for j in range(0, r, 2):
        sel_sum[j * cin + np.arange(cin), np.arange(cin)] = 1.0
    sel = jnp.zeros((r, r // 2), jnp.int8).at[
        2 * jnp.arange(r // 2), jnp.arange(r // 2)].set(1)
    pww = jnp.kron(sel, pw_w_i8).astype(jnp.bfloat16)
    pwb = jnp.tile(pw_bias_i32.reshape(1, cout), (1, r // 2))
    pa = jnp.tile(pw_a.reshape(1, cout).astype(jnp.float32), (1, r // 2))

    kernel = functools.partial(
        _named_s2_se_kernel, w4=w4, r=r, cin=cin, act=act, bn=bn,
        h_out=h_out, out_cols=out_cols, d_inv=float(d_inv),
        s1_inv=float(s1_inv), p_inv=float(p_inv),
        hw_inv=1.0 / float(h_out * (w4 * r // 2)), out_dtype=out_dtype,
        fold=fold)
    wspec = lambda shape: pl.BlockSpec(shape, lambda b_: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[
            pl.BlockSpec((bn, h, w4, 128), lambda b_: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec((3, 3, 128)), wspec((1, 128)), wspec((1, 128)),
            wspec((128, cin)),
            wspec((cin, se_mid)), wspec((1, se_mid)), wspec((1, se_mid)),
            wspec((se_mid, cin)), wspec((1, cin)), wspec((1, cin)),
            wspec((128, (r // 2) * cout)), wspec((1, (r // 2) * cout)),
            wspec((1, (r // 2) * cout)),
        ],
        out_specs=pl.BlockSpec((bn, h_out, out_cols, 128),
                               lambda b_: (b_, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, out_cols, 128), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, h + 2, w4 + 1, 128), jnp.bfloat16)],
        interpret=interpret,
    )(x_packed, dww, dwb, da, jnp.asarray(sel_sum),
      jnp.asarray(se1_w_i8), jnp.asarray(se1_b_i32).reshape(1, se_mid),
      jnp.asarray(se1_a).reshape(1, se_mid).astype(jnp.float32),
      jnp.asarray(se2_w_i8), jnp.asarray(se2_b_i32).reshape(1, cin),
      jnp.asarray(se2_a).reshape(1, cin).astype(jnp.float32),
      pww, pwb, pa)
