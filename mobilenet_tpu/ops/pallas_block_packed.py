"""Lane-packed fused dw+pw kernel for narrow-channel layers (Cin < 128).

Problem (measured on v5e): VPU values are (8,128)-tiled, so a C=32 layer runs
its 9-tap depthwise at 25% lane occupancy — the same wall time as a C=128
layer. The early MobileNet blocks (C=32 at alpha=1.0; C=8..64 for the small-
alpha sweep, BASELINE.json:8) dominate the whole network's VPU time.

Fix: pack R = 128/C consecutive pixels into one 128-lane vector — a FREE
layout change, because NHWC reshape (W, C) -> (W/R, R*C) preserves memory
order. The stencil's column shifts become lane rotations:

    x_packed (N, H, W/R, 128), lane = j*C + c  (pixel 4*w4+j, channel c)
    left/right pixel taps = pltpu.roll(+-C lanes) with the cross-group lane
    fixed up from the neighboring column (select on a static lane mask).
    Rolls are HOISTED: computed once per window, reused by all 3 row taps,
    so per-element cost is ~15 VPU ops at 100% occupancy vs 9 ops at 1/R.

The fused pointwise rides the MXU as (M, 128) @ (128, R*Cout) with a
block-diagonal weight (kron(I_R, pw_w)) — K stays a full 128 lanes — and the
output reshapes straight into the packed layout of the NEXT layer
((R*Cout)/128 lane groups), so narrow layers chain packed end-to-end.

This module provides both strides: `separable_block_packed` (stride 1,
block-diagonal kron(I_R, W) pointwise) and `separable_block_packed_s2`
(stride 2 via the full-pixel accumulator A[p] = sum_dx in[p+dx]k_dx whose
even-pixel lanes are selected by kron(S, W) — see the section comment below).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dw import _should_interpret


def _act(y, relu6):
    y = jnp.maximum(y, 0.0)
    if relu6:
        y = jnp.minimum(y, 6.0)
    return y


def _shift_cols(v, direction):
    """Shift the W4 (column-group) axis of (BN, H?, W4, 128) by one, zero fill."""
    if v.shape[2] == 1:  # single group: the neighboring group is all padding
        return jnp.zeros_like(v)
    if direction > 0:  # use value from column w4-1
        return jnp.pad(v[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))
    return jnp.pad(v[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))


def _packed_kernel(
    x_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, o_ref, s_ref,
    *, th, w4, r, cin, relu6, out_dtype, g, bn, out_cols, pw_epilogue=True,
):
    i = pl.program_id(1)
    is_first_step = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    @pl.when(is_first_step)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    # --- row normalization into zero-top/bottom scratch (cols need none) ---
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

    # float32 up front: Mosaic's lane rotate only supports 32-bit data, and
    # the accumulator is f32 anyway; packed windows are small (W/R columns).
    sv = s_ref[...].astype(jnp.float32)  # (BN, th+2, W4, 128)

    # --- hoisted packed column shifts (one roll pair per window) -----------
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
    group = lane // cin
    rolled_l = pltpu.roll(sv, 128 - cin, axis=3)  # pixel j+1 at slot j (j < R-1)
    left_tap = jnp.where(group == r - 1, _shift_cols(rolled_l, -1), rolled_l)
    rolled_r = pltpu.roll(sv, cin, axis=3)   # pixel j-1 at slot j (j > 0)
    right_tap = jnp.where(group == 0, _shift_cols(rolled_r, +1), rolled_r)

    taps = (right_tap, sv, left_tap)  # dx = 0, 1, 2 -> pixel w-1, w, w+1

    acc = jnp.zeros((bn, th, w4, 128), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            t = taps[dx][:, dy : dy + th]
            acc = acc + t * dww_ref[dy, dx, :].astype(jnp.float32)

    y = _act(acc + dwb_ref[0].astype(jnp.float32), relu6)
    y2 = y.astype(pww_ref.dtype).reshape(bn * th * w4, 128)
    prec = (
        jax.lax.Precision.HIGHEST
        if pww_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32, precision=prec)
    out = out + pwb_ref[0].astype(jnp.float32)
    if pw_epilogue:
        out = _act(out, relu6)
    # pw_epilogue=False emits bias-added but UNACTIVATED output — the V2
    # linear-bottleneck projection (models/mobilenet_v2.py block 0 routes
    # here; the V1 dense kernel's partial mode is the TP analog).
    # (BN*th*W4, R*Cout) -> (BN, th, out_cols, 128): contiguous lane regroup.
    o_ref[...] = out.reshape(bn, th, out_cols, 128).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cin", "cout", "relu6", "block_h", "block_n",
                     "pw_epilogue", "interpret"),
)
def separable_block_packed(
    x_packed: jax.Array,  # (N, H, W/R, 128), lane = j*Cin + c
    dw_w: jax.Array,      # (3, 3, 1, Cin)
    dw_b: jax.Array,      # (Cin,)
    pw_w: jax.Array,      # (Cin, Cout)
    pw_b: jax.Array,      # (Cout,)
    cin: int,
    cout: int,
    relu6: bool = True,
    *,
    block_h: Optional[int] = None,
    block_n: Optional[int] = None,
    pw_epilogue: bool = True,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Stride-1 fused dw+pw on lane-packed input. Returns packed
    (N, H, W*Cout/128, 128) — the packed layout for Cout (dense NHWC when
    Cout >= 128 after one free reshape in the caller).

    pw_epilogue=False emits bias-added UNACTIVATED pointwise output (the
    V2 linear bottleneck; the dw epilogue keeps its activation)."""
    if interpret is None:
        interpret = _should_interpret()
    n, h, w4, lanes = x_packed.shape
    assert lanes == 128 and 128 % cin == 0, (lanes, cin)
    r = 128 // cin
    assert r * cout % 128 == 0, (r, cout)
    out_cols = w4 * (r * cout) // 128

    itm = jnp.dtype(x_packed.dtype).itemsize

    def est(bn_, th_):
        # Scoped-VMEM byte model, calibrated on v5e: 2 pipelined in blocks +
        # scratch (dtype) + 2 out blocks (dtype) + f32 temporaries (window,
        # hoisted roll pair, dw acc, pw acc) + y2 cast copy (dtype).
        # Measured: f32 whole-image block-0 needs 22.58M (model: 22.65M);
        # the bf16 twin compiles within the 16M scope (model: 16.18M).
        u_win = bn_ * (th_ + 2) * w4 * 128
        u_mid = bn_ * th_ * w4 * 128
        u_out = bn_ * th_ * out_cols * 128
        return (
            3 * u_win * itm + 2 * u_out * itm + u_mid * itm
            + (3 * u_win + u_mid + u_out) * 4
        )

    cap = int(16.3 * 2**20)
    if block_h is None:
        # Measured: larger row tiles win (whole-image g=1 removes halo
        # branches entirely — 3.83 vs 4.51 ms on block 0 at batch 256).
        th = h
        while th > 1 and (h % th or est(1, th) > cap):
            th -= 1
    else:
        th = block_h
        while h % th:
            th -= 1
    bn = block_n or 1
    if block_n is None:
        while (
            bn * 2 <= n and n % (bn * 2) == 0 and bn * th * w4 < 256
            and est(bn * 2, th) < cap
        ):
            bn *= 2
    while n % bn:
        bn -= 1
    g = h // th

    th_in = th if g == 1 else th + 2
    if g == 1:
        x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
    else:
        x_index = lambda b_, i: (b_ * bn, jnp.clip(i * th - 1, 0, h - (th + 2)), 0, 0)

    # packed weights: per-channel vectors tiled across the R pixel groups;
    # block-diagonal pointwise so K stays 128 lanes.
    dww = jnp.tile(dw_w.reshape(3, 3, cin), (1, 1, r))
    dwb = jnp.tile(dw_b.reshape(1, cin), (1, r))
    pww = jnp.kron(jnp.eye(r, dtype=pw_w.dtype), pw_w)  # (128, R*Cout)
    pwb = jnp.tile(pw_b.reshape(1, cout), (1, r))

    kernel = functools.partial(
        _packed_kernel, th=th, w4=w4, r=r, cin=cin, relu6=relu6,
        out_dtype=x_packed.dtype, g=g, bn=bn, out_cols=out_cols,
        pw_epilogue=pw_epilogue,
    )

    return pl.pallas_call(
        kernel,
        grid=(n // bn, g),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(th_in), pl.Element(w4), pl.Element(128)),
                x_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, 128), lambda b_, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, r * cout), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, r * cout), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, th, out_cols, 128),
            lambda b_, i: (b_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, out_cols, 128), x_packed.dtype),
        scratch_shapes=[pltpu.VMEM((bn, th + 2, w4, 128), x_packed.dtype)],
        interpret=interpret,
    )(x_packed, dww, dwb, pww, pwb)


def pack(x: jax.Array, cin: int) -> jax.Array:
    """(N, H, W, C) -> (N, H, W*C/128, 128). Free: preserves memory order."""
    n, h, w, c = x.shape
    assert c == cin and 128 % c == 0 and (w * c) % 128 == 0
    return x.reshape(n, h, w * c // 128, 128)


def unpack(x_packed: jax.Array, c: int) -> jax.Array:
    """(N, H, W4, 128) -> (N, H, W4*128/C, C). Free reshape."""
    n, h, w4, lanes = x_packed.shape
    return x_packed.reshape(n, h, w4 * lanes // c, c)


def packed_expand(x: jax.Array, exp_w: jax.Array, exp_b: jax.Array,
                  act: str) -> jax.Array:
    """Expansion 1x1 conv of a NARROW-channel layer (Cin < 128) computed in
    the lane-packed layout: (N*H*W*Cin/128, 128) @ kron(I_R, We) with
    R = 128/Cin. The standard pointwise matmul at Cin = 16 runs the MXU at
    K = 16 and reads (…, 16) vectors at 1/8 lane occupancy — measured as
    the dominant cost of the 112² expand blocks (V3-Large block 1 at 9.2
    ms/batch-256, benchmarks/v3_campaign_raw.log 2026-08-19 attribution).
    The kron keeps K at the full 128 lanes (the zero off-diagonal blocks
    add exact f32 zeros, so numerics match ops.conv.pointwise_conv's dot +
    bias + act op order). Output reshapes FREELY to dense NHWC: the kron
    output lane order is (pixel j, channel e) pixel-major, so
    (N, H, W*Cin/128, R*E) row-major IS (N, H, W, E) row-major.

    Requires 128 % Cin == 0 and (W * Cin) % 128 == 0. Returns (N, H, W, E)
    in x.dtype — the expanded tensor DOES land in HBM here (unlike the
    fused in-kernel expands); callers pair it with a fused dw+prj stage-2
    kernel so only one E-wide tensor round-trips.
    """
    from .conv import _precision, bias_act  # noqa: PLC0415

    n, h, w, cin = x.shape
    e = int(exp_w.shape[1])
    r = 128 // cin
    assert 128 % cin == 0 and (w * cin) % 128 == 0, (cin, w)
    xp = pack(x, cin)
    w4 = xp.shape[2]
    kw = jnp.kron(jnp.eye(r, dtype=exp_w.dtype), exp_w).astype(x.dtype)
    y = jnp.dot(xp.reshape(n * h * w4, 128), kw,
                precision=_precision(x),
                preferred_element_type=jnp.float32)
    y = bias_act(y, jnp.tile(exp_b.reshape(1, e), (1, r)).reshape(-1),
                 None, act)
    return y.reshape(n, h, w, e).astype(x.dtype)


# ---------------------------------------------------------------------------
# Packed stride-2 block (any even R = 128/Cin): with lane = j*C + c (pixel
# R*g+j), define A[p] = sum_dx in[p+dx] * k_dx for EVERY pixel p; the
# stride-2 dw output is out[w'] = A[2w'] — the even-j lanes of A's packed
# form. Taps for A_packed are pixel shifts +0/+1/+2: one identity, and two
# lane rolls (-C, -2C) with cross-group fixups — every vector op runs at
# 100% lane occupancy and HALF the dense kernel's effective width. The
# odd-pixel halves are discarded for free by a selection weight matrix
# kron(S, pw_w) with S[j, j'] = (j == 2j'), keeping MXU K at the full 128
# lanes; the output lands in the R/2-packed layout of Cout (dense when
# (R/2)*Cout == 128, which holds for every MobileNet stride-2 block).
# Rows use the same even/odd outer-dim split + clamped bottom window as the
# dense stride-2 kernel.
# ---------------------------------------------------------------------------


def _packed_s2_kernel(
    x_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, o_ref, s_ref,
    *, th, w4, r, cin, relu6, out_dtype, g, bn, out_cols, pw_epilogue=True,
):
    i = pl.program_id(1)
    is_first_step = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    @pl.when(is_first_step)
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

    sv = s_ref[...].astype(jnp.float32)  # (BN, rows, W4+1, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
    group = lane // cin
    roll1 = pltpu.roll(sv, 128 - cin, axis=3)          # pixel p+1 at slot p
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

    y = _act(acc[:, :, 0:w4, :] + dwb_ref[0].astype(jnp.float32), relu6)
    y2 = y.astype(pww_ref.dtype).reshape(bn * th * w4, 128)
    prec = (
        jax.lax.Precision.HIGHEST
        if pww_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32, precision=prec)
    out = out + pwb_ref[0].astype(jnp.float32)
    if pw_epilogue:
        out = _act(out, relu6)
    # pw_epilogue=False emits bias-added UNACTIVATED output — the linear
    # projection of an inverted-residual block (the s1 kernel's mode).
    o_ref[...] = out.reshape(bn, th, out_cols, 128).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cin", "cout", "relu6", "block_h", "block_n",
                     "pw_epilogue", "interpret"),
)
def separable_block_packed_s2(
    x_packed: jax.Array,  # (N, H, W*Cin/128, 128), lane = j*Cin + c
    dw_w: jax.Array,      # (3, 3, 1, Cin)
    dw_b: jax.Array,
    pw_w: jax.Array,      # (Cin, Cout)
    pw_b: jax.Array,
    cin: int,
    cout: int,
    relu6: bool = True,
    *,
    pw_epilogue: bool = True,
    block_h: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Stride-2 fused dw+pw on R-lane-packed input (R = 128/Cin even).
    Returns (N, H/2, W*Cout/(2*128) cols, 128) — the R/2-packed layout of
    Cout (dense NHWC when (R/2)*Cout == 128). Requires even H and
    (R/2)*Cout % 128 == 0."""
    if interpret is None:
        interpret = _should_interpret()
    n, h, w4, lanes = x_packed.shape
    r = 128 // cin
    assert lanes == 128 and 128 % cin == 0 and r % 2 == 0, (cin, r)
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

    dww = jnp.tile(dw_w.reshape(3, 3, cin), (1, 1, r))
    dwb = jnp.tile(dw_b.reshape(1, cin), (1, r))
    # selection: out lane block j' takes A's lane block j = 2*j'
    sel = jnp.zeros((r, r // 2), pw_w.dtype).at[
        2 * jnp.arange(r // 2), jnp.arange(r // 2)].set(1)
    # kron over (R, R/2) selection x (Cin, Cout) weight:
    # W[(j*Cin+c), (j'*Cout+o)] = sel[j, j'] * pw_w[c, o]
    pww = jnp.kron(sel, pw_w)
    pwb = jnp.tile(pw_b.reshape(1, cout), (1, r // 2))

    kernel = functools.partial(
        _packed_s2_kernel, th=th, w4=w4, r=r, cin=cin, relu6=relu6,
        out_dtype=x_packed.dtype, g=g, bn=bn, out_cols=out_cols,
        pw_epilogue=pw_epilogue,
    )

    return pl.pallas_call(
        kernel,
        grid=(n // bn, g),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(th_in), pl.Element(w4), pl.Element(128)),
                x_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, 128), lambda b_, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, (r // 2) * cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, (r // 2) * cout), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, th, out_cols, 128),
            lambda b_, i: (b_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, out_cols, 128), x_packed.dtype),
        scratch_shapes=[pltpu.VMEM((bn, 2 * th + 2, w4 + 1, 128), x_packed.dtype)],
        interpret=interpret,
    )(x_packed, dww, dwb, pww, pwb)
