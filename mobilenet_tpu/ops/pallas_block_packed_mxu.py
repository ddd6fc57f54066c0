"""MXU-matmul depthwise for lane-packed fused blocks.

In the packed layout (lane = j*C + c, R = 128/Cin pixels per vector), every
depthwise column tap is a LINEAR MAP ON LANES — so the whole 3x3 stencil can
run on the MXU as matmuls against banded tap matrices instead of 9 VPU tap
passes + lane rolls + cross-group fixups:

    out[y, q, j*C+c] = sum_dy sum_s  in[y+dy-1, q+s] @ A[dy, s]

where s indexes the column-group neighborhood (q-1, q, q+1) and
A[dy, s][u*C+c, j*C+c] = k[dy, j+dx-1-u? , c] places each tap's per-channel
weight on the (input-lane, output-lane) pair it connects (see
_tap_matrix_indices). The matrices are sparse-banded, but the MXU is dense
anyway — and 9 (M,128)@(128,128) matmuls at MXU rate beat the VPU stencil's
rolls/selects/widens, especially for INT8 where the operands feed the MXU's
native s8 x s8 -> s32 path with NO i8 -> i32 -> f32 widen anywhere.

Stride 2 needs only s in {q, q+1}: with TF-SAME's pad-left-0 geometry the
selected input pixel u = 2*j_out+dx ranges over [0, R] and never reaches the
left neighbor, so the stride-2 depthwise is 6 matmuls with the even-pixel
selection folded into the tap matrices (no full-width accumulate + discard
like the VPU s2 kernel).

Scratch carries ZERO column-group borders (left+right for s1, right for s2)
so neighbor taps are plain sublane-offset slices — no rolls, no masks, and
no out-of-bounds windows.

Reference parity: these are alternate device kernels for the same fused
dw+pw block of SURVEY.md SS2 C4/C5/C7; int8 requant semantics are identical
to quant/ops.py (exact vs the oracles), float follows ops/pallas_block_packed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dw import _should_interpret

# Routing defaults (resolved at trace time by the model; A/B-measurable by
# monkeypatching, tools/ab_mxu_dw.py). Flipped per measured winner on v5e.
DW_MXU_S1_F = False   # float/bf16 stride-1 packed blocks
DW_MXU_S2_F = False   # float/bf16 stride-2 packed blocks
DW_MXU_S1_I8 = False  # int8 stride-1 packed blocks
DW_MXU_S2_I8 = False  # int8 stride-2 packed blocks


def _act(y, relu6):
    y = jnp.maximum(y, 0.0)
    if relu6:
        y = jnp.minimum(y, 6.0)
    return y


def _tap_matrix_indices(cin: int, r: int, stride: int):
    """Static (dy-independent) scatter indices for the banded tap matrices.

    Returns (s_idx, row_idx, col_idx, dx_idx, c_idx) numpy arrays with one
    entry per (output lane, dx) tap:
      A[dy, s_idx][row_idx, col_idx] = k[dy, dx_idx, c_idx]
    s covers column-group offsets. TF-SAME geometry: stride 1 pads 1 left
    (u = j+dx-1 in [-1, R] -> s: 0 = q-1, 1 = q, 2 = q+1); stride 2 on even
    W pads 0 left / 1 right (u = 2j+dx in [0, R] -> s: 0 = q, 1 = q+1),
    matching the VPU s2 kernel's +0/+1/+2 pixel shifts.
    """
    C, R = cin, r
    s_l, row_l, col_l, dx_l, c_l = [], [], [], [], []
    j_range = range(R) if stride == 1 else range(R // 2)
    for j in j_range:
        for dx in range(3):
            u = (j + dx - 1) if stride == 1 else (2 * j + dx)
            for c in range(C):
                col = j * C + c
                if stride == 1:
                    if u == -1:
                        s, row = 0, (R - 1) * C + c  # left neighbor's last pixel
                    elif u == R:
                        s, row = 2, c                # right neighbor's first pixel
                    else:
                        s, row = 1, u * C + c
                else:
                    if u == R:
                        s, row = 1, c                # right neighbor's first pixel
                    else:
                        s, row = 0, u * C + c
                s_l.append(s)
                row_l.append(row)
                col_l.append(col)
                dx_l.append(dx)
                c_l.append(c)
    return (np.asarray(s_l), np.asarray(row_l), np.asarray(col_l),
            np.asarray(dx_l), np.asarray(c_l))


def build_tap_matrices(dw_w, cin: int, r: int, stride: int, dtype):
    """(3,3,1,Cin) depthwise weights -> (3, S, 128, 128) banded tap matrices
    (S = 3 for stride 1, 2 for stride 2). Exact placement of each per-channel
    tap weight; zero elsewhere."""
    k = dw_w.reshape(3, 3, cin)
    s_i, row_i, col_i, dx_i, c_i = _tap_matrix_indices(cin, r, stride)
    vals = k[:, dx_i, c_i].astype(dtype)  # (3, nnz)
    S = 3 if stride == 1 else 2
    return jnp.zeros((3, S, 128, 128), dtype).at[:, s_i, row_i, col_i].set(vals)


# ---------------------------------------------------------------------------
# shared kernel pieces (float and int8 bodies differ only in epilogues)
# ---------------------------------------------------------------------------


def _fill_scratch(s_ref, x_ref, i, *, g, th, w4, stride):
    """Copy the input window into the zero-bordered scratch.

    Data columns: [1, w4] for stride 1 (zero col-group borders both sides),
    [0, w4) for stride 2 (right border only — TF-SAME pads 0 left / 1 right).
    Row halos follow the same clamped-window pattern as the VPU kernels; the
    col borders are zeroed once at the first grid step and never rewritten.
    """
    is_first_step = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    @pl.when(is_first_step)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    if stride == 1:
        cl, ch = 1, w4 + 1
        if g == 1:
            s_ref[:, 1 : th + 1, cl:ch, :] = x_ref[...]
        else:
            @pl.when(i == 0)
            def _():
                s_ref[:, 1 : th + 2, cl:ch, :] = x_ref[:, 0 : th + 1]
                s_ref[:, 0:1, cl:ch, :] = jnp.zeros_like(s_ref[:, 0:1, cl:ch, :])

            if g > 2:
                @pl.when(jnp.logical_and(i > 0, i < g - 1))
                def _():
                    s_ref[:, 0 : th + 2, cl:ch, :] = x_ref[...]

            @pl.when(i == g - 1)
            def _():
                s_ref[:, 0 : th + 1, cl:ch, :] = x_ref[:, 1 : th + 2]
                s_ref[:, th + 1 : th + 2, cl:ch, :] = jnp.zeros_like(
                    s_ref[:, th + 1 : th + 2, cl:ch, :])
    else:
        cl, ch = 0, w4
        if g == 1:
            s_ref[:, 0 : 2 * th, cl:ch, :] = x_ref[...]
        else:
            @pl.when(i < g - 1)
            def _():
                s_ref[:, 0 : 2 * th + 2, cl:ch, :] = x_ref[...]

            @pl.when(i == g - 1)
            def _():
                s_ref[:, 0 : 2 * th, cl:ch, :] = x_ref[:, 2 : 2 * th + 2]
                s_ref[:, 2 * th : 2 * th + 2, cl:ch, :] = jnp.zeros_like(
                    s_ref[:, 2 * th : 2 * th + 2, cl:ch, :])


def _dw_mxu(s_ref, a_ref, *, th, w4, stride, bn, acc_dtype, prec=None):
    """The 9 (s1) / 6 (s2) tap matmuls, accumulated in acc_dtype.

    prec=HIGHEST for f32 operands: the MXU's default bf16 passes cost ~e-2
    absolute error (hw-measured), failing the fp32 gate.
    """
    m = bn * th * w4
    acc = jnp.zeros((m, 128), acc_dtype)
    n_s = 3 if stride == 1 else 2
    for dy in range(3):
        for s in range(n_s):
            if stride == 1:
                sl = s_ref[:, dy : dy + th, s : s + w4, :]
            else:
                rows = s_ref[...].reshape(bn, th + 1, 2, w4 + 1, 128)
                sl = rows[:, dy // 2 : dy // 2 + th, dy % 2, s : s + w4, :]
            acc = acc + jax.lax.dot_general(
                sl.reshape(m, 128), a_ref[dy, s],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype, precision=prec,
            )
    return acc


def _plan(n, h, h_out, w4, stride, est, block_h, block_n):
    """(th, bn, g, th_in, scratch_rows, x_index) under the scoped-VMEM model
    `est(bn, th)` — identical policy for both dtypes (whole-image row tiles
    for stride 1, 16-row output tiles for stride 2)."""
    cap = int(16.3 * 2**20)
    if block_h is None:
        if stride == 1:
            th = h_out
            while th > 1 and (h_out % th or est(1, th) > cap):
                th -= 1
        else:
            th = min(h_out, 16)
            while h_out % th:
                th -= 1
    else:
        th = block_h
        while h_out % th:
            th -= 1
    bn = block_n or 1
    if block_n is None:
        while (bn * 2 <= n and n % (bn * 2) == 0 and bn * th * w4 < 256
               and est(bn * 2, th) < cap):
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
    else:
        th_in = 2 * th if g == 1 else 2 * th + 2
        scratch_rows = 2 * th + 2
        if g == 1:
            x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
        else:
            x_index = lambda b_, i: (
                b_ * bn, jnp.minimum(i * 2 * th, h - (2 * th + 2)), 0, 0)
    return th, bn, g, th_in, scratch_rows, x_index


# ---------------------------------------------------------------------------
# float / bf16 kernels
# ---------------------------------------------------------------------------


def _mxu_kernel_f(x_ref, a_ref, dwb_ref, pww_ref, pwb_ref, o_ref, s_ref,
                  *, th, w4, stride, relu6, out_dtype, g, bn, out_cols):
    _fill_scratch(s_ref, x_ref, pl.program_id(1), g=g, th=th, w4=w4,
                  stride=stride)
    prec = (jax.lax.Precision.HIGHEST if pww_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc = _dw_mxu(s_ref, a_ref, th=th, w4=w4, stride=stride, bn=bn,
                  acc_dtype=jnp.float32, prec=prec)

    y = _act(acc + dwb_ref[0].astype(jnp.float32), relu6)
    y2 = y.astype(pww_ref.dtype)
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32,
                  precision=prec)
    out = _act(out + pwb_ref[0].astype(jnp.float32), relu6)
    o_ref[...] = out.reshape(bn, th, out_cols, 128).astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("cin", "cout", "stride", "relu6", "block_h", "block_n",
                     "interpret"),
)
def separable_block_packed_mxu(
    x_packed: jax.Array,  # (N, H, W*Cin/128, 128), lane = j*Cin + c
    dw_w: jax.Array,      # (3, 3, 1, Cin)
    dw_b: jax.Array,
    pw_w: jax.Array,      # (Cin, Cout)
    pw_b: jax.Array,
    cin: int,
    cout: int,
    stride: int = 1,
    relu6: bool = True,
    *,
    block_h: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Float packed fused block with the depthwise on the MXU (both strides).
    Same packed output layout as ops/pallas_block_packed."""
    if interpret is None:
        interpret = _should_interpret()
    n, h, w4, lanes = x_packed.shape
    r = 128 // cin
    assert lanes == 128 and 128 % cin == 0
    if stride == 1:
        assert r * cout % 128 == 0
        h_out, pw_lanes = h, r * cout
    else:
        assert r % 2 == 0 and (r // 2) * cout % 128 == 0 and h % 2 == 0
        h_out, pw_lanes = h // 2, (r // 2) * cout
    out_cols = w4 * pw_lanes // 128
    itm = jnp.dtype(x_packed.dtype).itemsize
    scr_cols = w4 + 2 if stride == 1 else w4 + 1

    def est(bn_, th_):
        rows = (th_ + 2) if stride == 1 else (2 * th_ + 2)
        u_win = bn_ * rows * scr_cols * 128
        u_mid = bn_ * th_ * w4 * 128
        u_out = bn_ * th_ * out_cols * 128
        # 2 pipelined ins + scratch + 2 outs + f32 acc/mid + operand staging
        return (3 * u_win * itm + 2 * u_out * itm + u_mid * itm
                + (u_win + 2 * u_mid + u_out) * 4)

    th, bn, g, th_in, scratch_rows, x_index = _plan(
        n, h, h_out, w4, stride, est, block_h, block_n)

    a = build_tap_matrices(dw_w, cin, r, stride, x_packed.dtype)
    if stride == 1:
        dwb = jnp.tile(dw_b.reshape(1, cin), (1, r))
        sel = jnp.eye(r, dtype=pw_w.dtype)
        rep = r
    else:
        # dw output occupies lanes [0, (R/2)*Cin); the rest are zero.
        dwb = jnp.pad(jnp.tile(dw_b.reshape(1, cin), (1, r // 2)),
                      ((0, 0), (0, 128 - (r // 2) * cin)))
        sel = jnp.concatenate(
            [jnp.eye(r // 2, dtype=pw_w.dtype),
             jnp.zeros((r - r // 2, r // 2), pw_w.dtype)], axis=0)
        rep = r // 2
    pww = jnp.kron(sel, pw_w)  # (128, pw_lanes)
    pwb = jnp.tile(pw_b.reshape(1, cout), (1, rep))

    kernel = functools.partial(
        _mxu_kernel_f, th=th, w4=w4, stride=stride, relu6=relu6,
        out_dtype=x_packed.dtype, g=g, bn=bn, out_cols=out_cols,
    )
    n_s = 3 if stride == 1 else 2
    return pl.pallas_call(
        kernel,
        grid=(n // bn, g),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(th_in), pl.Element(w4), pl.Element(128)),
                x_index, memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, n_s, 128, 128), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, pw_lanes), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pw_lanes), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, th, out_cols, 128), lambda b_, i: (b_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, out_cols, 128), x_packed.dtype),
        scratch_shapes=[pltpu.VMEM((bn, scratch_rows, scr_cols, 128),
                                   x_packed.dtype)],
        interpret=interpret,
    )(x_packed, a, dwb, pww, pwb)


# ---------------------------------------------------------------------------
# int8 kernels — pure-MXU integer path (no widen anywhere)
# ---------------------------------------------------------------------------


def _mxu_kernel_i8(x_ref, a_ref, dwb_ref, dwm_ref, pww_ref, pwb_ref, pwm_ref,
                   o_ref, s_ref, *, th, w4, stride, relu6, g, bn, out_cols,
                   dw_six_q, pw_six_q):
    from ..quant.pallas_block_packed_i8 import _requant_f32  # noqa: PLC0415

    _fill_scratch(s_ref, x_ref, pl.program_id(1), g=g, th=th, w4=w4,
                  stride=stride)
    acc = _dw_mxu(s_ref, a_ref, th=th, w4=w4, stride=stride, bn=bn,
                  acc_dtype=jnp.int32)

    acc = acc + dwb_ref[0].astype(jnp.int32)
    mid = _requant_f32(acc, dwm_ref[0], dw_six_q, relu6).astype(jnp.int8)

    out32 = jax.lax.dot_general(
        mid, pww_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out32 = out32 + pwb_ref[0].astype(jnp.int32)
    # f32 reshape before the i8 cast: the lane regroup at the store is a
    # relayout on (32,128) int8 tiles (see quant/pallas_block_packed_i8).
    o_ref[...] = _requant_f32(out32, pwm_ref[0], pw_six_q, relu6).reshape(
        bn, th, out_cols, 128).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("cin", "cout", "stride", "dw_six_q", "pw_six_q", "relu6",
                     "block_h", "block_n", "interpret"),
)
def separable_block_packed_i8_mxu(
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
    block_h: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Packed int8 fused block with BOTH convolutions on the MXU's native
    s8 x s8 -> s32 path — zero VPU widens. Bit-identical requant semantics
    (exact vs oracles). Same packed int8 output layout as
    quant/pallas_block_packed_i8."""
    if interpret is None:
        interpret = _should_interpret()
    n, h, w4, lanes = x_packed.shape
    r = 128 // cin
    assert lanes == 128 and 128 % cin == 0
    if stride == 1:
        assert r * cout % 128 == 0
        h_out, pw_lanes = h, r * cout
        sel = jnp.eye(r, dtype=jnp.int8)
        rep = r
        dwb = jnp.tile(dw_bias_i32.reshape(1, cin), (1, r))
        dwm = jnp.tile(dw_m.reshape(1, cin), (1, r))
    else:
        assert r % 2 == 0 and (r // 2) * cout % 128 == 0 and h % 2 == 0
        h_out, pw_lanes = h // 2, (r // 2) * cout
        sel = jnp.concatenate(
            [jnp.eye(r // 2, dtype=jnp.int8),
             jnp.zeros((r - r // 2, r // 2), jnp.int8)], axis=0)
        rep = r // 2
        pad = 128 - (r // 2) * cin
        dwb = jnp.pad(jnp.tile(dw_bias_i32.reshape(1, cin), (1, r // 2)),
                      ((0, 0), (0, pad)))
        dwm = jnp.pad(jnp.tile(dw_m.reshape(1, cin), (1, r // 2)),
                      ((0, 0), (0, pad)))
    out_cols = w4 * pw_lanes // 128
    scr_cols = w4 + 2 if stride == 1 else w4 + 1

    def est(bn_, th_):
        rows = (th_ + 2) if stride == 1 else (2 * th_ + 2)
        u_win = bn_ * rows * scr_cols * 128
        u_mid = bn_ * th_ * w4 * 128
        u_out = bn_ * th_ * out_cols * 128
        return (3 * u_win + 2 * u_out + u_mid) + (2 * u_mid + u_out) * 4

    th, bn, g, th_in, scratch_rows, x_index = _plan(
        n, h, h_out, w4, stride, est, block_h, block_n)

    a = build_tap_matrices(dw_w_i8, cin, r, stride, jnp.int8)
    pww = jnp.kron(sel, pw_w_i8)  # (128, pw_lanes)
    pwb = jnp.tile(pw_bias_i32.reshape(1, cout), (1, rep))
    pwm = jnp.tile(pw_m.reshape(1, cout), (1, rep))

    kernel = functools.partial(
        _mxu_kernel_i8, th=th, w4=w4, stride=stride, relu6=relu6, g=g, bn=bn,
        out_cols=out_cols, dw_six_q=dw_six_q, pw_six_q=pw_six_q,
    )
    n_s = 3 if stride == 1 else 2
    return pl.pallas_call(
        kernel,
        grid=(n // bn, g),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(th_in), pl.Element(w4), pl.Element(128)),
                x_index, memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, n_s, 128, 128), lambda b_, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128), lambda b_, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, pw_lanes), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pw_lanes), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pw_lanes), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, th, out_cols, 128), lambda b_, i: (b_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, out_cols, 128), jnp.int8),
        scratch_shapes=[pltpu.VMEM((bn, scratch_rows, scr_cols, 128), jnp.int8)],
        interpret=interpret,
    )(x_packed, a, dwb, dwm, pww, pwb, pwm)
