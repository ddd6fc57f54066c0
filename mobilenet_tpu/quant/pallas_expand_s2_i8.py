"""INT8 named-act twin of the fused expand + dw3x3-s2 + projection kernel.

The bf16 kernel (ops/pallas_expand_s2.py — full layout algebra there)
measured 3.23 vs 6.29 ms/batch-256 against the two-stage packed route at
the V3-Large block-1 geometry (tools/probe_b1_s2.py, 2026-08-19) by keeping
the expanded tensor in VMEM and expanding only the even pixels the stride-2
dw output reads. This twin runs the same schedule on bf16-CARRIED int8
integers with quant/v3's calibrated named requant at each stage, keeping
the EXACT bit-equality contract:

  * expand: kron(S_even, exp_w_i8) as a bf16 MXU dot — integer inputs
    <= 127 are exact in bf16, each output sums <= Cin products <= 127², so
    the f32 accumulator is an exact integer while Cin*127² + |b| < 2^24
    (checked at the routing site, quant/v3._dot_bias_ok). The named
    requant twin (quant/pallas_block_packed_i8._named_requant_f32) then
    reproduces the oracle's IEEE op order bit-for-bit.
  * border masks zero the POST-REQUANT activation (SAME padding pads the
    quantized activation with exact zeros — same positions as the float
    kernel's masks).
  * dw: 9 f32 FMAs on the int grid (<= 9*127² + |b_i32| < 2^24 by the
    same routing-site bound) + named requant.
  * projection: kron(I_{R/2}, pw_w_i8) bf16 dot (<= E*127² bound) + the
    LINEAR named requant; output int8 or a bf16 integer carrier.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_dw import _should_interpret
from ..ops.pallas_expand_s2 import expand_s2_eligible  # noqa: F401 (re-export)
from .pallas_block_packed_i8 import _named_requant_f32, _shift_cols


def _kernel(
    x_ref, kw_ref, eb_ref, ea_ref, dww_ref, dwb_ref, da_ref, pww_ref,
    pwb_ref, pa_ref, o_ref, s_ref,
    *, th, w4, r, cin, ee, act, out_dtype, g, bn, e_inv, d_inv, p_inv, eo,
    fastmask=False, fold=None,
):
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, i == 0))
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    # Rows cover image rows [2*ts, 2*ts + 2*th + 1]; col W4 stays a zero
    # border (same scratch contract as the bf16 kernel).
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
    rows = sv.shape[1]
    w4p = w4 + 1

    row_i = jax.lax.broadcasted_iota(jnp.int32, (1, rows, 1, 1), 1)
    rows_valid = jnp.logical_or(i < g - 1, row_i < 2 * th)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w4p, 1), 2)
    lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, ee), 3)
    epix = ee // (r // 2)  # lanes per expanded pixel slot (= E)
    tap2_valid = None
    if not (eo and fastmask):
        tap2_valid = jnp.logical_not(
            jnp.logical_and(col_i == w4 - 1, lane_e >= ee - epix))

    kw = kw_ref[...]                       # (128, EE|2*EE) bf16 int weights
    eb = eb_ref[0].astype(jnp.float32)     # i32 bias, exact in f32
    ea = ea_ref[0]

    n_pairs = rows // 2
    acc = jnp.zeros((bn, th, w4p, ee), jnp.float32)

    def dw_acc(acc, z_t, dx):
        zp = z_t.reshape(bn, n_pairs, 2, w4p, ee)
        for dy in range(3):
            t = zp[:, dy // 2 : dy // 2 + th, dy % 2]
            acc = acc + t * dww_ref[dy, dx, :].astype(jnp.float32)
        return acc

    if eo:
        # One [kron(S_even,w)|kron(S_odd,w)] matmul and ONE named-requant
        # pass over 2*EE replace 3 matmuls + 3 requant passes (the
        # measured reason the per-tap twin lost e2e — design.md §3.3e);
        # the delta-2 tap is an E-lane roll of the requantized even half
        # (a pixel permutation of exact integers — bit-identical).
        z = jnp.dot(sv.astype(jnp.bfloat16).reshape(bn * rows * w4p, 128),
                    kw, preferred_element_type=jnp.float32)
        if fastmask:
            # Masked-bias border handling (round-5, same algebra as the
            # bf16 kernel's FASTMASK): invalid rows / the zero border
            # column have all-zero scratch input, and every named requant
            # maps 0 -> exactly 0 (relu/hswish/linear all fix 0; rint and
            # clip preserve it), so zeroing the BIAS there yields exact
            # post-requant zeros without the two full-tensor selects. The
            # tap2 fixup rides free: _shift_cols(-1) pulls the now-zero
            # column w4 into the wrapped lanes of column w4-1.
            ebm = jnp.where(jnp.logical_and(rows_valid, col_i < w4), eb,
                            jnp.float32(0.0))
            z = _named_requant_f32(z.reshape(bn, rows, w4p, 2 * ee) + ebm,
                                   ea, e_inv, act, fold)
            z_e, z_o = z[..., :ee], z[..., ee:]
            roll_e = pltpu.roll(z_e, ee - epix, axis=3)
            z_2 = jnp.where(lane_e >= ee - epix, _shift_cols(roll_e, -1),
                            roll_e)
        else:
            z = _named_requant_f32(z.reshape(bn, rows, w4p, 2 * ee) + eb,
                                   ea, e_inv, act, fold)
            z = jnp.where(rows_valid, z, 0.0)
            z_e, z_o = z[..., :ee], z[..., ee:]
            roll_e = pltpu.roll(z_e, ee - epix, axis=3)
            z_2 = jnp.where(lane_e >= ee - epix, _shift_cols(roll_e, -1),
                            roll_e)
            z_2 = jnp.where(tap2_valid, z_2, 0.0)
        for dx, z_t in enumerate((z_e, z_o, z_2)):
            acc = dw_acc(acc, z_t, dx)
    else:
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 128), 3)
        group = lane // cin
        # Tap algebra == the bf16 kernel: delta=1's group r-1 is odd
        # (never selected by S_even), delta=2's group r-2 pulls the next
        # column.
        tap1 = pltpu.roll(sv, 128 - cin, axis=3)
        roll2 = pltpu.roll(sv, (128 - 2 * cin) % 128, axis=3)
        tap2 = jnp.where(group >= r - 2, _shift_cols(roll2, -1), roll2)

        for dx, tap in enumerate((sv, tap1, tap2)):
            z = jnp.dot(
                tap.astype(jnp.bfloat16).reshape(bn * rows * w4p, 128),
                kw, preferred_element_type=jnp.float32)
            z = _named_requant_f32(z.reshape(bn, rows, w4p, ee) + eb, ea,
                                   e_inv, act, fold)
            z = jnp.where(rows_valid, z, 0.0)
            if dx == 2:
                z = jnp.where(tap2_valid, z, 0.0)
            acc = dw_acc(acc, z, dx)

    yd = _named_requant_f32(
        acc[:, :, 0:w4, :] + dwb_ref[0].astype(jnp.float32),
        da_ref[0], d_inv, act, fold)
    y2 = yd.astype(jnp.bfloat16).reshape(bn * th * w4, ee)
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32)
    out = out + pwb_ref[0].astype(jnp.float32)
    q = _named_requant_f32(out, pa_ref[0], p_inv, "linear", fold)
    o_ref[...] = q.reshape(bn, th, w4, -1).astype(out_dtype)


def expand_block_packed_s2_i8(
    x_packed: jax.Array,   # (N, H, W*Cin/128, 128) bf16-carried ints
    exp_w_i8, exp_b_i32, exp_a,
    dw_w_i8, dw_b_i32, dw_a,
    pw_w_i8, pw_b_i32, pw_a,
    cin: int, act: str, e_inv: float, d_inv: float, p_inv: float,
    out_dtype: str = "bfloat16",
    *,
    block_h: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
    eo: Optional[bool] = None,
    fastmask: Optional[bool] = None,
    fold: Optional[bool] = None,
) -> jax.Array:
    """Fused named-act int8 expand -> dw3x3 s2 -> LINEAR projection on an
    R-lane-packed bf16 integer carrier. Returns (N, H/2, W4, (R/2)*Cout)
    in out_dtype (int8 at a carriage boundary, bf16 to keep the carriage);
    pixel-major lanes — callers reshape freely to NHWC of the padded Cout.
    Bit-identical to quant/v3's XLA ops sequence (the interpret-tier test
    asserts EXACT equality). eo/fastmask=None take the float kernel's
    EO_EXPAND/FASTMASK defaults (resolved here, outside the jit)."""
    from ..ops import pallas_expand_s2 as _pes

    if eo is None:
        eo = _pes.EO_EXPAND
    if fastmask is None:
        fastmask = _pes.FASTMASK
    if fold is None:
        from . import v3 as _v3

        fold = _v3.FOLDED_REQUANT
    if interpret is None:
        interpret = _should_interpret()
    return _expand_block_packed_s2_i8_impl(
        x_packed, exp_w_i8, exp_b_i32, exp_a, dw_w_i8, dw_b_i32, dw_a,
        pw_w_i8, pw_b_i32, pw_a, cin=cin, act=act, e_inv=e_inv,
        d_inv=d_inv, p_inv=p_inv, out_dtype=out_dtype, block_h=block_h,
        block_n=block_n, interpret=interpret, eo=eo,
        fastmask=fastmask and eo, fold=bool(fold))


@functools.partial(
    jax.jit,
    static_argnames=("cin", "act", "e_inv", "d_inv", "p_inv", "out_dtype",
                     "block_h", "block_n", "interpret", "eo", "fastmask",
                     "fold"),
)
def _expand_block_packed_s2_i8_impl(
    x_packed: jax.Array,
    exp_w_i8, exp_b_i32, exp_a,
    dw_w_i8, dw_b_i32, dw_a,
    pw_w_i8, pw_b_i32, pw_a,
    *,
    cin: int, act: str, e_inv: float, d_inv: float, p_inv: float,
    out_dtype: str,
    block_h: Optional[int],
    block_n: Optional[int],
    interpret: bool,
    eo: bool,
    fastmask: bool = False,
    fold: bool = None,
) -> jax.Array:
    out_dtype = jnp.dtype(out_dtype)
    n, h, w4, lanes = x_packed.shape
    assert lanes == 128 and x_packed.dtype == jnp.bfloat16
    e = int(exp_w_i8.shape[1])
    cout = int(pw_w_i8.shape[1])
    r = 128 // cin
    assert expand_s2_eligible(cin, e, cout, w4 * r), (cin, e, cout, w4)
    assert h % 2 == 0
    h_out = h // 2
    ee = (r // 2) * e
    oc = (r // 2) * cout

    kwn = 2 * ee if eo else ee  # expand-matmul output width

    def est(bn_, th_):
        # Byte model of the bf16 kernel (2-byte in/out carriers, f32
        # working set; requant temporaries alias the z/acc buffers).
        rows = 2 * th_ + 2
        u_in = bn_ * rows * w4 * 128
        u_win = bn_ * rows * (w4 + 1) * 128
        u_z = bn_ * rows * (w4 + 1) * ee
        u_acc = bn_ * th_ * (w4 + 1) * ee
        u_out = bn_ * th_ * w4 * oc
        wts = (128 * kwn + kwn + 10 * ee + ee * oc + oc) * 4
        if eo:
            live = u_win * 4 + 4 * u_z * 4
        else:
            live = 3 * u_win * 4 + 2 * u_z * 4
        return int(
            2 * u_in * 2 + u_win * 2
            + live
            + u_acc * 4
            + u_out * (4 + 3 * 2)
        ) + wts

    cap = int(14 * 2**20)
    if block_h is None:
        th = h_out
        while th > 1 and (h_out % th or est(1, th) > cap):
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

    th_in = 2 * th if g == 1 else 2 * th + 2
    if g == 1:
        x_index = lambda b_, i: (b_ * bn, 0, 0, 0)
    else:
        x_index = lambda b_, i: (
            b_ * bn, jnp.minimum(i * 2 * th, h - (2 * th + 2)), 0, 0)

    sel = jnp.zeros((r, r // 2), jnp.int8).at[
        2 * jnp.arange(r // 2), jnp.arange(r // 2)].set(1)
    kw = jnp.kron(sel, exp_w_i8)                                  # (128, EE)
    if eo:
        sel_o = jnp.zeros((r, r // 2), jnp.int8).at[
            2 * jnp.arange(r // 2) + 1, jnp.arange(r // 2)].set(1)
        kw = jnp.concatenate([kw, jnp.kron(sel_o, exp_w_i8)], axis=1)
    kw = kw.astype(jnp.bfloat16)                                  # (128, KWN)
    ebE = jnp.tile(exp_b_i32.reshape(1, e), (1, kwn // e))
    eaE = jnp.tile(exp_a.reshape(1, e).astype(jnp.float32), (1, kwn // e))
    dww = jnp.tile(dw_w_i8.reshape(3, 3, e), (1, 1, r // 2))
    dwb = jnp.tile(dw_b_i32.reshape(1, e), (1, r // 2))
    daE = jnp.tile(dw_a.reshape(1, e).astype(jnp.float32), (1, r // 2))
    pww = jnp.kron(jnp.eye(r // 2, dtype=jnp.int8),
                   pw_w_i8).astype(jnp.bfloat16)                  # (EE, OC)
    pwb = jnp.tile(pw_b_i32.reshape(1, cout), (1, r // 2))
    paE = jnp.tile(pw_a.reshape(1, cout).astype(jnp.float32), (1, r // 2))

    kernel = functools.partial(
        _kernel, th=th, w4=w4, r=r, cin=cin, ee=ee, act=act,
        out_dtype=out_dtype, g=g, bn=bn, e_inv=float(e_inv),
        d_inv=float(d_inv), p_inv=float(p_inv), eo=eo, fastmask=fastmask,
        fold=fold,
    )

    return pl.pallas_call(
        kernel,
        grid=(n // bn, g),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(th_in), pl.Element(w4),
                 pl.Element(128)),
                x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((128, kwn), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kwn), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kwn), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ee), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ee), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ee), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ee, oc), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, th, w4, oc), lambda b_, i: (b_, i, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w4, oc), out_dtype),
        scratch_shapes=[pltpu.VMEM((bn, 2 * th + 2, w4 + 1, 128),
                                   jnp.bfloat16)],
        interpret=interpret,
    )(x_packed, kw, ebE, eaE, dww, dwb, daE, pww, pwb, paE)
