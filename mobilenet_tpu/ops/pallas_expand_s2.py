"""Fused expand + depthwise-3x3 stride-2 + linear projection, lane-packed.

The narrow stride-2 expand block (V3-Large block 1: Cin=16 at 112p, E=64;
reference analog: the dw/pw pair of BASELINE.json:5 with V3's expansion) was
the single fattest segment of the bf16 model after the 2026-08-19 packed
campaign: the two-stage packed route (ops.pallas_block_packed.packed_expand
-> separable_block_packed_s2) measured 3.85 ms/batch-256 in-network against
a 0.17 ms fused HBM floor (tools/prefix_attr.py + tools/roofline.py --model
v3, benchmarks/roofline_v5e.md). The two structural costs, measured by
tools/probe_b1_s2.py / stage_probe_v3.py (bf16 weights):

  1. the expanded tensor round-trips HBM between the stages (411 MB write +
     411 MB read at 112p E=64 batch 256 — ~1.3 ms at real bandwidth), and
  2. the packed s2 kernel computes its full-pixel accumulator A[p] at EVERY
     pixel and discards the odd half in the selection matmul — 2x the
     depthwise FMA work, all of it f32 on the VPU (~2.4 ms: 9 taps x
     256*56 rows x 57 col-groups x 128 lanes).

This kernel removes both:

  * The three dw COLUMN taps are built by lane rolls on the NARROW packed
    input (128-wide rows, the cheap rolls the packed kernels already use)
    BEFORE expansion — a pixel shift commutes with the per-pixel 1x1
    expand and its elementwise activation.
  * Each tap is expanded by ONE MXU matmul with kron(S_even, exp_w), where
    S_even[j, u] = (j == 2u) selects the even pixels of each R-group during
    the expansion itself: the expanded activations exist only in VMEM, in
    f32, at HALF the pixel count (exactly the pixels the stride-2 dw
    output needs). K stays the full 128 lanes; the (R - R/2)*E structural
    zero columns ride free MXU capacity.
  * The 9 dw FMAs accumulate over (th, W4+1, (R/2)*E) — half the width of
    the discard-based kernel — and the projection is one MXU matmul with
    kron(I_{R/2}, pw_w), emitting output pixels CONTIGUOUSLY: the
    (N, H/2, W4, (R/2)*Cout) result reshapes freely (row-major preserved)
    to dense NHWC.

Zero-padding exactness: the dw consumes z = act(expand(x)) padded with
ZEROS (SAME padding pads the activation, not the pre-bias input), but a
shifted-then-expanded border pixel would read act(exp_b) instead. Two mask
fixups restore exact zeros: (a) rows beyond H at the last grid step, and
(b) the delta=2 tap's last even slot at the last real column group (the
only lane/col combination that references pixel W). The delta=1 tap needs
NO cross-column fixup at all: its group R-1 lanes are odd pixels, which the
even-pixel selection never reads.

Numerics: the expanded activations stay f32 between expand and dw (the
two-stage route rounds to bf16 at the HBM boundary), so logits differ from
the two-stage route within the bf16 reassociation class — gated by the
scale-aware routing gate (golden.ROUTING_BF16_*), like every fused-vs-xla
comparison. The int8 twin (quant.pallas_expand_s2_i8) keeps the EXACT
contract: integer accumulation is order-independent.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_block_packed import _act, _shift_cols
from .pallas_dw import _should_interpret


# Even/odd split expansion (the eo=True route): ONE (128, 2*EE) matmul
# computes both the even-pixel and odd-pixel expansions of the UNSHIFTED
# input; the third dw column tap (delta=2 = even pixels shifted by one
# slot) is a lane roll of the even half by E lanes. Replaces 3 matmuls +
# 3 act passes + 2 input rolls with 1 matmul + 1 act pass + 1 roll —
# bit-identical (the shift is a pure pixel permutation; the kron'd
# matmuls sum the same 16 products in the same K order, the structural
# zeros land elsewhere but add exactly). Raced on chip 2026-08-19
# (tools/ab_eo_expand.py, V3-Large b1 geometry batch 256 bf16):
# standalone 2.71 vs 3.19 ms; e2e V3-Large 1.0-224 16,378 vs 16,055
# img/s, logits bit-identical on the MXU — SHIPS ON.
EO_EXPAND = True

# Masked-bias border handling (round-5 VERDICT #2 attack): the two border
# fixups both force EXACT ZEROS onto z — bottom-padding rows at the last
# grid step (rows_valid) and the pixel-W reference of the delta=2 tap
# (tap2_valid). Since act(0) = 0 for relu/relu6 and every invalid z
# element has an all-zero input row/column in the scratch window, zeroing
# the BIAS at those (row, col) positions makes z = act(0*kw + 0) = 0
# exactly — replacing two full-tensor selects (+ their iota/or chains) on
# the (rows, W4+1, 2*EE) expanded tensor with one (rows, W4+1)-shaped mask
# on the bias row. The tap2 fixup rides free because _shift_cols(-1)
# pulls column w4 — now exactly zero — into the wrapped lanes of column
# w4-1. Bit-identical to the where-based path
# (tests/test_pallas_expand_s2.py). RACED 2026-08-20 (tools/abx.py, V2
# 1.0-224 batch 256 bf16, hi-class tunnel): e2e 17.979 vs 17.959 ms — a
# 0.1% WASH; standalone at V2-b1 geometry 3.75 vs 3.71 ms (the bias-mask
# materialization costs what the two selects did — Mosaic lowers
# broadcasted selects nearly free). SHIPS OFF; kept as the measured-out
# record that the border masks are NOT the b1 cost. The residual account:
# the kernel is VPU-bound (act 1.29 + dw 0.95 + epilogue 0.42 ms of
# irreducible per-element work at this geometry) with ~72% of the
# MXU/roll/boundary work hidden behind it. eo-mode only.
FASTMASK = False


def _expand_s2_kernel(
    x_ref, kw_ref, eb_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, o_ref, s_ref,
    *, th, w4, r, cin, ee, relu6, out_dtype, g, bn, pw_epilogue, eo,
    fastmask=False,
):
    i = pl.program_id(1)
    is_first_step = jnp.logical_and(pl.program_id(0) == 0, i == 0)

    @pl.when(is_first_step)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    # Rows cover image rows [2*ts, 2*ts + 2*th + 1]; col W4 stays a zero
    # border (same contract as pallas_block_packed._packed_s2_kernel).
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

    sv = s_ref[...].astype(jnp.float32)  # (BN, 2th+2, W4+1, 128)
    rows = sv.shape[1]
    w4p = w4 + 1

    # Validity masks (see module docstring): rows >= 2*th at the LAST grid
    # step are bottom padding, and the delta=2 tap's last even slot at the
    # last real column is pixel W — their post-expand values must be 0.
    row_i = jax.lax.broadcasted_iota(jnp.int32, (1, rows, 1, 1), 1)
    rows_valid = jnp.logical_or(i < g - 1, row_i < 2 * th)
    col_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, w4p, 1), 2)
    lane_e = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, ee), 3)
    epix = ee // (r // 2)  # lanes per expanded pixel slot (= E)
    tap2_valid = None
    if not (eo and fastmask):
        tap2_valid = jnp.logical_not(
            jnp.logical_and(col_i == w4 - 1, lane_e >= ee - epix))

    kw = kw_ref[...]          # (128, EE) or (128, 2*EE) in eo mode
    eb = eb_ref[0].astype(jnp.float32)
    prec = (jax.lax.Precision.HIGHEST if kw.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

    n_pairs = rows // 2
    acc = jnp.zeros((bn, th, w4p, ee), jnp.float32)

    def dw_acc(acc, z_t, dx):
        zp = z_t.reshape(bn, n_pairs, 2, w4p, ee)
        for dy in range(3):
            t = zp[:, dy // 2 : dy // 2 + th, dy % 2]
            acc = acc + t * dww_ref[dy, dx, :].astype(jnp.float32)
        return acc

    if eo:
        # One matmul: [kron(S_even, w) | kron(S_odd, w)] expands even and
        # odd pixels of the UNSHIFTED frame together. taps: delta=0 = even
        # half; delta=1 = odd half (pixel 2u+1 is in-group for every u —
        # no column fixup); delta=2 = even half rolled left one pixel slot
        # (E lanes), last slot pulling the next column group's slot 0.
        z = jnp.dot(sv.astype(kw.dtype).reshape(bn * rows * w4p, 128), kw,
                    preferred_element_type=jnp.float32, precision=prec)
        if fastmask:
            # Zero the bias at padding rows AND the zero border column w4:
            # their scratch input is all-zero, so z = act(0 + 0) = 0
            # exactly — no full-tensor selects, and the tap2 fixup comes
            # free (shift_cols(-1) pulls the now-exactly-zero column w4).
            ebm = jnp.where(
                jnp.logical_and(rows_valid, col_i < w4),
                eb.reshape(1, 1, 1, -1), jnp.float32(0.0))
            z = _act(z.reshape(bn, rows, w4p, 2 * ee) + ebm, relu6)
            z_e, z_o = z[..., :ee], z[..., ee:]
            roll_e = pltpu.roll(z_e, ee - epix, axis=3)
            z_2 = jnp.where(lane_e >= ee - epix, _shift_cols(roll_e, -1),
                            roll_e)
        else:
            z = _act(z.reshape(bn, rows, w4p, 2 * ee) + eb, relu6)
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
        # delta = 1: pixel p+1 at slot p. Group r-1 would need the next
        # column, but r-1 is ODD and the even-pixel selection never reads
        # odd slots — no fixup needed.
        tap1 = pltpu.roll(sv, 128 - cin, axis=3)
        # delta = 2: pixel p+2 at slot p; group r-2 (EVEN, selected) pulls
        # the next column's pixel 0. Group r-1 is odd garbage — never
        # selected.
        roll2 = pltpu.roll(sv, (128 - 2 * cin) % 128, axis=3)
        tap2 = jnp.where(group >= r - 2, _shift_cols(roll2, -1), roll2)

        for dx, tap in enumerate((sv, tap1, tap2)):
            z = jnp.dot(
                tap.astype(kw.dtype).reshape(bn * rows * w4p, 128), kw,
                preferred_element_type=jnp.float32, precision=prec)
            z = _act(z.reshape(bn, rows, w4p, ee) + eb, relu6)
            z = jnp.where(rows_valid, z, 0.0)
            if dx == 2:
                z = jnp.where(tap2_valid, z, 0.0)
            acc = dw_acc(acc, z, dx)

    y = _act(acc[:, :, 0:w4, :] + dwb_ref[0].astype(jnp.float32), relu6)
    y2 = y.astype(pww_ref.dtype).reshape(bn * th * w4, ee)
    out = jnp.dot(y2, pww_ref[...], preferred_element_type=jnp.float32,
                  precision=prec)
    out = out + pwb_ref[0].astype(jnp.float32)
    if pw_epilogue:
        out = _act(out, relu6)
    o_ref[...] = out.reshape(bn, th, w4, -1).astype(out_dtype)


def expand_s2_eligible(cin: int, e: int, cout: int, w: int) -> bool:
    """Static eligibility: even R = 128/Cin, packed width, and lane-aligned
    expanded/output tap widths (EE = (R/2)*E and OC = (R/2)*Cout both
    divide into 128-lane vectors)."""
    if not (0 < cin < 128 and 128 % cin == 0):
        return False
    r = 128 // cin
    return (r % 2 == 0 and (w * cin) % 128 == 0
            and ((r // 2) * e) % 128 == 0 and ((r // 2) * cout) % 128 == 0)


def expand_block_packed_s2(
    x_packed: jax.Array,
    exp_w: jax.Array,
    exp_b: jax.Array,
    dw_w: jax.Array,
    dw_b: jax.Array,
    pw_w: jax.Array,
    pw_b: jax.Array,
    cin: int,
    relu6: bool = False,
    *,
    pw_epilogue: bool = False,
    block_h: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
    eo: Optional[bool] = None,
    fastmask: Optional[bool] = None,
) -> jax.Array:
    """Fused act(expand 1x1) -> dw3x3 stride-2 + act -> pw projection on
    R-lane-packed narrow input. Returns (N, H/2, W4, (R/2)*Cout); callers
    reshape freely to the (R/2)-packed layout of Cout (dense NHWC when
    (R/2)*Cout == 128 per pixel... i.e. always contiguous pixel-major).

    pw_epilogue=False (default) emits the UNACTIVATED linear projection of
    an inverted-residual block; True applies the block activation (the V1
    separable-block mode). eo/fastmask=None take the module defaults —
    resolved HERE (outside the jit) so flag flips are never masked by a
    stale trace cache."""
    if eo is None:
        eo = EO_EXPAND
    if fastmask is None:
        fastmask = FASTMASK
    if interpret is None:
        interpret = _should_interpret()
    return _expand_block_packed_s2_impl(
        x_packed, exp_w, exp_b, dw_w, dw_b, pw_w, pw_b, cin=cin,
        relu6=relu6, pw_epilogue=pw_epilogue, block_h=block_h,
        block_n=block_n, interpret=interpret, eo=eo,
        fastmask=fastmask and eo)


@functools.partial(
    jax.jit,
    static_argnames=("cin", "relu6", "block_h", "block_n", "pw_epilogue",
                     "interpret", "eo", "fastmask"),
)
def _expand_block_packed_s2_impl(
    x_packed: jax.Array,  # (N, H, W*Cin/128, 128), lane = j*Cin + c
    exp_w: jax.Array,     # (Cin, E)
    exp_b: jax.Array,     # (E,)
    dw_w: jax.Array,      # (3, 3, 1, E)
    dw_b: jax.Array,      # (E,)
    pw_w: jax.Array,      # (E, Cout)
    pw_b: jax.Array,      # (Cout,)
    *,
    cin: int,
    relu6: bool,
    pw_epilogue: bool,
    block_h: Optional[int],
    block_n: Optional[int],
    interpret: bool,
    eo: bool,
    fastmask: bool = False,
) -> jax.Array:
    n, h, w4, lanes = x_packed.shape
    e = int(exp_w.shape[1])
    cout = int(pw_w.shape[1])
    r = 128 // cin
    assert lanes == 128 and expand_s2_eligible(cin, e, cout, w4 * r), (
        cin, e, cout, w4)
    assert h % 2 == 0
    h_out = h // 2
    ee = (r // 2) * e
    oc = (r // 2) * cout
    itm = jnp.dtype(x_packed.dtype).itemsize

    kwn = 2 * ee if eo else ee  # expand-matmul output width

    def est(bn_, th_):
        # Scoped-VMEM byte model (same style as pallas_block_packed.est):
        # 2 pipelined in blocks + scratch + f32 window (+ rolls or the
        # even/odd z pair) + live expanded taps + acc + pw temporaries +
        # 2 out blocks.
        rows = 2 * th_ + 2
        u_in = bn_ * rows * w4 * 128
        u_win = bn_ * rows * (w4 + 1) * 128
        u_z = bn_ * rows * (w4 + 1) * ee
        u_acc = bn_ * th_ * (w4 + 1) * ee
        u_out = bn_ * th_ * w4 * oc
        wts = (128 * kwn + kwn + 10 * ee + ee * oc + oc) * itm
        if eo:
            # sv + z_both (2 u_z) + rolled delta-2 tap + its select temp
            live = u_win * 4 + 4 * u_z * 4
        else:
            # sv + 2 hoisted input rolls + one live z + one select temp
            live = 3 * u_win * 4 + 2 * u_z * 4
        return int(
            2 * u_in * itm + u_win * itm          # in blocks + scratch
            + live
            + u_acc * 4
            + u_out * (4 + 3 * itm)               # f32 out + cast + 2 blocks
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

    dt = x_packed.dtype
    sel = jnp.zeros((r, r // 2), exp_w.dtype).at[
        2 * jnp.arange(r // 2), jnp.arange(r // 2)].set(1)
    kw = jnp.kron(sel, exp_w)                                  # (128, EE)
    if eo:
        sel_o = jnp.zeros((r, r // 2), exp_w.dtype).at[
            2 * jnp.arange(r // 2) + 1, jnp.arange(r // 2)].set(1)
        kw = jnp.concatenate([kw, jnp.kron(sel_o, exp_w)], axis=1)
    kw = kw.astype(dt)                                         # (128, KWN)
    ebE = jnp.tile(exp_b.reshape(1, e), (1, kwn // e))         # (1, KWN)
    dww = jnp.tile(dw_w.reshape(3, 3, e), (1, 1, r // 2))      # (3, 3, EE)
    dwb = jnp.tile(dw_b.reshape(1, e), (1, r // 2))
    pww = jnp.kron(jnp.eye(r // 2, dtype=pw_w.dtype), pw_w).astype(dt)
    pwb = jnp.tile(pw_b.reshape(1, cout), (1, r // 2))         # (1, OC)

    kernel = functools.partial(
        _expand_s2_kernel, th=th, w4=w4, r=r, cin=cin, ee=ee, relu6=relu6,
        out_dtype=dt, g=g, bn=bn, pw_epilogue=pw_epilogue, eo=eo,
        fastmask=fastmask,
    )

    return pl.pallas_call(
        kernel,
        grid=(n // bn, g),
        in_specs=[
            pl.BlockSpec(
                (pl.Element(bn), pl.Element(th_in), pl.Element(w4),
                 pl.Element(128)),
                x_index,
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((128, kwn), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kwn), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ee), lambda b_, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ee), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ee, oc), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc), lambda b_, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, th, w4, oc),
            lambda b_, i: (b_, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h_out, w4, oc), dt),
        scratch_shapes=[pltpu.VMEM((bn, 2 * th + 2, w4 + 1, 128), dt)],
        interpret=interpret,
    )(x_packed, kw, ebE, dww, dwb, pww, pwb)
