"""Fused INT8 inverted-residual Pallas kernel: V2's whole bottleneck with
per-stage requantization in VMEM.

The int8 twin of ops/pallas_ir_block.py (quant/v2.py module doc called it
future work) built ONLY from idioms already hw-validated in this repo:

    x (int8, 2D) --s8 x s8 MXU expand--> s32  --requant (f32, round-half-
    even)--> EXPANDED tile carried as bf16 integers in the scratch (values
    <= 127 are exact in bf16; the pallas_block_i8 "bf16 carriage" trick —
    and it keeps the scratch at the FLOAT kernel's byte size, so the
    whole-image/rows feasibility math of pallas_ir_block transfers
    verbatim) --f32 9-tap dw (exact integer FMAs, sums << 2^24)--> requant
    --f32 reshape FIRST, int8 cast LAST (the packed_i8 reshape rule)-->
    s8 x s8 MXU projection --> s32 --linear requant--> [saturating
    residual add in exact f32] --> int8 out, 2D.

Activations cross HBM once per block at 1 byte/element; the expanded
tensor (the dominant HBM term of the unfused int8 schedule) never leaves
VMEM. Requant constants (m, six_q, bias_i32) come verbatim from
quant/v2.quantize_v2, so the gate vs forward_all_v2_i8 is EXACT equality,
like every int8 path here (CLAUDE.md invariants).

Eligibility: pallas_ir_block._mode at itemsize 2 (the scratch is bf16);
blocks that don't fit fall back to the XLA int8 ops per block, statically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_dw import _should_interpret
from ..ops.pallas_ir_block import _mode, _pick_bn, _round_up
from .pallas_block_packed_i8 import _requant_f32


def ir_i8_fits(n, h, w, cin, e, cout, stride) -> bool:
    """Static feasibility — the float IR kernel's envelope (bf16 scratch),
    either tiling mode (whole-image or rows)."""
    return _mode(n, h, w, cin, e, cout, stride, 2)[0] is not None


def _exp_dot_i8(xv, ew_ref, eb_ref):
    """Expand accumulation, exact in either carrier dtype (the
    quant/pallas_ir_v3_i8._exp_dot pattern, hw-validated there).

    int8 input: s8 x s8 -> i32 MXU dot (the original path). bf16-carried
    input (integers in [-128, 127] held exactly): bf16 MXU dot with f32
    accumulation — products <= 127^2 exact, partial sums < Cin*127^2 <
    2^24 for every V2 width, and |dot + bias| < 2^24 guarded at carry-plan
    time (quant/v2._bias_ok_i8). Returns f32 exact ints or i32 —
    _requant_f32 accepts both."""
    if xv.dtype == jnp.int8:
        return jax.lax.dot_general(
            xv, ew_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32) + eb_ref[0]
    acc = jnp.dot(xv, ew_ref[...], preferred_element_type=jnp.float32)
    return acc + eb_ref[0].astype(jnp.float32)


def _ir_i8_kernel(
    x_ref, ew_ref, eb_ref, em_ref, dww_ref, dwb_ref, dm_ref,
    pww_ref, pwb_ref, pm_ref, o_ref, s_ref,
    *, bn, h, w, stride, residual, six_e, six_d,
):
    ep = s_ref.shape[-1]
    h_out = -(-h // stride)
    w_out = -(-w // stride)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    # --- expand: exact dot in the carrier dtype, requant, bf16 carriage ----
    xv = x_ref[...]  # (BN*H*W, Cin) int8 or bf16-carried ints
    acc_e = _exp_dot_i8(xv, ew_ref, eb_ref)
    ye = _requant_f32(acc_e, em_ref[0], six_e, True)  # f32 ints in [0,127]
    y4 = ye.astype(jnp.bfloat16).reshape(bn, h, w, ep)  # exact carriage

    if stride == 1:
        s_ref[:, 1 : h + 1, 1 : w + 1, :] = y4
    else:
        s_ref[:, 0:h, 0:w, :] = y4

    # --- 9-tap dw in f32: exact integer FMAs (9 * 127^2 + bias << 2^24) ----
    sv = s_ref[...].astype(jnp.float32)
    if stride == 1:
        acc = jnp.zeros((bn, h, w, ep), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = sv[:, dy : dy + h, dx : dx + w, :]
                acc = acc + tap * dww_ref[dy, dx, :].astype(jnp.float32)
    else:
        w_full = 2 * w_out
        pairs = sv.reshape(bn, (h + 2) // 2, 2, w + 2, ep)
        acc_f = jnp.zeros((bn, h_out, w_full, ep), jnp.float32)
        for dy in range(3):
            r = pairs[:, dy // 2 : dy // 2 + h_out, dy % 2]
            for dx in range(3):
                acc_f = acc_f + (r[:, :, dx : dx + w_full, :]
                                 * dww_ref[dy, dx, :].astype(jnp.float32))
        acc = acc_f.reshape(bn, h_out, w_out, 2, ep)[:, :, :, 0, :]

    acc = acc + dwb_ref[0].astype(jnp.float32)  # exact: i32 bias in f32
    # acc already holds exact integers in f32 — _requant_f32's leading
    # astype(f32) is a no-op, value-identical to the oracle's i32 path.
    yd = _requant_f32(acc, dm_ref[0], six_d, True)
    # f32 reshape FIRST, int8 cast LAST (packed_i8 rule: 8-bit shape-casts
    # are a (32,128)-tile relayout; f32 reshapes are free).
    yd2 = yd.reshape(bn * h_out * w_out, ep).astype(jnp.int8)

    # --- linear projection: s8 x s8 -> s32, signed requant ------------------
    acc_p = jax.lax.dot_general(
        yd2, pww_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32) + pwb_ref[0]
    v = acc_p.astype(jnp.float32) * pm_ref[0].astype(jnp.float32)
    out = jnp.clip(jnp.round(v), -128, 127)  # f32 ints in [-128, 127]
    if residual:
        # Saturating int8 residual add, in exact f32 (|sum| <= 255 << 2^24).
        # Sequence matches the oracle: requant-clip, add, clip. An int8
        # input widens i8 -> i32 -> f32 (Mosaic can't cast i8 to f32
        # directly — the pallas_block_i8 widen rule); a bf16 carrier casts
        # straight to f32 (exact).
        xf = (xv.astype(jnp.float32) if xv.dtype == jnp.bfloat16
              else xv.astype(jnp.int32).astype(jnp.float32))
        out = jnp.clip(out + xf, -128, 127)
    o_ref[...] = out.astype(o_ref.dtype)


def _ir_i8_kernel_rows(
    x_ref, ew_ref, eb_ref, em_ref, dww_ref, dwb_ref, dm_ref,
    pww_ref, pwb_ref, pm_ref, o_ref, s_ref,
    *, th, h, w, stride, residual, six_e, six_d, g,
):
    """Row-tiled int8 variant: the float kernel's halo windows, placement
    cases, and position-dependent residual offsets (_ir_kernel_rows), with
    the int8 staging of _ir_i8_kernel. The input window is a 4D int8
    element block (the proven pallas_block_i8 window discipline)."""
    ep = s_ref.shape[-1]
    w_out = -(-w // stride)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, i == 0))
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    th_in = th + 2 if stride == 1 else 2 * th + 2
    cin = x_ref.shape[-1]
    xv = x_ref[...].reshape(th_in * w, cin)  # int8/bf16, small-C cast
    acc_e = _exp_dot_i8(xv, ew_ref, eb_ref)
    ye = _requant_f32(acc_e, em_ref[0], six_e, True)
    y4 = ye.astype(jnp.bfloat16).reshape(th_in, w, ep)

    if stride == 1:
        @pl.when(i == 0)
        def _():
            s_ref[1 : th + 2, 1 : w + 1, :] = y4[0 : th + 1]
            s_ref[0:1, 1 : w + 1, :] = jnp.zeros_like(
                s_ref[0:1, 1 : w + 1, :])

        if g > 2:
            @pl.when(jnp.logical_and(i > 0, i < g - 1))
            def _():
                s_ref[0 : th + 2, 1 : w + 1, :] = y4

        @pl.when(i == g - 1)
        def _():
            s_ref[0 : th + 1, 1 : w + 1, :] = y4[1 : th + 2]
            s_ref[th + 1 : th + 2, 1 : w + 1, :] = jnp.zeros_like(
                s_ref[th + 1 : th + 2, 1 : w + 1, :])
    else:
        @pl.when(i < g - 1)
        def _():
            s_ref[0 : 2 * th + 2, 0:w, :] = y4

        @pl.when(i == g - 1)
        def _():
            s_ref[0 : 2 * th, 0:w, :] = y4[2 : 2 * th + 2]
            s_ref[2 * th : 2 * th + 2, 0:w, :] = jnp.zeros_like(
                s_ref[2 * th : 2 * th + 2, 0:w, :])

    sv = s_ref[...].astype(jnp.float32)
    if stride == 1:
        acc = jnp.zeros((th, w, ep), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + (sv[dy : dy + th, dx : dx + w, :]
                             * dww_ref[dy, dx, :].astype(jnp.float32))
    else:
        w_full = 2 * w_out
        pairs = sv.reshape(th + 1, 2, w + 2, ep)
        acc_f = jnp.zeros((th, w_full, ep), jnp.float32)
        for dy in range(3):
            r = pairs[dy // 2 : dy // 2 + th, dy % 2]
            for dx in range(3):
                acc_f = acc_f + (r[:, dx : dx + w_full, :]
                                 * dww_ref[dy, dx, :].astype(jnp.float32))
        acc = acc_f.reshape(th, w_out, 2, ep)[:, :, 0, :]

    acc = acc + dwb_ref[0].astype(jnp.float32)
    yd = _requant_f32(acc, dm_ref[0], six_d, True)
    yd2 = yd.reshape(th * w_out, ep).astype(jnp.int8)
    acc_p = jax.lax.dot_general(
        yd2, pww_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32) + pwb_ref[0]
    v = acc_p.astype(jnp.float32) * pm_ref[0].astype(jnp.float32)
    out = jnp.clip(jnp.round(v), -128, 127)
    if not residual:
        o_ref[...] = out.astype(o_ref.dtype)
        return
    thw = th * w
    xf = (xv.astype(jnp.float32) if xv.dtype == jnp.bfloat16
          else xv.astype(jnp.int32).astype(jnp.float32))
    odt = o_ref.dtype

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.clip(out + xf[0:thw], -128, 127).astype(odt)

    if g > 2:
        @pl.when(jnp.logical_and(i > 0, i < g - 1))
        def _():
            o_ref[...] = jnp.clip(out + xf[w : w + thw],
                                  -128, 127).astype(odt)

    @pl.when(i == g - 1)
    def _():
        o_ref[...] = jnp.clip(out + xf[2 * w : 2 * w + thw],
                              -128, 127).astype(odt)


def inverted_residual_pallas_i8(
    x_i8, ew_i8, eb_i32, e_m, six_e, dww_i8, dwb_i32, d_m, six_d,
    pww_i8, pwb_i32, p_m, stride, residual, *,
    block_n: Optional[int] = None, interpret=None, out_dtype=jnp.int8,
):
    """One fused INT8 V2 bottleneck (whole-image or row-tiled mode — the
    float kernel's tiling decision at itemsize 2 applies verbatim).

    x_i8: (N, H, W, Cin) int8, or bfloat16 carrying the same integers (the
    V3 carriage discipline, quant/pallas_ir_v3_i8 — the expand dot runs in
    the carrier dtype, exactness bounds guarded at carry-plan time).
    out_dtype int8 (default) or bfloat16 — identical integers either way.
    Weights int8 (exp (Cin,E), dw (3,3,1,E) or
    (3,3,E), prj (E,Cout)); biases int32 in accumulator units; m vectors
    f32 per out-channel; six_q f32 scalars (quant/quantize.QuantLayer).
    Exactly equal to quant/v2's XLA ops sequence (exp pw_i8 -> dw3x3_i8 ->
    pw_i8_linear [-> _res_add]) — the int8 EXACT-gate contract.
    """
    return _ir_i8_impl(
        x_i8, ew_i8, eb_i32, jnp.asarray(e_m), dww_i8.reshape(3, 3, -1),
        dwb_i32, jnp.asarray(d_m), pww_i8, pwb_i32, jnp.asarray(p_m),
        int(stride), bool(residual), float(six_e), float(six_d),
        block_n=block_n, interpret=interpret,
        out_dtype=jnp.dtype(out_dtype).name)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "residual", "six_e", "six_d", "block_n",
                     "interpret", "out_dtype"),
)
def _ir_i8_impl(
    x, ew, eb, em, dww, dwb, dm, pww, pwb, pm,
    stride: int, residual: bool, six_e: float, six_d: float, *,
    block_n=None, interpret=None, out_dtype="int8",
):
    if interpret is None:
        interpret = _should_interpret()
    n, h, w, cin = x.shape
    e = ew.shape[1]
    cout = pww.shape[1]
    assert x.dtype in (jnp.int8, jnp.bfloat16), x.dtype
    assert ew.shape == (cin, e)
    assert dww.shape == (3, 3, e) and pww.shape == (e, cout)
    if stride == 2:
        assert h % 2 == 0 and w % 2 == 0, (h, w)
    if residual:
        assert stride == 1 and cin == cout, (stride, cin, cout)
    h_out = -(-h // stride)
    w_out = -(-w // stride)

    if x.dtype == jnp.bfloat16:
        # pre-cast the expand weight ONCE on the host for the bf16-carried
        # dot (the pallas_ir_v3_i8 pattern) instead of promoting s8->bf16
        # inside every grid step
        ew = ew.astype(jnp.bfloat16)
    # Pad the EXPANDED dim only (zero weights/bias/m: padded lanes hold
    # exact zeros through requant — m=0 maps any acc to 0).
    ep = _round_up(e, 128)
    if ep != e:
        ew = jnp.pad(ew, ((0, 0), (0, ep - e)))
        eb = jnp.pad(eb, (0, ep - e))
        em = jnp.pad(em, (0, ep - e))
        dww = jnp.pad(dww, ((0, 0), (0, 0), (0, ep - e)))
        dwb = jnp.pad(dwb, (0, ep - e))
        dm = jnp.pad(dm, (0, ep - e))
        pww = jnp.pad(pww, ((0, ep - e), (0, 0)))

    mode, tile = _mode(n, h, w, cin, e, cout, stride, 2)
    assert mode is not None or block_n is not None, (
        "infeasible shape — gate calls with ir_i8_fits",
        n, h, w, cin, e, cout, stride)

    def _w_specs(w_index, dw_index):
        return [
            pl.BlockSpec((cin, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ep), dw_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((ep, cout), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), w_index, memory_space=pltpu.VMEM),
        ]

    if mode == "whole" or block_n is not None:
        x_arg = x.reshape(n * h * w, cin)
        bn = block_n if block_n is not None else _pick_bn(
            n, h, w, cin, ep, cout, stride, 2)
        assert n % bn == 0, (n, bn)
        kernel = functools.partial(
            _ir_i8_kernel, bn=bn, h=h, w=w, stride=stride,
            residual=residual, six_e=six_e, six_d=six_d)
        grid = (n // bn,)
        in_specs = [pl.BlockSpec((bn * h * w, cin), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM)] + _w_specs(
                                     lambda b: (0, 0), lambda b: (0, 0, 0))
        o_spec = pl.BlockSpec((bn * h_out * w_out, cout),
                              lambda b: (b, 0), memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM((bn, h + 2, w + 2, ep), jnp.bfloat16)
    else:
        x_arg = x
        th = tile
        assert h_out % th == 0, (h_out, th)
        g = h_out // th
        assert g >= 2
        if stride == 1:
            th_in = th + 2
            x_index = lambda b, i: (
                b, jnp.clip(i * th - 1, 0, h - (th + 2)), 0, 0)
        else:
            th_in = 2 * th + 2
            x_index = lambda b, i: (
                b, jnp.minimum(i * 2 * th, h - (2 * th + 2)), 0, 0)
        kernel = functools.partial(
            _ir_i8_kernel_rows, th=th, h=h, w=w, stride=stride,
            residual=residual, six_e=six_e, six_d=six_d, g=g)
        grid = (n, g)
        in_specs = [pl.BlockSpec(
            (pl.Element(1), pl.Element(th_in), pl.Element(w),
             pl.Element(cin)), x_index, memory_space=pltpu.VMEM)] + _w_specs(
                lambda b, i: (0, 0), lambda b, i: (0, 0, 0))
        o_spec = pl.BlockSpec((th * w_out, cout), lambda b, i: (b * g + i, 0),
                              memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM(
            (th + 2 if stride == 1 else 2 * th + 2, w + 2, ep),
            jnp.bfloat16)
    out2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((n * h_out * w_out, cout),
                                       jnp.dtype(out_dtype)),
        scratch_shapes=[scratch],
        interpret=interpret,
    )(x_arg, ew, eb.reshape(1, ep), em.reshape(1, ep), dww,
      dwb.reshape(1, ep), dm.reshape(1, ep), pww, pwb.reshape(1, cout),
      pm.reshape(1, cout))
    return out2.reshape(n, h_out, w_out, cout)
