"""Fused INT8 V3 bottleneck Pallas kernel: named-act requant + SE, in VMEM.

The int8 twin of ops/pallas_ir_v3.py, assembled from the same hw-proven
idiom set as quant/pallas_ir_i8.py (s8 MXU dots after f32->i8 casts, bf16
integer carriage in the scratch, f32 requant, reshape-in-f32/cast-last),
plus the V3-specific stages of quant/v3.py computed in-kernel with
IDENTICAL op order — so the gate stays EXACT equality:

  expand s8 dot -> named requant (f32 real-units detour: v = f32(acc)*a,
  act(v), rint(v*inv_s), clamp) -> bf16-carried ints in the zero-border
  scratch -> k in {3,5} exact-integer f32 dw taps -> named requant ->
  [QUANTIZED SE in-kernel: exact f32 int sum over the resident spatial
  extent -> rint mean -> s8 pooled -> s8 SE dots with int32 accumulation
  -> relu requant -> hard-sigmoid gate in f32 -> rint(z*gate)] ->
  s8 projection -> linear requant -> saturating residual add (exact f32).

Exactness notes mirroring quant/v3.py:
  - the pooled sum: <= 127 * H*W <= 127*3136 partial sums stay far below
    2^24, so f32 accumulation is exact in ANY order — the in-kernel sum
    over the whole-image tile equals the oracle's int32 sum bit-for-bit.
  - the gate multiply rint(f32(z) * gate): both sides compute the same
    IEEE f32 product of identical operands (z exact ints, gate derived
    from exact int accs through identical f32 ops), so rounding matches.

SE blocks need whole-image tiles (the full spatial extent resident — the
same argument as the float V3 kernel); k=3 no-SE blocks also ride the
row-tiled mode; no-expand blocks fuse via an exact identity expansion.
Activations can ride int8 OR bfloat16 integer carriage on both sides
(v3_block_pallas_i8 docstring; quant/v3._fused_plan_v3 decides).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_dw import _should_interpret
from ..ops.pallas_ir_block import _round_up
from ..ops.pallas_ir_v3 import _pads, _pick_bn, _scratch_pad


def v3_i8_fits(n, h, w, cin, e, cout, k, stride, se=0) -> bool:
    """Feasibility at the bf16-carriage envelope (itemsize 2 — the float
    V3 kernel's tiling math transfers verbatim): whole-image tiles, or
    the row-tiled mode for big-spatial k=3 no-SE blocks."""
    from ..ops.pallas_ir_v3 import _mode as _v3_mode

    return _v3_mode(n, h, w, cin, e, cout, k, stride, se, 2)[0] is not None


def _requant_named_k(acc_i32, a_vec, inv_s, act, fold=None):
    """In-kernel twin of quant/v3._requant_named_*: f32 value (ints in
    [-128, 127]); the int8 CAST is the caller's (reshape in f32 first).
    Delegates to the shared packed-kernel helper so this file picks up
    both round-5 requant folds (relu-in-clip + the single-multiplier
    FOLDED_REQUANT order) from exactly one implementation."""
    from .pallas_block_packed_i8 import _named_requant_f32

    return _named_requant_f32(acc_i32.astype(jnp.float32), a_vec,
                              float(inv_s), act, fold)


def _sdot(a_i8, b_i8):
    return jax.lax.dot_general(
        a_i8, b_i8, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


# Projection as a bf16 MXU dot on exact integers instead of an s8 dot:
# skips the full-width f32 -> int8 CAST of the dw/SE output — f32 -> bf16
# is a cheap truncation. Exact while e*127² + |prj bias| < 2^24 (checked
# against the CONCRETE device tree at the call site). MEASURED OUT e2e on
# v5e (tools/ab_i8_prj.py, V3-Large 1.0-224 batch 256, 2026-08-19):
# 11,988 -> 11,815 img/s — the s8 MXU dot's 2x int8 rate and halved
# operand traffic beat the saved cast. Ships OFF; kept as a tested
# option (exactness covered by the ir_v3 int8 gates either way).
PRJ_BF16_DOT = False


def _prj_out(yd2d, pww_ref, pwb_ref, pa_ref, p_inv, prj_bf16, fold=None):
    if prj_bf16:
        acc = jnp.dot(yd2d.astype(jnp.bfloat16), pww_ref[...],
                      preferred_element_type=jnp.float32)
        return _requant_named_k(acc + pwb_ref[0].astype(jnp.float32),
                                pa_ref[0], p_inv, "linear", fold)
    out32 = _sdot(yd2d.astype(jnp.int8), pww_ref[...]) + pwb_ref[0]
    return _requant_named_k(out32, pa_ref[0], p_inv, "linear", fold)


def _exp_dot(xv, ew_ref, eb_ref):
    """Expand accumulation, exact in either carrier dtype.

    int8 input: s8 x s8 -> i32 MXU dot (the original path). bf16-carried
    input (integers in [-128, 127] held exactly): bf16 x bf16 MXU dot with
    f32 accumulation — every product is an exact int <= 127^2 (8-bit
    mantissas), the f32 sum of ints stays exact while |acc| < 2^24, and
    |dot| <= Cin*127^2 <= 160*16129 = 2.58e6 for every V3 expand, with the
    bias bound guarded at carry-plan time (quant/v3._carry_plan). Returns
    f32 (exact ints) or i32 — _requant_named_k accepts both.
    """
    if xv.dtype == jnp.int8:
        return _sdot(xv, ew_ref[...]) + eb_ref[0]
    acc = jnp.dot(xv, ew_ref[...], preferred_element_type=jnp.float32)
    return acc + eb_ref[0].astype(jnp.float32)


def _v3_i8_kernel(*refs, bn, h, w, k, stride, act_exp, act, se, residual,
                  e_inv, d_inv, p_inv, s1_inv, hw_inv, out_dtype,
                  wop=None, prj_bf16=False, fold=None):
    if se:
        (x_ref, ew_ref, eb_ref, ea_ref, dww_ref, dwb_ref, da_ref,
         pww_ref, pwb_ref, pa_ref, s1w_ref, s1b_ref, s1a_ref,
         s2w_ref, s2b_ref, s2a_ref, o_ref, s_ref) = refs
    else:
        (x_ref, ew_ref, eb_ref, ea_ref, dww_ref, dwb_ref, da_ref,
         pww_ref, pwb_ref, pa_ref, o_ref, s_ref) = refs
    ep = s_ref.shape[-1]
    h_out = -(-h // stride)
    w_out = -(-w // stride)
    lo, _ = _pads(k, stride)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    # --- expand: exact dot in the carrier dtype, named requant, bf16
    # integer carriage in the scratch ----------------------------------------
    xv = x_ref[...]  # (BN*H*W, Cin) int8 or bf16-carried ints
    ye = _requant_named_k(_exp_dot(xv, ew_ref, eb_ref),
                          ea_ref[0], e_inv, act_exp, fold)
    y4 = ye.astype(jnp.bfloat16).reshape(bn, h, w, ep)
    s_ref[:, lo : lo + h, lo : lo + w, :] = y4

    # --- k*k dw: exact-integer f32 taps (k^2 * 127^2 + bias << 2^24) -------
    sv = s_ref[...].astype(jnp.float32)
    if stride == 1:
        acc = jnp.zeros((bn, h, w, ep), jnp.float32)
        for dy in range(k):
            for dx in range(k):
                tap = sv[:, dy : dy + h, dx : dx + w, :]
                acc = acc + tap * dww_ref[dy, dx, :].astype(jnp.float32)
    else:
        w_full = 2 * w_out
        rows = sv.shape[1]
        pairs = sv.reshape(bn, rows // 2, 2, sv.shape[2], ep)
        acc_f = jnp.zeros((bn, h_out, w_full, ep), jnp.float32)
        for dy in range(k):
            r = pairs[:, dy // 2 : dy // 2 + h_out, dy % 2]
            for dx in range(k):
                acc_f = acc_f + (r[:, :, dx : dx + w_full, :]
                                 * dww_ref[dy, dx, :].astype(jnp.float32))
        acc = acc_f.reshape(bn, h_out, w_out, 2, ep)[:, :, :, 0, :]

    acc = acc + dwb_ref[0].astype(jnp.float32)
    yd = _requant_named_k(acc, da_ref[0], d_inv, act, fold)  # f32 ints, 4D

    # --- quantized SE gate (whole-image tile: exact in-register pooling) ---
    if se:
        y3 = yd.reshape(bn, h_out * w_out, ep)
        pooled = jnp.clip(jnp.round(jnp.sum(y3, axis=1)
                                    * jnp.float32(hw_inv)),
                          -128, 127).astype(jnp.int8)
        g1 = _requant_named_k(_sdot(pooled, s1w_ref[...]) + s1b_ref[0],
                              s1a_ref[0], s1_inv, "relu",
                              fold).astype(jnp.int8)
        acc2 = _sdot(g1, s2w_ref[...]) + s2b_ref[0]
        v = acc2.astype(jnp.float32) * s2a_ref[0].astype(jnp.float32)
        gate = jnp.clip(v + jnp.float32(3.0), 0.0, 6.0) * jnp.float32(
            1.0 / 6.0)
        out3 = jnp.round(y3 * gate[:, None, :])
        yd = jnp.clip(out3, -128, 127).reshape(bn, h_out, w_out, ep)

    # --- projection: bf16-exact or s8 MXU dot, linear requant, residual ----
    out = _prj_out(yd.reshape(bn * h_out * w_out, ep), pww_ref, pwb_ref,
                   pa_ref, p_inv, prj_bf16, fold)
    if residual:
        xf = (xv.astype(jnp.int32).astype(jnp.float32)
              if xv.dtype == jnp.int8 else xv.astype(jnp.float32))
        out = jnp.clip(out + xf, -128, 127)
    if wop is not None and wop != w_out:  # wpad: zero-fill the pad columns
        cout = out.shape[-1]
        out = jnp.pad(out.reshape(bn, h_out, w_out, cout),
                      ((0, 0), (0, 0), (0, wop - w_out), (0, 0))
                      ).reshape(bn * h_out * wop, cout)
    o_ref[...] = out.astype(out_dtype)


def _v3_i8_kernel_rows(
    x_ref, ew_ref, eb_ref, ea_ref, dww_ref, dwb_ref, da_ref,
    pww_ref, pwb_ref, pa_ref, o_ref, s_ref,
    *, th, h, w, stride, act_exp, act, residual, e_inv, d_inv, p_inv, g,
    out_dtype, prj_bf16=False, fold=None,
):
    """Row-tiled int8 V3 variant (k = 3, no SE): the float rows kernel's
    halo/placement/residual-offset structure with named-act int8 staging
    (quant/pallas_ir_i8's rows kernel, requant generalized)."""
    ep = s_ref.shape[-1]
    w_out = -(-w // stride)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, i == 0))
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    th_in = th + 2 if stride == 1 else 2 * th + 2
    cin = x_ref.shape[-1]
    xv = x_ref[...].reshape(th_in * w, cin)
    ye = _requant_named_k(_exp_dot(xv, ew_ref, eb_ref),
                          ea_ref[0], e_inv, act_exp, fold)
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
    yd = _requant_named_k(acc, da_ref[0], d_inv, act, fold)
    out = _prj_out(yd.reshape(th * w_out, ep), pww_ref, pwb_ref,
                   pa_ref, p_inv, prj_bf16, fold)
    if not residual:
        o_ref[...] = out.astype(out_dtype)
        return
    thw = th * w
    xf = (xv.astype(jnp.int32).astype(jnp.float32)
          if xv.dtype == jnp.int8 else xv.astype(jnp.float32))

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.clip(out + xf[0:thw], -128, 127).astype(out_dtype)

    if g > 2:
        @pl.when(jnp.logical_and(i > 0, i < g - 1))
        def _():
            o_ref[...] = jnp.clip(out + xf[w : w + thw],
                                  -128, 127).astype(out_dtype)

    @pl.when(i == g - 1)
    def _():
        o_ref[...] = jnp.clip(out + xf[2 * w : 2 * w + thw],
                              -128, 127).astype(out_dtype)


def v3_block_pallas_i8(
    x_i8, exp, dw, prj, *, k, stride, act, se1=None, se2=None,
    residual=False, out_dtype=jnp.int8, block_n: Optional[int] = None,
    interpret=None, fold: Optional[bool] = None,
):
    """One fused INT8 V3 bottleneck. Layer dicts carry the quant/v3
    device-tree fields {w (int8), b (int32), a (f32 per-out), inv_s
    (float)}; se1/se2 are the SE conv layers or None. Exactly equal to
    quant/v3's XLA ops sequence per block (the int8 EXACT contract).

    Carrier dtypes (the V1 bf16-carriage idea, quant/model.py): x_i8 is
    int8 OR bfloat16 holding the same integers — bf16 carriage keeps the
    big-spatial element windows in the float kernel's hw-proven geometry
    (int8 4D windows lower to per-step relayouts that measured 6x slower
    at 112²; benchmarks/v3_campaign_raw.log attribution). out_dtype
    int8 | bfloat16 likewise; values are identical integers either way.

    exp=None runs an IDENTITY expansion with NO activation (the no-expand
    block 0): eye weights, zero bias, a=1, inv_s=1 — requant becomes
    rint(f32(x) * 1 * 1) = x, exact for any int8 input."""
    se = 0 if se1 is None else int(se1["w"].shape[1])
    if exp is None:
        import numpy as np

        cin = int(x_i8.shape[-1])
        wd = jnp.int8 if x_i8.dtype == jnp.int8 else jnp.bfloat16
        exp = {"w": jnp.eye(cin, dtype=wd),
               "b": jnp.zeros((cin,), jnp.int32),
               "a": jnp.ones((cin,), jnp.float32),
               "inv_s": np.float32(1.0)}
        act_exp = "linear"
    else:
        act_exp = act
    args = [x_i8, exp["w"], exp["b"], exp["a"],
            dw["w"].reshape(k, k, -1), dw["b"], dw["a"],
            prj["w"], prj["b"], prj["a"]]
    invs = (float(exp["inv_s"]), float(dw["inv_s"]), float(prj["inv_s"]),
            float(se1["inv_s"]) if se else 0.0)
    if se:
        args += [se1["w"], se1["b"], se1["a"], se2["w"], se2["b"], se2["a"]]
    prj_bf16 = False
    if PRJ_BF16_DOT:
        import numpy as np  # noqa: PLC0415

        try:  # exactness bound vs the CONCRETE quantized constants
            e_terms = int(prj["w"].shape[0])
            bmax = int(np.abs(np.asarray(prj["b"])).max())
            prj_bf16 = e_terms * 127 * 127 + bmax < 2 ** 24
        except Exception:  # traced tree: keep the s8 dot
            prj_bf16 = False
    if fold is None:  # resolve OUTSIDE the impl-jit (the EO_EXPAND rule)
        from . import v3 as _v3

        fold = _v3.FOLDED_REQUANT
    return _v3_i8_impl(*args, k=int(k), stride=int(stride),
                       act_exp=str(act_exp), act=str(act),
                       se=se, residual=bool(residual), invs=invs,
                       out_dtype=jnp.dtype(out_dtype).name,
                       block_n=block_n, interpret=interpret,
                       prj_bf16=prj_bf16, fold=bool(fold))


@functools.partial(
    jax.jit,
    static_argnames=("k", "stride", "act_exp", "act", "se", "residual",
                     "invs", "out_dtype", "block_n", "interpret",
                     "prj_bf16", "fold"),
)
def _v3_i8_impl(x, ew, eb, ea, dww, dwb, da, pww, pwb, pa, *se_args,
                k, stride, act_exp, act, se, residual, invs,
                out_dtype="int8", block_n=None, interpret=None,
                prj_bf16=False, fold=None):
    if interpret is None:
        interpret = _should_interpret()
    out_dtype = jnp.dtype(out_dtype)
    n, h, w, cin = x.shape
    e = ew.shape[1]
    cout = pww.shape[1]
    assert x.dtype in (jnp.int8, jnp.bfloat16) and dww.shape == (k, k, e)
    if x.dtype == jnp.bfloat16 and ew.dtype == jnp.int8:
        ew = ew.astype(jnp.bfloat16)  # ints <= 127: exact in bf16
    if stride == 2:
        assert h % 2 == 0 and w % 2 == 0, (h, w)
    if residual:
        assert stride == 1 and cin == cout, (stride, cin, cout)
    h_out = -(-h // stride)
    w_out = -(-w // stride)

    ep = _round_up(e, 128)
    if ep != e:
        ew = jnp.pad(ew, ((0, 0), (0, ep - e)))
        eb = jnp.pad(eb, (0, ep - e))
        ea = jnp.pad(ea, (0, ep - e))
        dww = jnp.pad(dww, ((0, 0), (0, 0), (0, ep - e)))
        dwb = jnp.pad(dwb, (0, ep - e))
        da = jnp.pad(da, (0, ep - e))
        pww = jnp.pad(pww, ((0, ep - e), (0, 0)))
    if se:
        s1w, s1b, s1a, s2w, s2b, s2a = se_args
        if ep != e:
            s1w = jnp.pad(s1w, ((0, ep - e), (0, 0)))
            s2w = jnp.pad(s2w, ((0, 0), (0, ep - e)))
            s2b = jnp.pad(s2b, (0, ep - e))
            s2a = jnp.pad(s2a, (0, ep - e))

    if prj_bf16:
        pww = pww.astype(jnp.bfloat16)  # ints <= 127: exact in bf16

    from ..ops.pallas_ir_v3 import _mode as _v3_mode

    mode, tile = _v3_mode(n, h, w, cin, e, cout, k, stride, se, 2)
    assert mode is not None or block_n is not None, (
        "gate calls with v3_i8_fits", n, h, w, cin, e, cout, k, stride, se)
    e_inv, d_inv, p_inv, s1_inv = invs

    def _w_specs(w_index, dw_index):
        return [
            pl.BlockSpec((cin, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, ep), dw_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((ep, cout), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), w_index, memory_space=pltpu.VMEM),
        ]

    args = [None, ew, eb.reshape(1, ep), ea.reshape(1, ep), dww,
            dwb.reshape(1, ep), da.reshape(1, ep), pww,
            pwb.reshape(1, cout), pa.reshape(1, cout)]
    if mode in ("whole", "wpad") or block_n is not None:
        args[0] = x.reshape(n * h * w, cin)
        wop = tile[1] if mode == "wpad" else w_out
        if mode == "wpad":
            bn = tile[0]
        else:
            bn = block_n if block_n is not None else _pick_bn(
                n, h, w, cin, ep, cout, k, stride, se, 2)
        assert n % bn == 0, (n, bn)
        kernel = functools.partial(
            _v3_i8_kernel, bn=bn, h=h, w=w, k=k, stride=stride,
            act_exp=act_exp, act=act, se=se, residual=residual,
            e_inv=e_inv, d_inv=d_inv, p_inv=p_inv, s1_inv=s1_inv,
            hw_inv=1.0 / float(h_out * w_out), out_dtype=out_dtype,
            wop=wop, prj_bf16=prj_bf16, fold=fold)
        grid = (n // bn,)
        w_index = lambda b: (0, 0)
        in_specs = [pl.BlockSpec((bn * h * w, cin), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM)] + _w_specs(
                                     w_index, lambda b: (0, 0, 0))
        if se:
            in_specs += [
                pl.BlockSpec((ep, se), w_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, se), w_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, se), w_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((se, ep), w_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            ]
            args += [s1w, s1b.reshape(1, se), s1a.reshape(1, se),
                     s2w, s2b.reshape(1, ep), s2a.reshape(1, ep)]
        w_eff = wop
        o_spec = pl.BlockSpec((bn * h_out * wop, cout), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
        pr = _scratch_pad(k, stride, h)
        pc = _scratch_pad(k, stride, w)
        scratch = pltpu.VMEM((bn, h + pr, w + pc, ep), jnp.bfloat16)
    else:
        assert k == 3 and not se  # rows contract (ops/pallas_ir_v3._mode)
        args[0] = x
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
            _v3_i8_kernel_rows, th=th, h=h, w=w, stride=stride,
            act_exp=act_exp, act=act, residual=residual, e_inv=e_inv,
            d_inv=d_inv, p_inv=p_inv, g=g, out_dtype=out_dtype,
            prj_bf16=prj_bf16, fold=fold)
        grid = (n, g)
        in_specs = [pl.BlockSpec(
            (pl.Element(1), pl.Element(th_in), pl.Element(w),
             pl.Element(cin)), x_index, memory_space=pltpu.VMEM)] + _w_specs(
                lambda b, i: (0, 0), lambda b, i: (0, 0, 0))
        w_eff = w_out
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
        out_shape=jax.ShapeDtypeStruct((n * h_out * w_eff, cout), out_dtype),
        scratch_shapes=[scratch],
        interpret=interpret,
    )(*args)
    out4 = out2.reshape(n, h_out, w_eff, cout)
    return out4[:, :, :w_out, :] if w_eff != w_out else out4
