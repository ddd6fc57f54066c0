"""Fused V3 bottleneck Pallas kernel: expand -> dw kxk -> [SE] -> project.

The MobileNet-V3 twin of pallas_ir_block.py (reference analog: the
separable-block OpenCL kernels of SURVEY.md SS2 C4/C5, generalized to V3's
SE-gated bottleneck, Howard et al. 2019):

    expand 1x1 (MXU) -> act -> dw kxk (VPU stencil, k in {3,5}) -> act
      -> [squeeze-excite gate] -> linear project 1x1 (MXU) -> [+ residual]

all inside ONE kernel invocation. Three things V2's kernel could not do:

  - k = 5 depthwise stencils (V3's late-stage kernel): the SAME-padding
    geometry generalizes to (pad_lo, pad_hi) per (k, stride) and the
    stride-2 full-width-accumulate trick extends to 5 taps because the
    scratch is widened to w+4 (dx + 2*w_out <= w+4 for dx <= 4).
  - Named activations (relu / hswish; relu6 kept for shape reuse in tests)
    computed in f32 before the output cast — hard-swish is two VPU ops.
  - The squeeze-excite gate IN-KERNEL, in whole-image mode only: with the
    full spatial extent of the tile resident in VMEM, the mid-block global
    pool is a plain in-register reduction, and the two SE matmuls are
    (BN, Ep) x (Ep, Se) MXU calls. This is exactly why mobilenet_v3.py's
    first revision shipped xla-only ("SE's mid-block global reduction
    breaks the fusion story") — whole-image tiles un-break it. Row-tiled
    mode would need a cross-tile reduction, so SE blocks that don't fit a
    whole-image tile fall back to XLA (v3_fits gates this statically).

Everything else — 2D in/out blocks so unaligned Cin/Cout never meet a
vector shape cast, VMEM-only padding of the EXPANDED dim to a 128
multiple, zero-border scratch discipline, compile-time-failing VMEM
estimates (nothing can crash the device) — is the measured design of
pallas_ir_block.py / docs/design.md SS3, SS7; SS8 records the V3 story.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_dw import _should_interpret
from .pallas_ir_block import _VMEM_CAP, _VMEM_FACTOR, _min_bn, _round_up


def _kact(y, act: str):
    """f32 named activation (keras mobilenet_v3.py:542-553 formulas)."""
    if act == "linear":
        return y
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "relu6":
        return jnp.clip(y, 0.0, 6.0)
    assert act == "hswish", act
    return y * (jnp.clip(y + 3.0, 0.0, 6.0) * (1.0 / 6.0))


def _pads(k: int, stride: int):
    """TF-SAME (pad_lo, pad_hi) for odd k; stride 2 assumes even input
    (guaranteed by V3Config's resolution % 32 == 0 contract)."""
    total = k - 1 if stride == 1 else k - 2
    lo = total // 2
    return lo, total - lo


def _scratch_pad(k: int, stride: int, n_elems: int) -> int:
    """Row/col padding of the zero-border scratch. Stride 2 rounds up so
    the (rows, 2, ...) pairs reshape of the full-width trick stays legal
    (n_elems + pad must be even; n_elems is even at stride 2)."""
    lo, hi = _pads(k, stride)
    pad = lo + hi
    if stride == 2 and (n_elems + pad) % 2:
        pad += 1
    return pad


# ---------------------------------------------------------------------------
# VMEM estimates (pallas_ir_block calibration, k/SE-generalized)
# ---------------------------------------------------------------------------


def _est_bytes(bn, h, w, cin, ep, cout, k, stride, se, itemsize, wop=None):
    h_out, w_out = -(-h // stride), -(-w // stride)
    pr = _scratch_pad(k, stride, h)
    pc = _scratch_pad(k, stride, w)
    x_blk = bn * h * w * cin * itemsize
    exp_f32 = bn * h * w * ep * 4
    win = bn * (h + pr) * (w + pc) * ep * itemsize
    acc_w = w_out if stride == 1 else 2 * w_out
    acc = bn * h_out * acc_w * ep * 4
    out = bn * h_out * (wop or w_out) * cout * (4 + itemsize)
    weights = (cin * ep + ep * cout + (2 * k * k + 4) * ep) * itemsize
    if se:
        weights += (2 * ep * se + se + ep) * itemsize + bn * (2 * ep + 2 * se) * 4
    return int(_VMEM_FACTOR * (x_blk + exp_f32 + 2 * win + acc + out)) + weights


def _est_rows_bytes(th, h, w, cin, ep, cout, stride, itemsize):
    """Row-tiled mode estimate (k = 3 only, no SE — pallas_ir_block twin)."""
    th_in = th + 2 if stride == 1 else 2 * th + 2
    w_out = -(-w // stride)
    x_blk = th_in * w * cin * itemsize
    exp_f32 = th_in * w * ep * 4
    win = th_in * (w + 2) * ep * itemsize
    acc_w = w_out if stride == 1 else 2 * w_out
    acc = th * acc_w * ep * 4
    out = th * w_out * cout * (4 + itemsize)
    weights = (cin * ep + ep * cout + 22 * ep) * itemsize
    return int(_VMEM_FACTOR * (2 * x_blk + win + exp_f32 + acc + 2 * out)) + weights


def _pick_th(h, w, cin, ep, cout, stride, itemsize):
    """Row tile pick, directions as measured for V2 (pallas_ir_block
    _pick_th: stride 1 biggest-first, stride 2 smallest-first >= 4)."""
    h_out = -(-h // stride)
    w_out = -(-w // stride)
    cands = (range(h_out // 2, 0, -1) if stride == 1
             else range(4, h_out // 2 + 1))
    for th in cands:
        if h_out % th or (th * w_out) % 8:
            continue
        if _est_rows_bytes(th, h, w, cin, ep, cout, stride,
                           itemsize) <= _VMEM_CAP:
            return th
    for th in range(min(3, h_out // 2), 0, -1):
        if h_out % th == 0 and (th * w_out) % 8 == 0 and _est_rows_bytes(
                th, h, w, cin, ep, cout, stride, itemsize) <= _VMEM_CAP:
            return th
    return 0


def _mode(n, h, w, cin, e, cout, k, stride, se, itemsize):
    """("whole", bn) | ("rows", th) | ("wpad", (bn, wop)) | (None, 0).

    SE and k=5 require a whole-image tile (module docstring); rows mode
    covers the big-spatial non-SE k=3 blocks (V3-Large blocks 0-2 at 224).
    "wpad" is the whole-image mode with the OUTPUT width padded to the
    smallest wop making h_out*wop % 8 == 0: when h_out*w_out is odd (e.g.
    block 12 at 224 — 7*7=49), the Pallas sublane rule forces bn up to 8,
    busting VMEM at ep=768; padding the output block sidesteps the rule so
    bn can follow the INPUT rows constraint alone (bn=2 there). Costs one
    sliced HBM copy of the padded output (~2 MB at block 12) — measured
    worth it: the block otherwise falls back to XLA ops (10.2 ms int8 vs
    0.8 bf16; 2026-08-18 attribution)."""
    ep = _round_up(e, 128)
    if stride == 2 and (h % 2 or w % 2):
        return None, 0
    h_out, w_out = -(-h // stride), -(-w // stride)
    bn = _min_bn(n, h * w, h_out * w_out)
    if _est_bytes(bn, h, w, cin, ep, cout, k, stride, se,
                  itemsize) <= _VMEM_CAP:
        return "whole", bn
    if k == 3 and not se:
        th = _pick_th(h, w, cin, ep, cout, stride, itemsize)
        if th:
            return "rows", th
    wop = next((v for v in range(w_out, w_out + 8)
                if (h_out * v) % 8 == 0), w_out)
    if wop != w_out:
        bn = _min_bn(n, h * w, h_out * wop)
        if _est_bytes(bn, h, w, cin, ep, cout, k, stride, se, itemsize,
                      wop=wop) <= _VMEM_CAP:
            return "wpad", (bn, wop)
    return None, 0


def v3_fits(n, h, w, cin, e, cout, k, stride, se=0, itemsize=2,
            allow_wpad=True) -> bool:
    """Static feasibility of the fused route for one V3 block.

    allow_wpad=False excludes the padded-width whole mode: the bf16 MODEL
    routing passes False because XLA's dense MXU convs beat the fused
    VPU k5 stencil at the tiny-spatial wpad blocks (block 12 at 224:
    model-level 10,189 img/s with xla@b12 vs 9,994 fused-wpad@b12,
    2026-08-18 race); the int8 route keeps wpad (its XLA fallback costs
    10.2 ms there — carriage + wpad took int8 Large-224 1,858 -> 7,376)."""
    m = _mode(n, h, w, cin, e, cout, k, stride, se, itemsize)[0]
    return m is not None and (allow_wpad or m != "wpad")


def _pick_bn(n, h, w, cin, ep, cout, k, stride, se, itemsize):
    h_out, w_out = -(-h // stride), -(-w // stride)
    bn = _min_bn(n, h * w, h_out * w_out)
    while (
        bn * 2 <= n
        and n % (bn * 2) == 0
        and bn * h * w < 1024
        and _est_bytes(bn * 2, h, w, cin, ep, cout, k, stride, se, itemsize)
        <= 8 * 1024 * 1024
    ):
        bn *= 2
    return bn


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _dot(a, b, prec):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=prec)


def _se_gate(y_f32, sw1_ref, sb1_ref, sw2_ref, sb2_ref, hw_inv, prec):
    """In-kernel squeeze-excite: y (BN, HW, Ep) f32 -> gate (BN, Ep) f32.

    Zero-padding exactness: pooled padded lanes are 0 (dw weights/bias are
    zero there), sw1's padded ROWS are zero so they contribute nothing;
    sw2's padded COLS are zero so padded gate lanes are hsigmoid(0) = 0.5,
    which multiplies the all-zero padded activation lanes — still zero.
    """
    pooled = jnp.sum(y_f32, axis=1) * hw_inv                 # (BN, Ep)
    g = _dot(pooled.astype(sw1_ref.dtype), sw1_ref[...], prec)
    g = jnp.maximum(g + sb1_ref[0].astype(jnp.float32), 0.0)  # (BN, Se)
    g = _dot(g.astype(sw2_ref.dtype), sw2_ref[...], prec)
    g = g + sb2_ref[0].astype(jnp.float32)                   # (BN, Ep)
    return jnp.clip(g + 3.0, 0.0, 6.0) * (1.0 / 6.0)         # hard sigmoid


def _v3_kernel(
    *refs, bn, h, w, k, stride, act_exp, act, se, residual, out_dtype,
    wop=None,
):
    if se:
        (x_ref, ew_ref, eb_ref, dww_ref, dwb_ref, pww_ref, pwb_ref,
         sw1_ref, sb1_ref, sw2_ref, sb2_ref, o_ref, s_ref) = refs
    else:
        (x_ref, ew_ref, eb_ref, dww_ref, dwb_ref, pww_ref, pwb_ref,
         o_ref, s_ref) = refs
    ep = s_ref.shape[-1]
    h_out = -(-h // stride)
    w_out = -(-w // stride)
    lo, _ = _pads(k, stride)

    @pl.when(pl.program_id(0) == 0)
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    # --- expand 1x1 on the MXU (identity matrix when the block has no
    # expansion conv — act_exp is "linear" there so pre-activated stem
    # output passes through untouched) --------------------------------------
    xv = x_ref[...]  # (BN*H*W, Cin)
    prec = (jax.lax.Precision.HIGHEST if ew_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    ye = _kact(_dot(xv, ew_ref[...], prec) + eb_ref[0].astype(jnp.float32),
               act_exp)
    y4 = ye.astype(s_ref.dtype).reshape(bn, h, w, ep)

    # --- place into the zero-bordered scratch at the SAME-pad offset -------
    s_ref[:, lo : lo + h, lo : lo + w, :] = y4

    # --- branch-free k*k depthwise stencil ----------------------------------
    sv = s_ref[...]
    if stride == 1:
        acc = jnp.zeros((bn, h, w, ep), jnp.float32)
        for dy in range(k):
            for dx in range(k):
                tap = sv[:, dy : dy + h, dx : dx + w, :].astype(jnp.float32)
                acc = acc + tap * dww_ref[dy, dx, :].astype(jnp.float32)
    else:
        # Full-width accumulate + one even-column gather (the measured V2
        # stride-2 design). Scratch rows 2*G: tap dy for output row oy lives
        # at scratch row 2*oy + dy = pair group oy + dy//2, parity dy % 2.
        w_full = 2 * w_out
        rows = sv.shape[1]
        wcols = sv.shape[2]
        pairs = sv.reshape(bn, rows // 2, 2, wcols, ep)
        acc_f = jnp.zeros((bn, h_out, w_full, ep), jnp.float32)
        for dy in range(k):
            r = pairs[:, dy // 2 : dy // 2 + h_out, dy % 2]
            for dx in range(k):
                tap = r[:, :, dx : dx + w_full, :].astype(jnp.float32)
                acc_f = acc_f + tap * dww_ref[dy, dx, :].astype(jnp.float32)
        acc = acc_f.reshape(bn, h_out, w_out, 2, ep)[:, :, :, 0, :]

    y = _kact(acc + dwb_ref[0].astype(jnp.float32), act)

    # --- squeeze-excite gate (whole-image mode: spatial extent resident) ---
    if se:
        y3 = y.reshape(bn, h_out * w_out, ep)
        gate = _se_gate(y3, sw1_ref, sb1_ref, sw2_ref, sb2_ref,
                        1.0 / float(h_out * w_out), prec)
        y = (y3 * gate[:, None, :]).reshape(bn, h_out, w_out, ep)

    # --- linear projection on the MXU; residual as a 2D add ----------------
    y2 = y.astype(pww_ref.dtype).reshape(bn * h_out * w_out, ep)
    out_f = _dot(y2, pww_ref[...], prec) + pwb_ref[0].astype(jnp.float32)
    if wop is not None and wop != w_out:
        # wpad: pad the output width to wop so the HBM-crossing ref tiles
        # by 8 sublanes. The residual joins AFTER the cast in the model
        # dtype — the SAME order as the whole/rows modes, so the planner's
        # mode pick never changes numerics (and the chain kernel's
        # bit-identity contract composes across modes). Mosaic rejects
        # narrow-dtype multi-dim reshapes ((98,160)bf16 -> (2,7,7,160):
        # "unsupported shape cast"), so the pad runs on an f32 image of
        # the cast value (model->f32->model is exact).
        out = out_f.astype(out_dtype)
        if residual:
            out = out + xv.astype(out_dtype)
        cout = out.shape[-1]
        out_f = jnp.pad(
            out.astype(jnp.float32).reshape(bn, h_out, w_out, cout),
            ((0, 0), (0, 0), (0, wop - w_out), (0, 0))
        ).reshape(bn * h_out * wop, cout)
        o_ref[...] = out_f.astype(out_dtype)
        return
    out = out_f.astype(out_dtype)
    if residual:
        out = out + xv.astype(out_dtype)
    o_ref[...] = out


def _v3_kernel_rows(
    x_ref, ew_ref, eb_ref, dww_ref, dwb_ref, pww_ref, pwb_ref, o_ref, s_ref,
    *, th, h, w, stride, act_exp, act, residual, out_dtype, g,
):
    """Row-tiled variant (k = 3, no SE): pallas_ir_block._ir_kernel_rows
    with named activations — same halo windows, placement cases, and
    position-dependent residual offsets; see that kernel for the measured
    rationale (4D element windows, small-C casts, halo recompute)."""
    ep = s_ref.shape[-1]
    w_out = -(-w // stride)
    i = pl.program_id(1)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, i == 0))
    def _():
        s_ref[...] = jnp.zeros_like(s_ref)

    th_in = th + 2 if stride == 1 else 2 * th + 2
    cin = x_ref.shape[-1]
    xv = x_ref[...].reshape(th_in * w, cin)
    prec = (jax.lax.Precision.HIGHEST if ew_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    ye = _kact(_dot(xv, ew_ref[...], prec) + eb_ref[0].astype(jnp.float32),
               act_exp)
    y4 = ye.astype(s_ref.dtype).reshape(th_in, w, ep)

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

    sv = s_ref[...]
    if stride == 1:
        acc = jnp.zeros((th, w, ep), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = sv[dy : dy + th, dx : dx + w, :].astype(jnp.float32)
                acc = acc + tap * dww_ref[dy, dx, :].astype(jnp.float32)
    else:
        w_full = 2 * w_out
        pairs = sv.reshape(th + 1, 2, w + 2, ep)
        acc_f = jnp.zeros((th, w_full, ep), jnp.float32)
        for dy in range(3):
            r = pairs[dy // 2 : dy // 2 + th, dy % 2]
            for dx in range(3):
                tap = r[:, dx : dx + w_full, :].astype(jnp.float32)
                acc_f = acc_f + tap * dww_ref[dy, dx, :].astype(jnp.float32)
        acc = acc_f.reshape(th, w_out, 2, ep)[:, :, 0, :]

    y = _kact(acc + dwb_ref[0].astype(jnp.float32), act)
    y2 = y.astype(pww_ref.dtype).reshape(th * w_out, ep)
    out = _dot(y2, pww_ref[...], prec)
    out = (out + pwb_ref[0].astype(jnp.float32)).astype(out_dtype)
    if not residual:
        o_ref[...] = out
        return
    thw = th * w

    @pl.when(i == 0)
    def _():
        o_ref[...] = out + xv[0:thw].astype(out_dtype)

    if g > 2:
        @pl.when(jnp.logical_and(i > 0, i < g - 1))
        def _():
            o_ref[...] = out + xv[w : w + thw].astype(out_dtype)

    @pl.when(i == g - 1)
    def _():
        o_ref[...] = out + xv[2 * w : 2 * w + thw].astype(out_dtype)


# ---------------------------------------------------------------------------
# Entry
# ---------------------------------------------------------------------------


def v3_block_pallas(
    x, exp_w, exp_b, dw_w, dw_b, prj_w, prj_b, *, k, stride, act,
    se_w1=None, se_b1=None, se_w2=None, se_b2=None, residual=False,
    block_n: Optional[int] = None, block_th: Optional[int] = None,
    interpret=None,
):
    """One fused MobileNet-V3 bottleneck. TF-SAME semantics.

    x: (N, H, W, Cin); exp_w: (Cin, E) or None (no-expand block 0: an
    identity expansion with NO activation is used, exact for any input);
    dw_w: (k, k, 1, E) or (k, k, E); prj_w: (E, Cout); SE weights
    (E, Se)/(Se,)/(Se, E)/(E,) or all None. act in {"relu", "hswish",
    "relu6"}. Matches models.mobilenet_v3's xla branch within the bf16
    kernel tolerance class (golden.V3_TOL at model level).
    """
    cin = x.shape[-1]
    if exp_w is None:
        exp_w = jnp.eye(cin, dtype=x.dtype)
        exp_b = jnp.zeros((cin,), x.dtype)
        act_exp = "linear"
    else:
        act_exp = act
    se = 0 if se_w1 is None else int(se_w1.shape[1])
    return _v3_impl(
        x, exp_w, exp_b, dw_w.reshape(k, k, -1), dw_b, prj_w, prj_b,
        se_w1, se_b1, se_w2, se_b2, int(k), int(stride), str(act_exp),
        str(act), int(se), bool(residual), block_n=block_n,
        block_th=block_th, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("k", "stride", "act_exp", "act", "se", "residual",
                     "block_n", "block_th", "interpret"),
)
def _v3_impl(
    x, exp_w, exp_b, dw_w, dw_b, prj_w, prj_b, se_w1, se_b1, se_w2, se_b2,
    k: int, stride: int, act_exp: str, act: str, se: int, residual: bool,
    *, block_n=None, block_th=None, interpret=None,
):
    if interpret is None:
        interpret = _should_interpret()
    n, h, w, cin = x.shape
    e = exp_w.shape[1]
    cout = prj_w.shape[1]
    assert exp_w.shape == (cin, e) and dw_w.shape == (k, k, e)
    assert prj_w.shape == (e, cout) and k in (3, 5)
    if stride == 2:
        assert h % 2 == 0 and w % 2 == 0, (h, w)
    if residual:
        assert stride == 1 and cin == cout, (stride, cin, cout)
    if se:
        assert se_w1.shape == (e, se) and se_w2.shape == (se, e)
    h_out = -(-h // stride)
    w_out = -(-w // stride)

    ep = _round_up(e, 128)
    if ep != e:
        exp_w = jnp.pad(exp_w, ((0, 0), (0, ep - e)))
        exp_b = jnp.pad(exp_b, (0, ep - e))
        dw_w = jnp.pad(dw_w, ((0, 0), (0, 0), (0, ep - e)))
        dw_b = jnp.pad(dw_b, (0, ep - e))
        prj_w = jnp.pad(prj_w, ((0, ep - e), (0, 0)))
        if se:
            se_w1 = jnp.pad(se_w1, ((0, ep - e), (0, 0)))
            se_w2 = jnp.pad(se_w2, ((0, 0), (0, ep - e)))
            se_b2 = jnp.pad(se_b2, (0, ep - e))

    mode, tile = _mode(n, h, w, cin, e, cout, k, stride, se,
                       x.dtype.itemsize)
    assert mode is not None, ("infeasible shape — gate calls with v3_fits",
                              n, h, w, cin, e, cout, k, stride, se)

    w_args = [exp_w, exp_b.reshape(1, ep), dw_w, dw_b.reshape(1, ep),
              prj_w, prj_b.reshape(1, cout)]

    def _w_specs(w_index, dw_index):
        return [
            pl.BlockSpec((cin, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, ep), dw_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((ep, cout), w_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), w_index, memory_space=pltpu.VMEM),
        ]

    if mode in ("whole", "wpad") or block_n is not None:
        x_arg = x.reshape(n * h * w, cin)
        wop = tile[1] if mode == "wpad" else w_out
        if mode == "wpad":
            bn = tile[0]
        else:
            bn = block_n if block_n is not None else _pick_bn(
                n, h, w, cin, ep, cout, k, stride, se, x.dtype.itemsize)
        assert n % bn == 0, (n, bn)
        kernel = functools.partial(
            _v3_kernel, bn=bn, h=h, w=w, k=k, stride=stride,
            act_exp=act_exp, act=act, se=se, residual=residual,
            out_dtype=x.dtype, wop=wop)
        grid = (n // bn,)
        w_index = lambda b: (0, 0)
        dw_index = lambda b: (0, 0, 0)
        in_specs = [pl.BlockSpec((bn * h * w, cin), lambda b: (b, 0),
                                 memory_space=pltpu.VMEM)] + _w_specs(
                                     w_index, dw_index)
        args = [x_arg] + w_args
        if se:
            in_specs += [
                pl.BlockSpec((ep, se), w_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, se), w_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((se, ep), w_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ep), w_index, memory_space=pltpu.VMEM),
            ]
            args += [se_w1, se_b1.reshape(1, se), se_w2,
                     se_b2.reshape(1, ep)]
        w_eff = wop
        o_spec = pl.BlockSpec((bn * h_out * wop, cout), lambda b: (b, 0),
                              memory_space=pltpu.VMEM)
        pr = _scratch_pad(k, stride, h)
        pc = _scratch_pad(k, stride, w)
        scratch = pltpu.VMEM((bn, h + pr, w + pc, ep), x.dtype)
    else:
        assert k == 3 and not se  # rows mode contract (module docstring)
        x_arg = x
        th = tile if block_th is None else block_th
        assert h_out % th == 0, (h_out, th)
        g = h_out // th
        assert g >= 2, "rows mode needs >= 2 tiles"
        if stride == 1:
            th_in = th + 2
            x_index = lambda b, i: (
                b, jnp.clip(i * th - 1, 0, h - (th + 2)), 0, 0)
        else:
            th_in = 2 * th + 2
            x_index = lambda b, i: (
                b, jnp.minimum(i * 2 * th, h - (2 * th + 2)), 0, 0)
        kernel = functools.partial(
            _v3_kernel_rows, th=th, h=h, w=w, stride=stride,
            act_exp=act_exp, act=act, residual=residual, out_dtype=x.dtype,
            g=g)
        grid = (n, g)
        in_specs = [pl.BlockSpec(
            (pl.Element(1), pl.Element(th_in), pl.Element(w),
             pl.Element(cin)), x_index, memory_space=pltpu.VMEM)] + _w_specs(
                lambda b, i: (0, 0), lambda b, i: (0, 0, 0))
        args = [x_arg] + w_args
        w_eff = w_out
        o_spec = pl.BlockSpec((th * w_out, cout), lambda b, i: (b * g + i, 0),
                              memory_space=pltpu.VMEM)
        scratch = pltpu.VMEM(
            (th + 2 if stride == 1 else 2 * th + 2, w + 2, ep), x.dtype)

    out2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((n * h_out * w_eff, cout), x.dtype),
        scratch_shapes=[scratch],
        interpret=interpret,
    )(*args)
    out4 = out2.reshape(n, h_out, w_eff, cout)
    return out4[:, :, :w_out, :] if w_eff != w_out else out4
