"""Chain megakernel: a run of consecutive V3 bottlenecks in ONE launch.

Reference analog: the per-kernel clEnqueueNDRangeKernel dispatch model the
north-star replaces ("All 28 layers execute as one compiled program",
BASELINE.json:5) — taken one level further: the 14² stretch of V3-Large
(b6–b11) measures 0.77–1.23 ms per block in-network against ~0.02 ms of
MXU work each (benchmarks/roofline_v5e.md 2026-08-19 segment map). At
14², per-block grid steps are OVERHEAD-dominated: each whole-image kernel
streams its block in from HBM, runs a few-hundred-row matmul, and writes
back — 5 inter-block HBM round-trips (~8 MB each way) plus 6 kernels'
pipeline fill/drain for ~0.1 ms of real compute.

This kernel runs the whole run per grid step: activations never leave
VMEM between blocks. Per block it is the SAME computation as
`pallas_ir_v3._v3_kernel` in whole-image mode — same op order, same f32
accumulation, same cast-to-bf16 at each block boundary (where the
per-block route crosses HBM, this kernel casts in-register), so the
chain's output is BIT-IDENTICAL to the sequential per-block fused route
(asserted by tests/test_pallas_chain_v3.py in interpret mode).

Eligibility: every block whole-image-feasible (k ∈ {3,5}, stride ∈
{1,2}, unpadded output width) and the JOINT VMEM estimate (persistent
per-block zero-border scratches + the largest block's temporaries) under
the cap at bn ≥ 1.
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
from .pallas_ir_v3 import _dot, _kact, _pads, _scratch_pad, _se_gate


def _block_est(bn, sp, itm):
    """Temporaries of one block body: input value, f32 expand, the
    HOISTED f32 copy of the scratch window (Mosaic converts the whole
    window once rather than per tap), the accumulator, and the f32+cast
    output. Calibrated against a measured Mosaic scoped-vmem report
    (19.63M for an 8-block 56²-entry chain, 2026-08-19)."""
    h, w, k, stride = sp["h"], sp["w"], sp["k"], sp["stride"]
    ep, cout, cin = sp["ep"], sp["cout"], sp["cin"]
    h_out, w_out = -(-h // stride), -(-w // stride)
    pr = _scratch_pad(k, stride, h)
    pc = _scratch_pad(k, stride, w)
    x_blk = bn * h * w * cin * itm
    exp_f32 = bn * h * w * ep * 4
    win_f32 = bn * (h + pr) * (w + pc) * ep * 4
    acc_w = w_out if stride == 1 else 2 * w_out
    acc = bn * h_out * acc_w * ep * 4
    out = bn * h_out * w_out * cout * (4 + itm)
    return x_blk + exp_f32 + win_f32 + acc + out


def _scratch_bytes(bn, sp, itm):
    h, w = sp["h"], sp["w"]
    pr = _scratch_pad(sp["k"], sp["stride"], h)
    pc = _scratch_pad(sp["k"], sp["stride"], w)
    return bn * (h + pr) * (w + pc) * sp["ep"] * itm


def _weights_bytes(sp, itm):
    ep, cout, cin, k, se = sp["ep"], sp["cout"], sp["cin"], sp["k"], sp["se"]
    wts = (cin * ep + ep * cout + (k * k + 3) * ep + cout) * itm
    if se:
        wts += (2 * ep * se + se + ep) * itm
    return wts


def est_chain(bn, specs, itm):
    scr = sum(_scratch_bytes(bn, sp, itm) for sp in specs)
    # consecutive blocks' temporaries overlap in lifetime (block i's
    # output feeds block i+1's expand while i's buffers are still being
    # retired) — budget the worst ADJACENT PAIR, not the worst block
    ests = [_block_est(bn, sp, itm) for sp in specs]
    tmp = max(a + b for a, b in zip(ests, ests[1:])) if len(ests) > 1 \
        else ests[0]
    wts = sum(_weights_bytes(sp, itm) for sp in specs)
    io = 2 * specs[0]["h"] * specs[0]["w"] * specs[0]["cin"] * bn * itm
    h_l, _, wop = _out_geom(specs)
    io += 2 * bn * h_l * wop * specs[-1]["cout"] * itm
    return int(_VMEM_FACTOR * (scr + tmp + io)) + wts


def chain_specs(block_shapes, h, w, itemsize=2):
    """Static per-block spec dicts for a candidate run, or None if some
    block can't run whole-image in a chain. block_shapes: iterable of
    (cin, e, cout, k, stride, se) walked from input (h, w)."""
    specs = []
    for cin, e, cout, k, stride, se in block_shapes:
        if k not in (3, 5) or stride not in (1, 2):
            return None
        if stride == 2 and (h % 2 or w % 2):
            return None
        h_out, w_out = -(-h // stride), -(-w // stride)
        specs.append(dict(h=h, w=w, cin=cin, ep=_round_up(e, 128),
                          e=e, cout=cout, k=k, stride=stride, se=se))
        h, w = h_out, w_out
    return specs


def _out_geom(specs):
    """(h_f, w_f, wop): final spatial dims and the padded output width.
    When h_f*w_f doesn't tile by 8 sublanes (the 7² stretch: 49), pad the
    OUTPUT width to the smallest wop that does (the dense kernel's wpad
    trick, pallas_ir_v3._mode) instead of forcing bn up to 8 — only the
    HBM-crossing out ref needs the tiling, intermediates are values."""
    spl = specs[-1]
    h_f = -(-spl["h"] // spl["stride"])
    w_f = -(-spl["w"] // spl["stride"])
    wop = next((v for v in range(w_f, w_f + 8) if (h_f * v) % 8 == 0), w_f)
    return h_f, w_f, wop


def _bn_floor(n, specs):
    """Smallest bn making the chain's in AND out refs tile by 8 sublanes
    (only the HBM-crossing refs — intermediates are registers/values)."""
    sp0 = specs[0]
    h_f, _, wop = _out_geom(specs)
    return _min_bn(n, sp0["h"] * sp0["w"], h_f * wop)


def chain_fits(n, specs, itemsize=2) -> bool:
    if specs is None or len(specs) < 2:
        return False
    bn = _bn_floor(n, specs)
    return n % bn == 0 and est_chain(bn, specs, itemsize) <= _VMEM_CAP


def _pick_bn_chain(n, specs, itm):
    bn = _bn_floor(n, specs)
    while (bn * 2 <= n and n % (bn * 2) == 0
           and bn * specs[0]["h"] * specs[0]["w"] < 4096
           and est_chain(bn * 2, specs, itm) <= 10 * 1024 * 1024):
        bn *= 2
    return bn


def _chain_kernel(*refs, bn, specs, wop, out_dtype):
    nb = len(specs)
    x_ref = refs[0]
    w_refs, pos = [], 1
    for sp in specs:
        cnt = 10 if sp["se"] else 6
        w_refs.append(refs[pos : pos + cnt])
        pos += cnt
    o_ref = refs[pos]
    s_refs = refs[pos + 1 : pos + 1 + nb]

    @pl.when(pl.program_id(0) == 0)
    def _():
        for s in s_refs:
            s[...] = jnp.zeros_like(s)

    cur = x_ref[...]  # (BN*H0*W0, Cin0), model dtype
    for bi, sp in enumerate(specs):
        h, w, k, stride = sp["h"], sp["w"], sp["k"], sp["stride"]
        ep, se, act = sp["ep"], sp["se"], sp["act"]
        h_out, w_out = -(-h // stride), -(-w // stride)
        lo, _ = _pads(k, stride)
        s_ref = s_refs[bi]
        if se:
            (ew, eb, dww, dwb, pww, pwb, sw1, sb1, sw2, sb2) = w_refs[bi]
        else:
            (ew, eb, dww, dwb, pww, pwb) = w_refs[bi]

        prec = (jax.lax.Precision.HIGHEST if ew.dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        ye = _kact(_dot(cur, ew[...], prec) + eb[0].astype(jnp.float32),
                   sp["act_exp"])
        s_ref[:, lo : lo + h, lo : lo + w, :] = ye.astype(
            s_ref.dtype).reshape(bn, h, w, ep)

        sv = s_ref[...]
        if stride == 1:
            acc = jnp.zeros((bn, h, w, ep), jnp.float32)
            for dy in range(k):
                for dx in range(k):
                    tap = sv[:, dy : dy + h, dx : dx + w, :].astype(
                        jnp.float32)
                    acc = acc + tap * dww[dy, dx, :].astype(jnp.float32)
        else:
            w_full = 2 * w_out
            rows = sv.shape[1]
            wcols = sv.shape[2]
            pairs = sv.reshape(bn, rows // 2, 2, wcols, ep)
            acc_f = jnp.zeros((bn, h_out, w_full, ep), jnp.float32)
            for dy in range(k):
                r = pairs[:, dy // 2 : dy // 2 + h_out, dy % 2]
                for dx in range(k):
                    tap = r[:, :, dx : dx + w_full, :].astype(jnp.float32)
                    acc_f = acc_f + tap * dww[dy, dx, :].astype(jnp.float32)
            acc = acc_f.reshape(bn, h_out, w_out, 2, ep)[:, :, :, 0, :]

        y = _kact(acc + dwb[0].astype(jnp.float32), act)
        if se:
            y3 = y.reshape(bn, h_out * w_out, ep)
            gate = _se_gate(y3, sw1, sb1, sw2, sb2,
                            1.0 / float(h_out * w_out), prec)
            y = (y3 * gate[:, None, :]).reshape(bn, h_out, w_out, ep)

        y2 = y.astype(pww.dtype).reshape(bn * h_out * w_out, ep)
        out_f = _dot(y2, pww[...], prec) + pwb[0].astype(jnp.float32)
        if bi == nb - 1 and wop != w_out:
            # wpad final output (the dense kernel's trick): pad the width
            # to wop so the HBM-crossing ref tiles by 8 sublanes. The
            # residual joins AFTER the cast in the model dtype — the same
            # boundary semantics as every other block (the contract is
            # bit-identity with per-block whole-image mode). Mosaic
            # rejects narrow-dtype multi-dim reshapes, so the pad runs on
            # an f32 image of the cast value (model->f32->model is exact:
            # f32 is a superset of bf16).
            cout = out_f.shape[-1]
            out = out_f.astype(out_dtype)
            if sp["residual"]:
                out = out + cur
            out_f = jnp.pad(
                out.astype(jnp.float32).reshape(bn, h_out, w_out, cout),
                ((0, 0), (0, 0), (0, wop - w_out), (0, 0)),
            ).reshape(bn * h_out * wop, cout)
            cur = out_f.astype(out_dtype)
        else:
            out = out_f.astype(out_dtype)
            if sp["residual"]:
                # same boundary semantics as the per-block route: residual
                # joins AFTER the cast, in the model dtype
                out = out + cur
            cur = out
    o_ref[...] = cur


def v3_chain_pallas(
    x: jax.Array,  # (N, H, W, Cin) NHWC
    blocks,        # list of dicts: exp_w/exp_b/dw_w/dw_b/prj_w/prj_b
                   #   [se_w1/se_b1/se_w2/se_b2], k, stride, act, residual
    *,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Run `blocks` (≥2 consecutive V3 bottlenecks) as one Pallas launch.

    Bit-identical to calling pallas_ir_v3.v3_block_pallas per block in
    whole-image mode (the cast to the model dtype happens at every block
    boundary exactly where the per-block route crosses HBM). Gate calls
    with chain_fits."""
    if interpret is None:
        interpret = _should_interpret()
    n, h0, w0, cin0 = map(int, x.shape)
    itm = jnp.dtype(x.dtype).itemsize
    dt = x.dtype

    specs, args, in_specs = [], [], []
    h, w = h0, w0
    for b in blocks:
        cin = int(b["exp_w"].shape[0]) if b.get("exp_w") is not None else \
            int(b["dw_w"].shape[-1])
        if b.get("exp_w") is not None:
            exp_w, exp_b = b["exp_w"], b["exp_b"]
            act_exp = b["act"]
        else:
            exp_w = jnp.eye(cin, dtype=dt)
            exp_b = jnp.zeros((cin,), dt)
            act_exp = "linear"
        e = int(exp_w.shape[1])
        cout = int(b["prj_w"].shape[1])
        k, stride = int(b["k"]), int(b["stride"])
        se = 0 if b.get("se_w1") is None else int(b["se_w1"].shape[1])
        ep = _round_up(e, 128)
        dw_w = b["dw_w"].reshape(k, k, e)
        dw_b, prj_w, prj_b = b["dw_b"], b["prj_w"], b["prj_b"]
        sw1, sb1, sw2, sb2 = (b.get("se_w1"), b.get("se_b1"),
                              b.get("se_w2"), b.get("se_b2"))
        if ep != e:
            exp_w = jnp.pad(exp_w, ((0, 0), (0, ep - e)))
            exp_b = jnp.pad(exp_b, (0, ep - e))
            dw_w = jnp.pad(dw_w, ((0, 0), (0, 0), (0, ep - e)))
            dw_b = jnp.pad(dw_b, (0, ep - e))
            prj_w = jnp.pad(prj_w, ((0, ep - e), (0, 0)))
            if se:
                sw1 = jnp.pad(sw1, ((0, ep - e), (0, 0)))
                sw2 = jnp.pad(sw2, ((0, 0), (0, ep - e)))
                sb2 = jnp.pad(sb2, (0, ep - e))
        sp = dict(h=h, w=w, cin=cin, e=e, ep=ep, cout=cout, k=k,
                  stride=stride, se=se, act=str(b["act"]),
                  act_exp=str(act_exp), residual=bool(b["residual"]))
        if sp["residual"]:
            assert stride == 1 and cin == cout, (stride, cin, cout)
        specs.append(sp)
        blk_args = [exp_w, exp_b.reshape(1, ep), dw_w,
                    dw_b.reshape(1, ep), prj_w, prj_b.reshape(1, cout)]
        blk_shapes = [(cin, ep), (1, ep), (k, k, ep), (1, ep),
                      (ep, cout), (1, cout)]
        if se:
            blk_args += [sw1, sb1.reshape(1, se), sw2, sb2.reshape(1, ep)]
            blk_shapes += [(ep, se), (1, se), (se, ep), (1, ep)]
        for a, shp in zip(blk_args, blk_shapes):
            args.append(a)
            if len(shp) == 3:
                in_specs.append(pl.BlockSpec(
                    shp, lambda bidx: (0, 0, 0), memory_space=pltpu.VMEM))
            else:
                in_specs.append(pl.BlockSpec(
                    shp, lambda bidx: (0, 0), memory_space=pltpu.VMEM))
        h, w = -(-h // stride), -(-w // stride)
    h_f, w_f, cout_f = h, w, specs[-1]["cout"]
    _, _, wop = _out_geom(specs)

    assert chain_fits(n, specs, itm), "gate calls with chain_fits"
    if block_n:
        # Clamp to n FIRST: the divisor search only terminates for bn <= n
        # (n % bn == n, truthy forever, once bn > n).
        bn = min(max(int(block_n), _bn_floor(n, specs)), n)
        while n % bn:
            bn += 1
    else:
        bn = _pick_bn_chain(n, specs, itm)

    kernel = functools.partial(_chain_kernel, bn=bn, specs=specs,
                               wop=wop, out_dtype=dt)
    scratch = []
    for sp in specs:
        pr = _scratch_pad(sp["k"], sp["stride"], sp["h"])
        pc = _scratch_pad(sp["k"], sp["stride"], sp["w"])
        scratch.append(pltpu.VMEM(
            (bn, sp["h"] + pr, sp["w"] + pc, sp["ep"]), dt))

    out = pl.pallas_call(
        kernel,
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((bn * h0 * w0, cin0), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)] + in_specs,
        out_specs=pl.BlockSpec((bn * h_f * wop, cout_f), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * h_f * wop, cout_f), dt),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x.reshape(n * h0 * w0, cin0), *args)
    out = out.reshape(n, h_f, wop, cout_f)
    return out[:, :, :w_f, :] if wop != w_f else out
