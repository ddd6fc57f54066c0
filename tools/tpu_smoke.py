"""hw-tier validation: run every Pallas kernel family on the REAL TPU and
check against the oracles (the rebuild's analog of the reference's `hw` run,
SURVEY.md SS4). Exits nonzero on any failure.

Usage: python tools/tpu_smoke.py [--quick] [--only SUBSTR]

The full run needs >10 min of remote compiles; `--only` filters check names
(substring match) so sections can run in chunks.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main(quick: bool = False, only: str = ""):
    assert jax.default_backend() == "tpu", jax.default_backend()
    print("device:", jax.devices(), flush=True)
    failures = []
    n_checks = [0]

    def want(section):
        # match either direction so both the short section tag and the full
        # printed check name work as --only values
        return only in section or section in only

    def rng_for(section):
        # per-section generator (stable seed — Python hash() is randomized):
        # chunked --only runs see the same inputs as a full run, so recorded
        # results reproduce under any chunking
        import zlib

        return np.random.default_rng(zlib.crc32(section.encode()))

    def check(name, got, ref, tol):
        n_checks[0] += 1
        err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32)).max()
        ok = err <= tol
        print(f"[{'OK ' if ok else 'FAIL'}] {name}: max_err={err:.2e}", flush=True)
        if not ok:
            failures.append(name)

    from mobilenet_tpu.oracle import numpy_ref
    from mobilenet_tpu.ops.conv import depthwise_conv_xla
    from mobilenet_tpu.ops.pallas_dw import depthwise_conv_pallas
    from mobilenet_tpu.ops.pallas_block import separable_block_pallas
    from mobilenet_tpu.ops.pallas_block_packed import (
        pack, separable_block_packed, unpack,
    )

    # --- standalone dw kernel (fp32, exact vs XLA) -------------------------
    shapes = [(112, 32, 1), (112, 64, 2), (14, 512, 1), (7, 1024, 1)]
    if quick:
        shapes = shapes[:2]
    rng = rng_for("pallas_dw")
    for h, c, s in shapes if want("pallas_dw") else []:
        x = jnp.asarray(rng.uniform(-2, 2, (2, h, h, c)), jnp.float32)
        w = jnp.asarray(rng.normal(0, 0.5, (3, 3, 1, c)), jnp.float32)
        b = jnp.asarray(rng.normal(0, 0.2, (c,)), jnp.float32)
        check(f"pallas_dw h={h} c={c} s={s}",
              depthwise_conv_pallas(x, w, s, b, True),
              depthwise_conv_xla(x, w, s, b, True), 0.0)

    # --- fused block (fp32 vs oracle) --------------------------------------
    rng = rng_for("fused_block")
    for (h, cin, cout, s) in ([(56, 128, 128, 1), (28, 256, 512, 2), (7, 1024, 1024, 1)]
                              if want("fused_block") else []):
        x = rng.uniform(-1, 1, (2, h, h, cin)).astype(np.float32)
        dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
        dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
        pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
        pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
        ref = numpy_ref.pointwise_ref(
            numpy_ref.depthwise_ref(x, dw_w, s, dw_b, True), pw_w, pw_b, True)
        got = separable_block_pallas(
            jnp.asarray(x), jnp.asarray(dw_w), jnp.asarray(dw_b),
            jnp.asarray(pw_w), jnp.asarray(pw_b), s, True)
        check(f"fused_block h={h} {cin}->{cout} s={s}", got, ref, 3e-5)

    # --- fused block partial mode (pw_epilogue=False; the TP contract) -----
    # Interpret mode accepts layouts Mosaic rejects on hw (round-2 lesson),
    # so the f32-out partial path gets its own hw check: raw partial + the
    # epilogue applied OUTSIDE must equal the fused result.
    rng = rng_for("tp_partial")
    for (h, cin, cout, s) in ([(56, 128, 128, 1), (28, 256, 512, 2)]
                              if want("tp_partial") else []):
        x = rng.uniform(-1, 1, (2, h, h, cin)).astype(np.float32)
        dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
        dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
        pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
        pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
        args_ = (jnp.asarray(x), jnp.asarray(dw_w), jnp.asarray(dw_b),
                 jnp.asarray(pw_w), jnp.asarray(pw_b), s, True)
        fused = separable_block_pallas(*args_)
        raw = separable_block_pallas(*args_, pw_epilogue=False)
        assert raw.dtype == jnp.float32, raw.dtype
        outside = np.clip(np.asarray(raw) + pw_b, 0.0, 6.0)
        check(f"tp_partial h={h} {cin}->{cout} s={s}", outside, fused, 3e-5)

    # --- fused inverted-residual block (V2; fp32 vs oracle) ----------------
    # The Mosaic-alignment design (2D in/out, expanded dim padded in VMEM)
    # only proves itself on hw — interpret mode accepts casts Mosaic
    # rejects (round-2 lesson), and these are exactly V2's unaligned
    # channel widths, including the 960 that killed the dw+prj route.
    from mobilenet_tpu.ops.pallas_ir_block import inverted_residual_pallas

    rng = rng_for("ir_block")
    # Shapes must be FEASIBLE at f32 (itemsize 4) and n=8 — (14,...,s2) and
    # (7,...) force bn=8 by the %8 sublane rule and bust the whole-image
    # cap, which would crash the smoke at the ir_fits assert (round-3
    # review finding); 16/8-spatial keep bn=1 legal.
    ir_shapes = [(14, 64, 384, 64, 1, True), (16, 96, 576, 160, 2, False),
                 (8, 160, 960, 320, 1, False), (28, 24, 144, 32, 2, False)]
    if quick:
        ir_shapes = ir_shapes[:2]
    for (h, cin, e, cout, s, res) in ir_shapes if want("ir_block") else []:
        x = rng.uniform(-1, 1, (8, h, h, cin)).astype(np.float32)
        ew = (rng.normal(0, 1, (cin, e)) * cin ** -0.5).astype(np.float32)
        eb = rng.normal(0, 0.1, (e,)).astype(np.float32)
        dw_w = rng.normal(0, 0.3, (3, 3, 1, e)).astype(np.float32)
        dw_b = rng.normal(0, 0.1, (e,)).astype(np.float32)
        pw_w = (rng.normal(0, 1, (e, cout)) * e ** -0.5).astype(np.float32)
        pw_b = rng.normal(0, 0.1, (cout,)).astype(np.float32)
        ref = numpy_ref.pointwise_ref(
            numpy_ref.depthwise_ref(
                numpy_ref.pointwise_ref(x, ew, eb, True), dw_w, s, dw_b, True),
            pw_w, pw_b, None)
        if res:
            ref = ref + x
        got = inverted_residual_pallas(
            jnp.asarray(x), jnp.asarray(ew), jnp.asarray(eb),
            jnp.asarray(dw_w), jnp.asarray(dw_b),
            jnp.asarray(pw_w), jnp.asarray(pw_b), s, res)
        check(f"ir_block h={h} {cin}->{e}->{cout} s={s} res={res}",
              got, ref, 3e-5)

    # --- fused INT8 inverted-residual block (exactness is the contract) ----
    # The int8 IR kernel composes only hw-proven idioms (s8 MXU dots after
    # f32->i8 casts, bf16-carried integer scratch, f32 requant) but their
    # COMPOSITION is new — and int8 demands EXACT equality, so tol=0.
    from mobilenet_tpu.quant.oracle import dw3x3_i8 as _dw_i8
    from mobilenet_tpu.quant.oracle import pw_i8 as _pw_i8
    from mobilenet_tpu.quant.pallas_ir_i8 import inverted_residual_pallas_i8
    from mobilenet_tpu.quant.quantize import ACT_HIDDEN_SCALE, _quant_layer
    from mobilenet_tpu.quant.v2 import _res_add, pw_i8_linear

    rng = rng_for("ir_i8")
    # (n, h, cin, e, cout, stride, res): whole-image shapes at n=8 (incl.
    # stride 2 and the 960-wide tail) AND the row-tiled shapes at small n
    # (112/56-squared — int8 4D element windows + bf16 halo placement, the
    # riskiest new hw geometry; all verified feasible via ir_i8_fits).
    i8_shapes = [(8, 14, 64, 384, 64, 1, True),
                 (8, 16, 96, 576, 160, 2, False),
                 (8, 8, 160, 960, 160, 1, True),
                 (2, 112, 16, 96, 24, 2, False),     # rows: s2 halo
                 (2, 56, 24, 144, 24, 1, True)]      # rows: residual tiles
    if quick:
        i8_shapes = i8_shapes[:2] + i8_shapes[3:4]
    for (n_, h, cin, e, cout, s, res) in i8_shapes if want("ir_i8") else []:
        s_out = np.float32(0.05)
        qe = _quant_layer(
            (rng.normal(0, 1, (cin, e)) * cin ** -0.5).astype(np.float32),
            rng.normal(0, 0.1, (e,)).astype(np.float32), out_axis=1,
            s_in=s_out, s_out=ACT_HIDDEN_SCALE)
        qd = _quant_layer(
            rng.normal(0, 0.3, (3, 3, 1, e)).astype(np.float32),
            rng.normal(0, 0.1, (e,)).astype(np.float32), out_axis=3,
            s_in=ACT_HIDDEN_SCALE, s_out=ACT_HIDDEN_SCALE,
            f32_bias_bound=True)
        qp = _quant_layer(
            (rng.normal(0, 1, (e, cout)) * e ** -0.5).astype(np.float32),
            rng.normal(0, 0.1, (cout,)).astype(np.float32), out_axis=1,
            s_in=ACT_HIDDEN_SCALE, s_out=s_out)
        x_i8 = rng.integers(-100, 101, (n_, h, h, cin)).astype(np.int8)
        z = _pw_i8(x_i8, qe.w_i8, qe.bias_i32, qe.m, qe.six_q, True)
        z = _dw_i8(z, qd.w_i8, qd.bias_i32, qd.m, qd.six_q, s, True)
        ref = pw_i8_linear(z, qp.w_i8, qp.bias_i32, qp.m)
        if res:
            ref = _res_add(ref, x_i8)
        got = inverted_residual_pallas_i8(
            jnp.asarray(x_i8), jnp.asarray(qe.w_i8),
            jnp.asarray(qe.bias_i32), qe.m, float(qe.six_q),
            jnp.asarray(qd.w_i8), jnp.asarray(qd.bias_i32), qd.m,
            float(qd.six_q), jnp.asarray(qp.w_i8), jnp.asarray(qp.bias_i32),
            qp.m, s, res)
        check(f"ir_i8 h={h} {cin}->{e}->{cout} s={s} res={res}",
              np.asarray(got).astype(np.float32), ref.astype(np.float32),
              0.0)

    # --- fused V3 bottleneck (k5 stencils, hswish, SE in-kernel) -----------
    # The three generalizations beyond ir_block each carry hw-only risk:
    # the 5-tap full-width gather geometry, the in-kernel (BN,HW,Ep)
    # reduction feeding the SE matmuls, and the (Ep,Se)/(Se,Ep) matmuls at
    # unaligned Se widths — interpret mode proves none of them on Mosaic.
    from mobilenet_tpu.ops.pallas_ir_v3 import v3_block_pallas

    rng = rng_for("v3_block")
    v3_shapes = [  # (h, cin, e, cout, k, s, se_mid, act, res)
        (28, 24, 72, 40, 5, 2, 24, "relu", False),      # blk3-L class
        (14, 40, 120, 40, 5, 1, 32, "relu", True),      # SE + residual
        (8, 160, 960, 160, 5, 1, 240, "hswish", True),  # widest tail + SE
        (14, 80, 184, 80, 3, 1, 0, "hswish", True),     # k3 hswish, no SE
    ]
    if quick:
        v3_shapes = v3_shapes[:2]
    for (h, cin, e, cout, k, s, se_mid, act, res) in (
            v3_shapes if want("v3_block") else []):
        x = rng.uniform(-1, 1, (8, h, h, cin)).astype(np.float32)
        ew = (rng.normal(0, 1, (cin, e)) * cin ** -0.5).astype(np.float32)
        eb = rng.normal(0, 0.1, (e,)).astype(np.float32)
        dw_w = rng.normal(0, 0.3, (k, k, 1, e)).astype(np.float32)
        dw_b = rng.normal(0, 0.1, (e,)).astype(np.float32)
        pw_w = (rng.normal(0, 1, (e, cout)) * e ** -0.5).astype(np.float32)
        pw_b = rng.normal(0, 0.1, (cout,)).astype(np.float32)
        se_kw, se_d = {}, None
        if se_mid:
            se_d = dict(
                w1=(rng.normal(0, 1, (e, se_mid)) * e ** -0.5).astype(
                    np.float32),
                b1=rng.normal(0, 0.1, (se_mid,)).astype(np.float32),
                w2=(rng.normal(0, 1, (se_mid, e)) * se_mid ** -0.5).astype(
                    np.float32),
                b2=rng.normal(0, 0.1, (e,)).astype(np.float32))
            se_kw = dict(se_w1=jnp.asarray(se_d["w1"]),
                         se_b1=jnp.asarray(se_d["b1"]),
                         se_w2=jnp.asarray(se_d["w2"]),
                         se_b2=jnp.asarray(se_d["b2"]))
        z = numpy_ref.depthwise_ref_any(
            numpy_ref.pointwise_ref_any(x, ew, eb, act), dw_w, s, dw_b, act)
        if se_d is not None:
            z = numpy_ref.se_ref(z, se_d)
        ref = numpy_ref.pointwise_ref_any(z, pw_w, pw_b, None)
        if res:
            ref = ref + x
        got = v3_block_pallas(
            jnp.asarray(x), jnp.asarray(ew), jnp.asarray(eb),
            jnp.asarray(dw_w), jnp.asarray(dw_b), jnp.asarray(pw_w),
            jnp.asarray(pw_b), k=k, stride=s, act=act, residual=res,
            **se_kw)
        check(f"v3_block h={h} {cin}->{e}->{cout} k={k} s={s} se={se_mid}",
              got, ref, 3e-5)

    # --- fused INT8 V3 bottleneck (named-act requant + quantized SE) -------
    # tol=0: the kernel and the quant/v3 oracle are one integer program.
    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.quant.quantize import quantize_input
    from mobilenet_tpu.quant.v3 import (_as_device_tree_v3, forward_v3_i8,
                                        quantize_v3)

    rng = rng_for("ir_v3_i8")
    v3q_variants = ["small"] if quick else ["small", "large"]
    for v3q_var in (v3q_variants if want("ir_v3_i8") else []):
        v3q_cfg = V3Config(variant=v3q_var, alpha=1.0, resolution=96)
        v3q_folded = fold_bn_v3(init_params_v3(v3q_cfg, seed=0),
                                eps=v3q_cfg.bn_eps)
        v3q_dev = _as_device_tree_v3(quantize_v3(v3q_folded, v3q_cfg,
                                                 n_calib=8))
        x_i8 = jnp.asarray(quantize_input(
            rng.uniform(-1, 1, (4, 96, 96, 3)).astype(np.float32)))
        lx = np.asarray(forward_v3_i8(v3q_dev, x_i8, v3q_cfg))
        lf = np.asarray(forward_v3_i8(v3q_dev, x_i8, v3q_cfg,
                                      use_fused=True))
        check(f"ir_v3_i8 v3{v3q_var}-96 logits fused==xla", lf, lx, 0.0)

    # --- packed fused block ------------------------------------------------
    rng = rng_for("packed_block")
    for (h, cin, cout) in [(112, 32, 64), (16, 8, 16)] if want("packed_block") else []:
        x = rng.uniform(-1, 1, (2, h, h, cin)).astype(np.float32)
        dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
        dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
        pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
        pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
        ref = numpy_ref.pointwise_ref(
            numpy_ref.depthwise_ref(x, dw_w, 1, dw_b, True), pw_w, pw_b, True)
        got = unpack(separable_block_packed(
            pack(jnp.asarray(x), cin), jnp.asarray(dw_w), jnp.asarray(dw_b),
            jnp.asarray(pw_w), jnp.asarray(pw_b), cin, cout, True), cout)
        check(f"packed_block h={h} {cin}->{cout}", got, ref, 3e-5)

    # --- packed stride-2 block ----------------------------------------------
    from mobilenet_tpu.ops.pallas_block_packed import separable_block_packed_s2, unpack

    rng = rng_for("packed_s2")
    for (h, cin, cout) in ([(112, 64, 128), (32, 32, 64)]
                           if want("packed_s2") else []):
        x = rng.uniform(-1, 1, (2, h, h, cin)).astype(np.float32)
        dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
        dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
        pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
        pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
        ref = numpy_ref.pointwise_ref(
            numpy_ref.depthwise_ref(x, dw_w, 2, dw_b, True), pw_w, pw_b, True)
        got = unpack(separable_block_packed_s2(
            pack(jnp.asarray(x), cin), jnp.asarray(dw_w), jnp.asarray(dw_b),
            jnp.asarray(pw_w), jnp.asarray(pw_b), cin, cout, True), cout)
        check(f"packed_s2_block h={h} {cin}->{cout}", got, ref, 3e-5)

    # --- MXU-matmul depthwise packed blocks (experimental, default-off) -----
    from mobilenet_tpu.ops.pallas_block_packed_mxu import (
        separable_block_packed_mxu,
    )

    rng = rng_for("packed_mxu")
    for (h, cin, cout, s) in ([(112, 32, 64, 1), (112, 64, 128, 2)]
                              if want("packed_mxu") else []):
        x = rng.uniform(-1, 1, (2, h, h, cin)).astype(np.float32)
        dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
        dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
        pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
        pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
        ref = numpy_ref.pointwise_ref(
            numpy_ref.depthwise_ref(x, dw_w, s, dw_b, True), pw_w, pw_b, True)
        got = unpack(separable_block_packed_mxu(
            pack(jnp.asarray(x), cin), jnp.asarray(dw_w), jnp.asarray(dw_b),
            jnp.asarray(pw_w), jnp.asarray(pw_b), cin, cout, s, True), cout)
        check(f"packed_mxu h={h} {cin}->{cout} s={s}", got, ref, 3e-5)

    # --- systolic chain kernel (K pipelined blocks, default-off) ------------
    from mobilenet_tpu.ops.pallas_chain_systolic import chain_systolic

    rng = rng_for("chain_sys")
    chain_shapes = [(4, 14, 512, 5), (6, 7, 256, 4)]
    if quick:
        chain_shapes = chain_shapes[:1]
    for (n, h, c, k) in (chain_shapes if want("chain_sys") else []):
        x = rng.uniform(-1, 1, (n, h, h, c)).astype(np.float32)
        dw_ws = rng.normal(0, 0.4, (k, 3, 3, c)).astype(np.float32)
        dw_bs = rng.normal(0, 0.2, (k, c)).astype(np.float32)
        pw_ws = (rng.normal(0, 1.0, (k, c, c)) / np.sqrt(c)).astype(np.float32)
        pw_bs = rng.normal(0, 0.2, (k, c)).astype(np.float32)
        ref = x
        for kk in range(k):
            ref = numpy_ref.pointwise_ref(
                numpy_ref.depthwise_ref(ref, dw_ws[kk].reshape(3, 3, 1, c), 1,
                                        dw_bs[kk], True),
                pw_ws[kk], pw_bs[kk], True)
        got = chain_systolic(
            jnp.asarray(x), jnp.asarray(dw_ws), jnp.asarray(dw_bs),
            jnp.asarray(pw_ws), jnp.asarray(pw_bs), True)
        check(f"chain_sys n={n} h={h} c={c} k={k}", got, ref, 1e-4)

    # --- stem+block0 mega-kernel (normalize+conv1+dw+pw in one call) --------
    from mobilenet_tpu.ops.pallas_stem_b0 import stem_block0_fused

    # fp32 fuses only up to 160 (whole-image VMEM; bf16-224 is the routed
    # throughput case, validated by the e2e bench + probe compiles).
    rng = rng_for("stem_b0")
    for (h, cout) in [(160, 64), (128, 64)] if want("stem_b0") else []:
        img = rng.integers(0, 256, (2, h, h, 3), dtype=np.uint8)
        sw = rng.normal(0, 0.3, (3, 3, 3, 32)).astype(np.float32)
        sb = rng.normal(0, 0.1, (32,)).astype(np.float32)
        dw_w = rng.normal(0, 0.5, (3, 3, 1, 32)).astype(np.float32)
        dw_b = rng.normal(0, 0.2, (32,)).astype(np.float32)
        pw_w = rng.normal(0, 0.3, (32, cout)).astype(np.float32)
        pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
        xf = numpy_ref.preprocess_ref(img)
        ref = numpy_ref.pointwise_ref(
            numpy_ref.depthwise_ref(
                numpy_ref.conv2d_ref(xf, sw, 2, sb, True), dw_w, 1, dw_b, True),
            pw_w, pw_b, True)
        got = unpack(stem_block0_fused(
            jnp.asarray(img), jnp.asarray(sw), jnp.asarray(sb),
            jnp.asarray(dw_w), jnp.asarray(dw_b),
            jnp.asarray(pw_w), jnp.asarray(pw_b), cout, True), cout)
        check(f"stem_b0_mega h={h} 3->32->{cout}", got, ref, 3e-5)

    # --- int8 fused block (EXACT) -------------------------------------------
    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params
    from mobilenet_tpu.quant import oracle as qoracle, quantize
    from mobilenet_tpu.quant.pallas_block_i8 import separable_block_i8

    if want("i8_fused"):
        rng = rng_for("i8_fused")
        cfg = ModelConfig(alpha=0.25, resolution=128)
        q = quantize(fold_bn(init_params(cfg, 5), eps=cfg.bn_eps), cfg)
    for bi, stride in ((3, 2), (4, 1)) if want("i8_fused") else ():
        d, p = q.blocks[bi]["dw"], q.blocks[bi]["pw"]
        c = d.w_i8.shape[-1]
        xi = rng.integers(-127, 128, (2, 16, 16, c)).astype(np.int8)
        mid = qoracle.dw3x3_i8(xi, d.w_i8, d.bias_i32, d.m, d.six_q, stride)
        ref = qoracle.pw_i8(mid, p.w_i8, p.bias_i32, p.m, p.six_q)
        got = separable_block_i8(
            jnp.asarray(xi), jnp.asarray(d.w_i8), jnp.asarray(d.bias_i32),
            jnp.asarray(d.m), jnp.asarray(p.w_i8), jnp.asarray(p.bias_i32),
            jnp.asarray(p.m), stride, float(d.six_q), float(p.six_q), True)
        n_checks[0] += 1
        exact = np.array_equal(np.asarray(got), ref)
        print(f"[{'OK ' if exact else 'FAIL'}] i8_fused_block b{bi} s={stride}: "
              f"{'exact' if exact else 'MISMATCH'}", flush=True)
        if not exact:
            failures.append(f"i8_fused b{bi}")

    # non-multiple-of-128 dense s2 (alpha=0.75 cin=192): the mxu_subsample
    # lane-merge is illegal there and must gate off — Mosaic rejected the
    # shape cast on hw while interpret mode accepted it (regression check).
    if want("i8_fused"):
        c192 = 192
        xi = rng.integers(-127, 128, (2, 16, 16, c192)).astype(np.int8)
        w = rng.integers(-64, 64, (3, 3, 1, c192)).astype(np.int8)
        b = rng.integers(-5000, 5000, (c192,)).astype(np.int32)
        mm = rng.uniform(0.001, 0.01, (c192,)).astype(np.float32)
        pw = rng.integers(-64, 64, (c192, 128)).astype(np.int8)
        pb = rng.integers(-5000, 5000, (128,)).astype(np.int32)
        pm = rng.uniform(0.001, 0.01, (128,)).astype(np.float32)
        mid = qoracle.dw3x3_i8(xi, w, b, mm, np.float32(127.0), 2)
        ref = qoracle.pw_i8(mid, pw, pb, pm, np.float32(127.0))
        got = separable_block_i8(
            jnp.asarray(xi), jnp.asarray(w), jnp.asarray(b), jnp.asarray(mm),
            jnp.asarray(pw), jnp.asarray(pb), jnp.asarray(pm), 2, 127.0,
            127.0, True)
        n_checks[0] += 1
        exact = np.array_equal(np.asarray(got), ref)
        print(f"[{'OK ' if exact else 'FAIL'}] i8_fused_block c192 s=2: "
              f"{'exact' if exact else 'MISMATCH'}", flush=True)
        if not exact:
            failures.append("i8_fused c192")

    # --- packed int8 blocks (EXACT; covers the f32-tap rewrite) -------------
    if want("i8_packed"):
        rng = rng_for("i8_packed")
        from mobilenet_tpu.ops.pallas_block_packed import pack as _pack, unpack as _unpack
        from mobilenet_tpu.quant.pallas_block_packed_i8 import separable_block_packed_i8

        cfgp = ModelConfig(alpha=1.0, resolution=224)
        qp = quantize(fold_bn(init_params(cfgp, 3), eps=cfgp.bn_eps), cfgp)
        for bi, stride, h in ((0, 1, 112), (1, 2, 112)):
            d, p = qp.blocks[bi]["dw"], qp.blocks[bi]["pw"]
            c = d.w_i8.shape[-1]
            xi = rng.integers(-127, 128, (2, h, h, c)).astype(np.int8)
            mid = qoracle.dw3x3_i8(xi, d.w_i8, d.bias_i32, d.m, d.six_q, stride)
            ref = qoracle.pw_i8(mid, p.w_i8, p.bias_i32, p.m, p.six_q)
            cout = p.w_i8.shape[1]
            got = _unpack(separable_block_packed_i8(
                _pack(jnp.asarray(xi), c), jnp.asarray(d.w_i8),
                jnp.asarray(d.bias_i32), jnp.asarray(d.m), jnp.asarray(p.w_i8),
                jnp.asarray(p.bias_i32), jnp.asarray(p.m), c, cout, stride,
                float(d.six_q), float(p.six_q), True), cout)
            n_checks[0] += 1
            exact = np.array_equal(np.asarray(got), ref)
            print(f"[{'OK ' if exact else 'FAIL'}] i8_packed_block b{bi} s={stride}: "
                  f"{'exact' if exact else 'MISMATCH'}", flush=True)
            if not exact:
                failures.append(f"i8_packed b{bi}")

    # --- MXU-dw packed int8 blocks (EXACT; experimental, default-off) -------
    if want("i8_packed_mxu"):
        rng = rng_for("i8_packed_mxu")
        from mobilenet_tpu.ops.pallas_block_packed import pack as _pack, unpack as _unpack
        from mobilenet_tpu.ops.pallas_block_packed_mxu import (
            separable_block_packed_i8_mxu,
        )

        cfgp = ModelConfig(alpha=1.0, resolution=224)
        qp = quantize(fold_bn(init_params(cfgp, 3), eps=cfgp.bn_eps), cfgp)
        for bi, stride, h in ((0, 1, 112), (1, 2, 112)):
            d, p = qp.blocks[bi]["dw"], qp.blocks[bi]["pw"]
            c = d.w_i8.shape[-1]
            xi = rng.integers(-127, 128, (2, h, h, c)).astype(np.int8)
            mid = qoracle.dw3x3_i8(xi, d.w_i8, d.bias_i32, d.m, d.six_q, stride)
            ref = qoracle.pw_i8(mid, p.w_i8, p.bias_i32, p.m, p.six_q)
            cout = p.w_i8.shape[1]
            got = _unpack(separable_block_packed_i8_mxu(
                _pack(jnp.asarray(xi), c), jnp.asarray(d.w_i8),
                jnp.asarray(d.bias_i32), jnp.asarray(d.m), jnp.asarray(p.w_i8),
                jnp.asarray(p.bias_i32), jnp.asarray(p.m), c, cout, stride,
                float(d.six_q), float(p.six_q), True), cout)
            n_checks[0] += 1
            exact = np.array_equal(np.asarray(got), ref)
            print(f"[{'OK ' if exact else 'FAIL'}] i8_packed_mxu b{bi} s={stride}: "
                  f"{'exact' if exact else 'MISMATCH'}", flush=True)
            if not exact:
                failures.append(f"i8_packed_mxu b{bi}")

    # --- int8 XLA-fallback dw (EXACT; XLA grouped conv was NOT bit-reliable
    # on TPU — this guards the explicit-tap replacement, docs/design.md) ----
    if want("i8_dw_xla"):
        rng = rng_for("i8_dw_xla")
        from mobilenet_tpu.quant import ops as qops2

        for stride, h, c in ((1, 16, 8), (2, 16, 8), (1, 28, 256)):
            xi = rng.integers(-127, 128, (2, h, h, c)).astype(np.int8)
            w = rng.integers(-127, 128, (3, 3, 1, c)).astype(np.int8)
            b = rng.integers(-5000, 5000, (c,)).astype(np.int32)
            m = rng.uniform(0.001, 0.01, (c,)).astype(np.float32)
            ref = qoracle.dw3x3_i8(xi, w, b, m, np.float32(127.0), stride)
            got = np.asarray(qops2.depthwise_i8_xla(
                jnp.asarray(xi), jnp.asarray(w), jnp.asarray(b), jnp.asarray(m),
                127.0, stride, True))
            n_checks[0] += 1
            exact = np.array_equal(got, ref)
            print(f"[{'OK ' if exact else 'FAIL'}] i8_dw_xla s={stride} c={c}: "
                  f"{'exact' if exact else 'MISMATCH'}", flush=True)
            if not exact:
                failures.append(f"i8_dw_xla s{stride}c{c}")

    # --- int8 input quantization into bf16 (EXACT on chip) ------------------
    # The production stem path quantizes straight into bf16 integer values;
    # validate on hw that (a) the integers match the i8 store and (b) the
    # full fused forward is bit-identical from either input.
    if want("i8_input_bf16"):
        rng = rng_for("i8_input_bf16")
        from mobilenet_tpu.ops import preprocess as prep
        from mobilenet_tpu.quant import ops as qops3
        from mobilenet_tpu.quant.model import (_as_device_tree, forward_i8,
                                               quantize_for_device)
        from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

        cfgq = ModelConfig(alpha=1.0, resolution=224)
        devq = _as_device_tree(quantize_for_device(
            fold_bn(init_params(cfgq, 3), eps=cfgq.bn_eps), cfgq))
        u8 = jnp.asarray(rng.integers(0, 256, (8, 224, 224, 3), dtype=np.uint8))

        def q_fn(u8, dt):
            return qops3.quantize_input_dev(
                prep.preprocess(u8, cfgq.resolution, jnp.float32),
                ACT_IN_SCALE, out_dtype=dt)

        q_i8 = np.asarray(jax.jit(lambda v: q_fn(v, jnp.int8))(u8), np.float32)
        q_bf = np.asarray(jax.jit(lambda v: q_fn(v, jnp.bfloat16))(u8), np.float32)
        n_checks[0] += 1
        ok_q = np.array_equal(q_i8, q_bf)
        print(f"[{'OK ' if ok_q else 'FAIL'}] i8_input_bf16 quantize: "
              f"{'exact' if ok_q else 'MISMATCH'}", flush=True)
        if not ok_q:
            failures.append("i8_input_bf16 quantize")

        f_i8 = np.asarray(jax.jit(lambda v: forward_i8(
            devq, q_fn(v, jnp.int8), cfgq, use_fused=True))(u8))
        f_bf = np.asarray(jax.jit(lambda v: forward_i8(
            devq, q_fn(v, jnp.bfloat16), cfgq, use_fused=True))(u8))
        n_checks[0] += 1
        ok_f = np.array_equal(f_i8, f_bf)
        print(f"[{'OK ' if ok_f else 'FAIL'}] i8_input_bf16 forward: "
              f"{'exact' if ok_f else 'MISMATCH'}", flush=True)
        if not ok_f:
            failures.append("i8_input_bf16 forward")

    # --- lane-packed SE stride-2 int8 kernel (EXACT; V3-Small b0 route) -----
    if want("i8_se_s2"):
        rng = rng_for("i8_se_s2")
        from mobilenet_tpu.ops.pallas_block_packed import pack as _pack
        from mobilenet_tpu.quant.pallas_block_packed_i8 import (
            packed_block_i8_named_s2_se)
        from mobilenet_tpu.quant.v3 import (_dwk_acc_np, _pw_acc_np,
                                            _quant_named, _requant_named_np,
                                            _se_i8_np)

        for h, cin, se_m, cout in ([(24, 16, 8, 16)] if quick
                                   else [(24, 16, 8, 16), (112, 16, 8, 16)]):
            sc = np.float32(0.04)
            qd = _quant_named(rng.normal(0, 0.3, (3, 3, 1, cin)).astype(
                np.float32), rng.normal(0, 0.1, (cin,)).astype(np.float32),
                3, sc, sc, k_taps=9)
            q1 = _quant_named(rng.normal(0, cin ** -0.5, (cin, se_m)).astype(
                np.float32), rng.normal(0, 0.1, (se_m,)).astype(np.float32),
                1, sc, sc)
            q2 = _quant_named(rng.normal(0, se_m ** -0.5, (se_m, cin)).astype(
                np.float32), rng.normal(0, 0.1, (cin,)).astype(np.float32),
                1, sc, sc)
            qp2 = _quant_named(rng.normal(0, cin ** -0.5, (cin, cout)).astype(
                np.float32), rng.normal(0, 0.1, (cout,)).astype(np.float32),
                1, sc, sc)
            xi = rng.integers(-100, 101, (2, h, h, cin)).astype(np.int8)
            z = _requant_named_np(_dwk_acc_np(xi, qd.w_i8, 2, 3)
                                  + qd.bias_i32, qd.a, qd.inv_s, "relu")
            z = _se_i8_np(z, q1, q2)
            ref = _requant_named_np(_pw_acc_np(z, qp2.w_i8) + qp2.bias_i32,
                                    qp2.a, qp2.inv_s, "linear")
            r = 128 // cin
            cm = 128 // (r // 2)
            cout_p = -(-cout // cm) * cm
            got = np.asarray(packed_block_i8_named_s2_se(
                _pack(jnp.asarray(xi).astype(jnp.bfloat16), cin),
                jnp.asarray(qd.w_i8), jnp.asarray(qd.bias_i32),
                jnp.asarray(qd.a),
                jnp.asarray(q1.w_i8), jnp.asarray(q1.bias_i32),
                jnp.asarray(q1.a),
                jnp.asarray(q2.w_i8), jnp.asarray(q2.bias_i32),
                jnp.asarray(q2.a),
                jnp.asarray(np.pad(qp2.w_i8, ((0, 0), (0, cout_p - cout)))),
                jnp.asarray(np.pad(qp2.bias_i32, (0, cout_p - cout))),
                jnp.asarray(np.pad(qp2.a, (0, cout_p - cout))),
                cin, cout_p, "relu", float(qd.inv_s), float(q1.inv_s),
                float(qp2.inv_s), out_dtype="int8"), np.float32)
            got = got.reshape(2, h // 2, -1, cout_p)[..., :cout]
            n_checks[0] += 1
            exact = np.array_equal(got, ref.astype(np.float32))
            print(f"[{'OK ' if exact else 'FAIL'}] i8_se_s2 h={h}: "
                  f"{'exact' if exact else 'MISMATCH'}", flush=True)
            if not exact:
                failures.append(f"i8_se_s2 h{h}")

    # --- whole-net int8 fused-vs-xla over MANY batches (EXACT) --------------
    # Single-seed logits checks pass by luck against data-dependent rounding
    # divergences (the i8_se_s2 pooled-sum bug above survived one): drive
    # both routings with several independent batches per family.
    if want("i8_net_fused") and not quick:
        rng = rng_for("i8_net_fused")
        from mobilenet_tpu.quant import ops as qops4
        from mobilenet_tpu.quant.quantize import ACT_IN_SCALE as _AIS

        # VERDICT r4 #5: the recorded sweep rows ship at batch 256, so the
        # EXACT fused-vs-xla net gate must run at the shipping batch too
        # (kernel plans vary with batch). SMOKE_I8_NET_BATCH=256 runs the
        # shipping-scale arm (fewer repeat batches — same total pixels).
        nb = int(os.environ.get("SMOKE_I8_NET_BATCH", "16"))
        reps = max(1, 64 // nb)

        def net_pair(label, make):
            fx, ff = make()
            bad_total = 0
            for b in range(reps):
                x = rng.uniform(-1, 1, (nb, 224, 224, 3)).astype(np.float32)
                xq = qops4.quantize_input_dev(jnp.asarray(x), _AIS,
                                              out_dtype=jnp.bfloat16)
                bad_total += int((np.asarray(fx(xq))
                                  != np.asarray(ff(xq))).sum())
            n_checks[0] += 1
            ok_n = bad_total == 0
            print(f"[{'OK ' if ok_n else 'FAIL'}] i8_net_fused {label} "
                  f"b{nb}: "
                  f"{f'exact x{reps} batches' if ok_n else f'{bad_total} diffs'}",
                  flush=True)
            if not ok_n:
                failures.append(f"i8_net_fused {label}")

        def mk_v3small():
            from mobilenet_tpu.checkpoints.v3 import (fold_bn_v3,
                                                      init_params_v3)
            from mobilenet_tpu.models.mobilenet_v3 import V3Config
            from mobilenet_tpu.quant.v3 import (_as_device_tree_v3,
                                                forward_v3_i8, quantize_v3)

            c = V3Config(variant="small", alpha=1.0, resolution=224)
            d = _as_device_tree_v3(quantize_v3(
                fold_bn_v3(init_params_v3(c, seed=3), eps=c.bn_eps), c,
                n_calib=8))
            return (jax.jit(lambda v: forward_v3_i8(d, v, c)),
                    jax.jit(lambda v: forward_v3_i8(d, v, c,
                                                    use_fused=True)))

        def mk_v2():
            from mobilenet_tpu.checkpoints.v2 import (fold_bn_v2,
                                                      init_params_v2)
            from mobilenet_tpu.models.mobilenet_v2 import V2Config
            from mobilenet_tpu.quant.v2 import (_as_device_tree_v2,
                                                forward_v2_i8, quantize_v2)

            c = V2Config(alpha=1.0, resolution=224)
            d = _as_device_tree_v2(quantize_v2(
                fold_bn_v2(init_params_v2(c, seed=3), eps=c.bn_eps), c,
                n_calib=8))
            return (jax.jit(lambda v: forward_v2_i8(d, v, c)),
                    jax.jit(lambda v: forward_v2_i8(d, v, c,
                                                    use_fused=True)))

        def mk_v3large():
            from mobilenet_tpu.checkpoints.v3 import (fold_bn_v3,
                                                      init_params_v3)
            from mobilenet_tpu.models.mobilenet_v3 import V3Config
            from mobilenet_tpu.quant.v3 import (_as_device_tree_v3,
                                                forward_v3_i8, quantize_v3)

            c = V3Config(variant="large", alpha=1.0, resolution=224)
            d = _as_device_tree_v3(quantize_v3(
                fold_bn_v3(init_params_v3(c, seed=3), eps=c.bn_eps), c,
                n_calib=8))
            return (jax.jit(lambda v: forward_v3_i8(d, v, c)),
                    jax.jit(lambda v: forward_v3_i8(d, v, c,
                                                    use_fused=True)))

        net_pair("v3small-224", mk_v3small)
        net_pair("v2-224", mk_v2)
        net_pair("v3large-224", mk_v3large)

    if not n_checks[0]:
        print(f"SMOKE FAIL: --only {only!r} matched no checks", flush=True)
        return 1
    print(f"SMOKE ({n_checks[0]} checks)",
          "PASS" if not failures else f"FAIL: {failures}", flush=True)
    return 0 if not failures else 1


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default="", help="section/check-name substring filter")
    a = ap.parse_args()
    sys.exit(main(quick=a.quick, only=a.only))
