"""Fused INT8 inverted-residual kernel (quant.pallas_ir_i8) — EXACT gates.

int8 contracts are exact equality (CLAUDE.md invariants): the kernel and
the int8 oracle are two implementations of the same integer program, so
every test here asserts bit-identity, at the block and at the logits.
Interpret tier = sw_emu; the hw twin is tools/tpu_smoke.py's ir_i8
section (the idioms are individually hw-proven, the composition is not).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.quant import oracle as qoracle
from mobilenet_tpu.quant.pallas_ir_i8 import (inverted_residual_pallas_i8,
                                              ir_i8_fits)
from mobilenet_tpu.quant.quantize import ACT_HIDDEN_SCALE, _quant_layer
from mobilenet_tpu.quant.v2 import _res_add, pw_i8_linear


def _qcase(rng, cin, e, cout, s_out=np.float32(0.05)):
    qe = _quant_layer(
        (rng.normal(0, 1, (cin, e)) * cin ** -0.5).astype(np.float32),
        rng.normal(0, 0.1, (e,)).astype(np.float32), out_axis=1,
        s_in=s_out, s_out=ACT_HIDDEN_SCALE)
    qd = _quant_layer(
        rng.normal(0, 0.3, (3, 3, 1, e)).astype(np.float32),
        rng.normal(0, 0.1, (e,)).astype(np.float32), out_axis=3,
        s_in=ACT_HIDDEN_SCALE, s_out=ACT_HIDDEN_SCALE, f32_bias_bound=True)
    qp = _quant_layer(
        (rng.normal(0, 1, (e, cout)) * e ** -0.5).astype(np.float32),
        rng.normal(0, 0.1, (cout,)).astype(np.float32), out_axis=1,
        s_in=ACT_HIDDEN_SCALE, s_out=s_out)
    return qe, qd, qp


def _run(qe, qd, qp, x_i8, stride, residual, **kw):
    got = inverted_residual_pallas_i8(
        jnp.asarray(x_i8), jnp.asarray(qe.w_i8), jnp.asarray(qe.bias_i32),
        qe.m, float(qe.six_q), jnp.asarray(qd.w_i8),
        jnp.asarray(qd.bias_i32), qd.m, float(qd.six_q),
        jnp.asarray(qp.w_i8), jnp.asarray(qp.bias_i32), qp.m,
        stride, residual, **kw)
    z = qoracle.pw_i8(x_i8, qe.w_i8, qe.bias_i32, qe.m, qe.six_q, True)
    z = qoracle.dw3x3_i8(z, qd.w_i8, qd.bias_i32, qd.m, qd.six_q,
                         stride, True)
    want = pw_i8_linear(z, qp.w_i8, qp.bias_i32, qp.m)
    if residual:
        want = _res_add(want, x_i8)
    return np.asarray(got), want


# the V2 grid's int8 shape classes: unaligned E padding, both strides,
# residual saturation, the 960-wide tail
@pytest.mark.parametrize(
    "n,h,cin,e,cout,stride,residual",
    [
        (2, 14, 64, 384, 64, 1, True),
        (2, 14, 96, 576, 160, 2, False),
        (2, 7, 160, 960, 320, 1, False),
        (2, 28, 24, 144, 32, 2, False),
        (1, 8, 160, 960, 160, 1, True),
    ],
)
def test_exact_vs_int8_oracle(rng, n, h, cin, e, cout, stride, residual):
    qe, qd, qp = _qcase(rng, cin, e, cout)
    x_i8 = rng.integers(-100, 101, (n, h, h, cin)).astype(np.int8)
    got, want = _run(qe, qd, qp, x_i8, stride, residual)
    np.testing.assert_array_equal(got, want)


def test_residual_saturation_exact(rng):
    """Force the saturating add to actually clip: inputs near the int8
    rails must clamp identically to the oracle's int32-add-then-clip."""
    qe, qd, qp = _qcase(rng, 32, 192, 32, s_out=np.float32(0.5))
    x_i8 = np.where(rng.random((1, 8, 8, 32)) < 0.5, 120, -120).astype(
        np.int8)
    got, want = _run(qe, qd, qp, x_i8, 1, True)
    np.testing.assert_array_equal(got, want)
    assert (np.abs(want.astype(np.int32)) >= 127).any()  # clipping happened


def test_block_n_override_exact(rng):
    qe, qd, qp = _qcase(rng, 64, 384, 64)
    x_i8 = rng.integers(-100, 101, (8, 8, 8, 64)).astype(np.int8)
    base, want = _run(qe, qd, qp, x_i8, 1, True)
    np.testing.assert_array_equal(base, want)
    for bn in (1, 2, 8):
        got, _ = _run(qe, qd, qp, x_i8, 1, True, block_n=bn)
        np.testing.assert_array_equal(got, base)


def test_fits_known_values():
    """Pin the eligibility surface against KNOWN verdicts on the V2
    1.0-224 grid (not against a re-derivation of the same expression —
    that was a tautology, round-3 review finding): small-spatial whole
    tiles and the big-spatial rows tiles are in; the bn=8-forced 14->7
    stride-2 block is out at batch 256 but in at batch 1."""
    assert ir_i8_fits(256, 14, 14, 64, 384, 64, 1)        # whole
    assert ir_i8_fits(256, 7, 7, 160, 960, 320, 1)        # whole, bn=8
    assert ir_i8_fits(256, 112, 112, 16, 96, 24, 2)       # rows
    assert ir_i8_fits(256, 56, 56, 24, 144, 24, 1)        # rows
    assert not ir_i8_fits(256, 14, 14, 96, 576, 160, 2)   # V2-blk13 class
    assert ir_i8_fits(1, 14, 14, 96, 576, 160, 2)         # bn == n legal
    assert not ir_i8_fits(256, 15, 15, 96, 576, 160, 2)   # odd s2 input


def test_model_fused_bit_identical_to_xla():
    """forward_v2_i8(use_fused=True) must be BIT-IDENTICAL to the XLA int8
    route at the logits — two schedules of one integer program."""
    from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
    from mobilenet_tpu.models.mobilenet_v2 import V2Config
    from mobilenet_tpu.quant.quantize import quantize_input
    from mobilenet_tpu.quant.v2 import (_as_device_tree_v2, forward_v2_i8,
                                        quantize_v2)

    cfg = V2Config(alpha=1.0, resolution=96)
    folded = fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps)
    dev = _as_device_tree_v2(quantize_v2(folded, cfg, n_calib=8))
    rng = np.random.default_rng(5)
    x_i8 = jnp.asarray(quantize_input(
        rng.uniform(-1, 1, (2, 96, 96, 3)).astype(np.float32)))
    lx = np.asarray(forward_v2_i8(dev, x_i8, cfg))
    lf = np.asarray(forward_v2_i8(dev, x_i8, cfg, use_fused=True))
    np.testing.assert_array_equal(lx, lf)


def test_pipeline_use_fused_matches(rng):
    from mobilenet_tpu.models.mobilenet_v2 import V2Config
    from mobilenet_tpu.quant.v2 import Int8PipelineV2

    cfg = V2Config(alpha=1.0, resolution=96)
    imgs = rng.integers(0, 256, (2, 96, 96, 3), dtype=np.uint8)
    a = Int8PipelineV2(cfg, seed=0).run_batch(imgs)
    b = Int8PipelineV2(cfg, seed=0, use_fused=True).run_batch(imgs)
    np.testing.assert_array_equal(a, b)  # same integers -> same probs

# rows-mode shapes (the big-spatial V2 blocks where most device time
# lives): halo recompute, cross-tile residual offsets, s2 windows
@pytest.mark.parametrize(
    "n,h,cin,e,cout,stride,residual",
    [
        (2, 112, 16, 96, 24, 2, False),   # block1 class: s2 halo
        (2, 56, 24, 144, 24, 1, True),    # block2: residual across tiles
        (1, 48, 24, 144, 24, 1, True),
    ],
)
def test_rows_mode_exact(rng, n, h, cin, e, cout, stride, residual):
    from mobilenet_tpu.ops.pallas_ir_block import _mode

    qe, qd, qp = _qcase(rng, cin, e, cout)
    x_i8 = rng.integers(-100, 101, (n, h, h, cin)).astype(np.int8)
    got, want = _run(qe, qd, qp, x_i8, stride, residual)
    np.testing.assert_array_equal(got, want)
    # at least the first two shapes must actually exercise rows mode
    if h >= 56:
        assert _mode(n, h, h, cin, e, cout, stride, 2)[0] == "rows"


def test_model_fused_carriage_bit_identical_at_160():
    """bf16 integer carriage across the int8 V2 blocks (CARRY_MIN_H_V2):
    at 160 the plan has b1 emit bf16 into b2's ir kernel and b2 into b3
    (both >= 28² input), closing back to int8 before b4 — the routed
    forward must stay bit-equal to the pure-XLA oracle path. Also pins the
    plan shape this test exists for."""
    import jax.numpy as jnp

    from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
    from mobilenet_tpu.models.mobilenet_v2 import V2Config
    from mobilenet_tpu.quant.quantize import quantize_input
    from mobilenet_tpu.quant.v2 import (_as_device_tree_v2,
                                        _carry_accepts_v2, forward_v2_i8,
                                        quantize_v2)

    cfg = V2Config(alpha=0.35, resolution=160)
    folded = fold_bn_v2(init_params_v2(cfg, seed=2), eps=cfg.bn_eps)
    dev = _as_device_tree_v2(quantize_v2(folded, cfg, n_calib=8))
    acc = _carry_accepts_v2(dev, cfg)
    assert acc[1] and acc[2] and acc[3] and not acc[0] and not acc[4]

    rng = np.random.default_rng(6)
    x_i8 = jnp.asarray(quantize_input(
        rng.uniform(-1, 1, (2, 160, 160, 3)).astype(np.float32)))
    lx = np.asarray(forward_v2_i8(dev, x_i8, cfg))
    lf = np.asarray(forward_v2_i8(dev, x_i8, cfg, use_fused=True))
    np.testing.assert_array_equal(lx, lf)


def test_v3_kernel_bridge_matches_v2_ops_b13():
    """The a=m, inv_s=1.0 bridge: a V2 block that busts the ir kernel's
    plan (the b13 class — 14² s2, h_out*w_out odd) routed through the
    NAMED V3 kernel must be bit-equal to the V2 XLA ops sequence, for both
    out carriers."""
    from mobilenet_tpu.quant import ops as qops
    from mobilenet_tpu.quant.pallas_ir_v3_i8 import (v3_block_pallas_i8,
                                                     v3_i8_fits)
    from mobilenet_tpu.quant.quantize import _quant_layer
    from mobilenet_tpu.quant.v2 import _pw_i8_linear_dev

    n, h, cin, e, cout, stride = 2, 14, 96, 576, 160, 2
    assert not ir_i8_fits(256, h, h, cin, e, cout, stride)
    assert v3_i8_fits(256, h, h, cin, e, cout, 3, stride)
    rng = np.random.default_rng(13)
    sc = np.float32(6.0 / 127.0)
    qe = _quant_layer(rng.normal(0, e ** -0.5, (cin, e)).astype(np.float32),
                      rng.normal(0, 0.1, (e,)).astype(np.float32),
                      out_axis=1, s_in=sc, s_out=sc)
    qd = _quant_layer(rng.normal(0, 0.3, (3, 3, 1, e)).astype(np.float32),
                      rng.normal(0, 0.1, (e,)).astype(np.float32),
                      out_axis=3, s_in=sc, s_out=sc, f32_bias_bound=True)
    qp = _quant_layer(rng.normal(0, e ** -0.5, (e, cout)).astype(np.float32),
                      rng.normal(0, 0.1, (cout,)).astype(np.float32),
                      out_axis=1, s_in=sc, s_out=np.float32(0.05))
    x_i8 = rng.integers(-100, 101, (n, h, h, cin)).astype(np.int8)

    z = qops.pointwise_i8(jnp.asarray(x_i8), jnp.asarray(qe.w_i8),
                          jnp.asarray(qe.bias_i32), jnp.asarray(qe.m),
                          float(qe.six_q), True)
    z = qops.depthwise_i8_xla(z, jnp.asarray(qd.w_i8),
                              jnp.asarray(qd.bias_i32), jnp.asarray(qd.m),
                              float(qd.six_q), stride, True)
    want = np.asarray(_pw_i8_linear_dev(z, jnp.asarray(qp.w_i8),
                                        jnp.asarray(qp.bias_i32),
                                        jnp.asarray(qp.m)))

    named = lambda q: {"w": jnp.asarray(q.w_i8),  # noqa: E731
                       "b": jnp.asarray(q.bias_i32),
                       "a": jnp.asarray(q.m), "inv_s": 1.0}
    for carrier in (jnp.int8, jnp.bfloat16):
        for out_dt in (jnp.int8, jnp.bfloat16):
            got = v3_block_pallas_i8(
                jnp.asarray(x_i8).astype(carrier), named(qe), named(qd),
                named(qp), k=3, stride=stride, act="relu", residual=False,
                out_dtype=out_dt)
            np.testing.assert_array_equal(
                np.asarray(got, np.float32), want.astype(np.float32))
