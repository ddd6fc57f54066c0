"""The packed-expand stride-2 route (V3/V2 block 1) and its helpers.

Block 1 (Cin=16 at 112²) measured 9.2 ms of V3-Large's 20.9 ms/batch-256
under the rows-mode fused kernel ((…, 16) element windows at 1/8 lane
occupancy + a K=16 expand dot — benchmarks/v3_campaign_raw.log 2026-08-19
attribution). The route runs the expansion as one full-width kron matmul in
the lane-packed layout (ops.pallas_block_packed.packed_expand) and the
dw+prj stage on the V1 packed (E | 128) or dense stride-2 kernel with a
linear-projection epilogue; consumers pad their expand rows (and residual
blocks their prj cols) with zeros in-graph.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
from mobilenet_tpu.models import mobilenet_v2 as mod_v2
from mobilenet_tpu.models import mobilenet_v3 as mod_v3
from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3
from mobilenet_tpu.ops.pallas_block_packed import packed_expand


def _rng(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32)


def test_packed_expand_matches_pointwise_conv():
    """kron(I_R, We) on the packed layout == the standard expand matmul
    (zero off-diagonal blocks add exact f32 zeros)."""
    from mobilenet_tpu.ops.conv import pointwise_conv

    x = jnp.asarray(_rng(2, 8, 8, 16))
    w = jnp.asarray(_rng(16, 96, seed=1))
    b = jnp.asarray(_rng(96, seed=2))
    got = packed_expand(x, w, b, "relu6")
    want = pointwise_conv(x, w, bias=b, act="relu6")
    assert got.shape == want.shape == (2, 8, 8, 96)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_packed_expand_named_acts():
    x = jnp.asarray(_rng(1, 4, 8, 16))
    w = jnp.asarray(_rng(16, 64, seed=3))
    b = jnp.asarray(_rng(64, seed=4))
    from mobilenet_tpu.ops.conv import pointwise_conv

    for act in ("relu", "hswish"):
        got = packed_expand(x, w, b, act)
        want = pointwise_conv(x, w, bias=b, act=act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("variant,alpha", [("large", 1.0), ("small", 1.0)])
def test_v3_packed_s2_route_matches_xla(variant, alpha):
    """Full-model fused routing vs the always-correct xla routing, f32
    interpret tier. Large E=64 takes the packed-expand s2 route at block 1;
    Small E=72 doesn't divide 128 so the route is (deliberately) inert and
    the base fused route ships — this case guards that inertness."""
    cfg = V3Config(variant=variant, alpha=alpha, resolution=96,
                   compute_dtype="float32")
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    x = jnp.asarray(_rng(2, 96, 96, 3, seed=5) * 0.5)
    assert mod_v3.PACKED_EXPAND_S2  # ships on
    got = forward_v3(params, x, cfg, dw_backend="fused")
    want = forward_v3(params, x, cfg, dw_backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_v3_route_actually_taken(monkeypatch):
    """The knob changes the traced program (guards against the eligibility
    silently failing and the test above passing vacuously). The fused
    single-kernel route (FUSED_EXPAND_S2) supersedes the two-stage route
    when on, so this guards the two-stage FALLBACK with it off."""
    monkeypatch.setattr(mod_v3, "FUSED_EXPAND_S2", False)
    cfg = V3Config(variant="large", alpha=1.0, resolution=96,
                   compute_dtype="float32")
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    x = jnp.ones((1, 96, 96, 3), jnp.float32)
    calls = []
    orig = packed_expand

    def spy(*a, **k):
        calls.append(a[0].shape)
        return orig(*a, **k)

    import mobilenet_tpu.ops.pallas_block_packed as pbp

    monkeypatch.setattr(pbp, "packed_expand", spy)
    forward_v3(params, x, cfg, dw_backend="fused")
    assert calls, "packed-expand s2 route was not taken at Large-96"
    assert calls[0][-1] == 16  # block 1's Cin


def test_v2_packed_s2_route_inert_on_standard_grid(monkeypatch):
    """V2's block-1 expand width (96α) never divides 128 on the standard
    grid, and the dense-stage-2 variant measured a LOSS on chip
    (tools/ab_b1_packed.py --model v2: 11,458 -> 10,684 img/s at 1.0-224),
    so the eligibility gate must keep the route inert for V2: fused output
    unchanged AND packed_expand never called."""
    from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
    from mobilenet_tpu.models.mobilenet_v2 import V2Config, forward_v2

    cfg = V2Config(alpha=1.0, resolution=96, compute_dtype="float32")
    params = fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps)
    x = jnp.asarray(_rng(2, 96, 96, 3, seed=6) * 0.5)
    assert mod_v2.PACKED_EXPAND_S2
    calls = []
    import mobilenet_tpu.ops.pallas_block_packed as pbp

    orig = packed_expand
    monkeypatch.setattr(pbp, "packed_expand",
                        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    got = forward_v2(params, x, cfg, dw_backend="fused")
    assert not calls, "packed-expand route fired on standard V2 (E=96)"
    want = forward_v2(params, x, cfg, dw_backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_consumer_pads_keep_logits_when_route_off(monkeypatch):
    """With the route disabled nothing pads and fused == its previous
    behavior; with it enabled the consumer pads keep shapes consistent
    even under a MIXED per-block tuple (fused block 1, xla after)."""
    cfg = V3Config(variant="large", alpha=1.0, resolution=96,
                   compute_dtype="float32")
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    x = jnp.asarray(_rng(2, 96, 96, 3, seed=7) * 0.5)
    n = len(cfg.block_defs)
    mixed = ("fused",) * 2 + ("xla",) * (n - 2)
    got = forward_v3(params, x, cfg, dw_backend=mixed)
    want = forward_v3(params, x, cfg, dw_backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_i8_packed_s2_route_taken_and_bit_identical(monkeypatch):
    """The int8 twin (quant/v3.PACKED_EXPAND_S2_I8): the route must FIRE at
    Large-96 (block 1: Cin=16, E=64, carried bf16 input) and the fused
    logits must stay BIT-IDENTICAL to the XLA int8 route."""
    import jax.numpy as jnp

    from mobilenet_tpu.quant import pallas_block_packed_i8 as pbi
    from mobilenet_tpu.quant.quantize import quantize_input
    from mobilenet_tpu.quant.v3 import (_as_device_tree_v3, forward_v3_i8,
                                        quantize_v3)

    from mobilenet_tpu.quant import v3 as qv3

    # The fused single-kernel twin (FUSED_EXPAND_S2_I8) supersedes this
    # route when on; guard the two-stage fallback with it off.
    monkeypatch.setattr(qv3, "FUSED_EXPAND_S2_I8", False)
    cfg = V3Config(variant="large", alpha=1.0, resolution=96)
    folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    dev = _as_device_tree_v3(quantize_v3(folded, cfg, n_calib=4))
    x = _rng(2, 96, 96, 3, seed=9) * 0.5
    x_i8 = jnp.asarray(quantize_input(x))
    calls = []
    orig = pbi.packed_expand_i8_named
    monkeypatch.setattr(pbi, "packed_expand_i8_named",
                        lambda *a, **k: (calls.append(a[0].shape),
                                         orig(*a, **k))[1])
    lf = np.asarray(forward_v3_i8(dev, x_i8, cfg, use_fused=True))
    assert calls and calls[0][-1] == 16, calls
    lx = np.asarray(forward_v3_i8(dev, x_i8, cfg))
    np.testing.assert_array_equal(lx, lf)


def test_i8_named_s2_kernel_exact_vs_ops():
    """packed_block_i8_named_s2 alone vs the quant/v3 XLA ops sequence
    (dw requant -> linear prj requant) on a random named-quant block."""
    import jax.numpy as jnp

    from mobilenet_tpu.ops.pallas_block_packed import pack
    from mobilenet_tpu.quant.pallas_block_packed_i8 import (
        packed_block_i8_named_s2)
    from mobilenet_tpu.quant.v3 import (_dwk_acc_dev, _pw_acc_dev,
                                        _requant_named_dev)

    rng = np.random.default_rng(3)
    cin, cout, h, w = 64, 128, 16, 16
    x_q = rng.integers(-128, 128, (2, h, w, cin)).astype(np.int8)
    dw_w = rng.integers(-127, 128, (3, 3, 1, cin)).astype(np.int8)
    dw_b = rng.integers(-1000, 1000, (cin,)).astype(np.int32)
    dw_a = (rng.uniform(0.5, 2.0, (cin,)) * 1e-3).astype(np.float32)
    pw_w = rng.integers(-127, 128, (cin, cout)).astype(np.int8)
    pw_b = rng.integers(-1000, 1000, (cout,)).astype(np.int32)
    pw_a = (rng.uniform(0.5, 2.0, (cout,)) * 1e-3).astype(np.float32)
    d_inv, p_inv = 37.0, 53.0

    z = _requant_named_dev(
        _dwk_acc_dev(jnp.asarray(x_q), jnp.asarray(dw_w), 2, 3)
        + jnp.asarray(dw_b), jnp.asarray(dw_a), d_inv, "relu")
    want = _requant_named_dev(
        _pw_acc_dev(z, jnp.asarray(pw_w), jnp.asarray(pw_b)),
        jnp.asarray(pw_a), p_inv, "linear")

    xp = pack(jnp.asarray(x_q).astype(jnp.bfloat16), cin)
    got = packed_block_i8_named_s2(
        xp, jnp.asarray(dw_w), jnp.asarray(dw_b), jnp.asarray(dw_a),
        jnp.asarray(pw_w), jnp.asarray(pw_b), jnp.asarray(pw_a),
        cin, cout, "relu", d_inv, p_inv, out_dtype="int8")
    got = np.asarray(got).reshape(2, h // 2, w // 2, cout)
    np.testing.assert_array_equal(got, np.asarray(want))
