"""Mega-kernel (normalize + stem + block-0 dw/pw) vs the oracle chain.

Interpret tier for the preprocess->conv1->block00 fusion; hw-tier twin lives
in tools/tpu_smoke.py."""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.ops.pallas_block_packed import unpack
from mobilenet_tpu.ops.pallas_stem_b0 import stem_block0_fused
from mobilenet_tpu.oracle import numpy_ref


@pytest.mark.parametrize("n,h,cout,relu6", [(2, 64, 64, True), (1, 32, 16, False)])
def test_vs_oracle(rng, n, h, cout, relu6):
    img = rng.integers(0, 256, (n, h, h, 3), dtype=np.uint8)
    sw = rng.normal(0, 0.3, (3, 3, 3, 32)).astype(np.float32)
    sb = rng.normal(0, 0.1, (32,)).astype(np.float32)
    dw_w = rng.normal(0, 0.5, (3, 3, 1, 32)).astype(np.float32)
    dw_b = rng.normal(0, 0.2, (32,)).astype(np.float32)
    pw_w = rng.normal(0, 0.3, (32, cout)).astype(np.float32)
    pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)

    got = np.asarray(unpack(stem_block0_fused(
        jnp.asarray(img), jnp.asarray(sw), jnp.asarray(sb),
        jnp.asarray(dw_w), jnp.asarray(dw_b),
        jnp.asarray(pw_w), jnp.asarray(pw_b), cout, relu6, interpret=True,
    ), cout))

    x = numpy_ref.preprocess_ref(img)
    stem = numpy_ref.conv2d_ref(x, sw, 2, sb, relu6)
    mid = numpy_ref.depthwise_ref(stem, dw_w, 1, dw_b, relu6)
    ref = numpy_ref.pointwise_ref(mid, pw_w, pw_b, relu6)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-5)


def test_forward_u8_routing_matches_xla():
    """predict_probs_u8 with fused routing (mega-kernel stem) must match the
    XLA preprocess+forward pipeline end-to-end at alpha=1.0."""
    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.models import mobilenet_v1
    from mobilenet_tpu.ops import preprocess as prep

    cfg = ModelConfig(alpha=1.0, resolution=128)
    params = to_device(fold_bn(init_params(cfg, seed=7), eps=cfg.bn_eps))
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.integers(0, 256, (2, 128, 128, 3), dtype=np.uint8))

    routing = mobilenet_v1._routing(cfg, False, "fused", 2)
    assert mobilenet_v1._stem_fusible(params, cfg, img.shape, routing, jnp.float32)
    # fp32 at 224 must NOT fuse (OOMs the 16M VMEM scope on chip)
    assert not mobilenet_v1._stem_fusible(
        params, cfg, (2, 224, 224, 3), routing, jnp.float32)
    assert mobilenet_v1._stem_fusible(
        params, cfg, (2, 224, 224, 3), routing, jnp.bfloat16)

    got = mobilenet_v1.forward_u8(params, img, cfg, dw_backend="fused",
                                  fuse_stem=True)
    ref = mobilenet_v1.forward(
        params, prep.preprocess(img, cfg.resolution), cfg, dw_backend="xla"
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-3)


def test_pipeline_fuse_stem_plumbing():
    """InferencePipeline(fuse_stem=True) must route probs_u8 through the
    mega-kernel path and match the default pipeline."""
    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.runtime.pipeline import InferencePipeline

    cfg = ModelConfig(alpha=1.0, resolution=128)
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (2, 128, 128, 3), dtype=np.uint8)
    base = InferencePipeline(cfg, seed=2, dw_backend="fused", dtype=jnp.float32)
    fused = InferencePipeline(cfg, seed=2, dw_backend="fused",
                              dtype=jnp.float32, fuse_stem=True)
    np.testing.assert_allclose(
        fused.run_batch(img), base.run_batch(img), atol=1e-5, rtol=1e-4)
