"""Channel-padding pass: alpha=0.75 channel counts padded to lane divisors
must produce EXACTLY the same logits (padded channels carry zeros)."""

import jax
import jax.numpy as jnp
import numpy as np

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
from mobilenet_tpu.checkpoints.padding import needs_padding, pad_channels
from mobilenet_tpu.models import mobilenet_v1


def test_padding_preserves_logits_exactly():
    cfg = ModelConfig(alpha=0.75, resolution=128)
    folded = fold_bn(init_params(cfg, seed=6), eps=cfg.bn_eps)
    assert needs_padding(folded)
    padded = pad_channels(folded)
    # 24 -> 32, 48 -> 64, 96 -> 128; >= 128 unchanged; final features unchanged
    assert padded["conv1"]["w"].shape[3] == 32
    assert padded["blocks"][0]["pw"]["w"].shape == (32, 64)
    assert padded["blocks"][2]["pw"]["w"].shape == (128, 128)
    assert padded["blocks"][-1]["pw"]["w"].shape[1] == folded["blocks"][-1]["pw"]["w"].shape[1]

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    ref = mobilenet_v1.forward(to_device(folded), x, cfg, dw_backend="xla")
    got = mobilenet_v1.forward(to_device(padded), x, cfg, dw_backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_padded_fused_routing_matches():
    cfg = ModelConfig(alpha=0.75, resolution=128)
    folded = fold_bn(init_params(cfg, seed=6), eps=cfg.bn_eps)
    padded = pad_channels(folded)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    ref = mobilenet_v1.forward(to_device(folded), x, cfg, dw_backend="xla")
    got = mobilenet_v1.forward(to_device(padded), x, cfg, dw_backend="fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-3)


def test_no_padding_when_divisors():
    cfg = ModelConfig(alpha=1.0, resolution=224)
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    assert not needs_padding(folded)
