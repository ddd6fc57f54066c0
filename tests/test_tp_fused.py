"""Channel-TP through the fused Pallas kernels, on the 8-device virtual CPU
mesh (SURVEY.md SS4 'Distributed' tier; round-3 VERDICT weak #5 'support'
half — the guard half lives in tests/test_round3_fixes.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params
from mobilenet_tpu.models import mobilenet_v1
from mobilenet_tpu.parallel import mesh as pmesh
from mobilenet_tpu.parallel.tp_fused import (
    forward_tp_fused, param_specs_tp_fused, shard_params_tp_fused)


def _setup(tp, alpha=0.25, res=64):
    mesh = pmesh.make_mesh(8, model_parallel=tp)
    cfg = ModelConfig(alpha=alpha, resolution=res)
    host = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    params = shard_params_tp_fused(host, mesh)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (8, res, res, 3)).astype(np.float32)
    single = jax.jit(lambda p, x: mobilenet_v1.forward(p, x, cfg))(
        jax.tree.map(jnp.asarray, host), jnp.asarray(x))
    return mesh, cfg, params, x, np.asarray(single)


@pytest.mark.parametrize("tp", [2, 4])
@pytest.mark.parametrize("backend", ["xla", "fused"])
def test_tp_fused_matches_single_device(tp, backend):
    """Row-sharded pw partials + per-block psum reproduce the single-device
    logits for both the fused Pallas kernels and the xla fallback."""
    mesh, cfg, params, x, single = _setup(tp)
    out = jax.jit(
        lambda p, x: forward_tp_fused(p, x, cfg, mesh, dw_backend=backend),
        static_argnames=(),
    )(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), single, atol=2e-4, rtol=1e-3)


def test_tp_fused_auto_routing_picks_by_local_width():
    """'auto' uses fused only where the LOCAL channel count fills the
    128-lane tiles; at alpha 0.25 / tp 2 every block is below 128 locally,
    so auto must equal the all-xla routing (and still match the oracle)."""
    mesh, cfg, params, x, single = _setup(2)
    out = jax.jit(
        lambda p, x: forward_tp_fused(p, x, cfg, mesh, dw_backend="auto")
    )(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), single, atol=2e-4, rtol=1e-3)


def test_tp_fused_dp_axis_shards_batch():
    """The data axis still shards the batch: per-device batch is N/dp."""
    mesh, cfg, params, x, single = _setup(4)  # dp=2 x tp=4
    out = forward_tp_fused(params, jnp.asarray(x), cfg, mesh,
                           dw_backend="xla")
    assert out.shape == (8, cfg.num_classes)
    np.testing.assert_allclose(np.asarray(out), single, atol=2e-4, rtol=1e-3)


def test_param_specs_shapes():
    """Row-sharded pw + channel-sharded dw: spec tree mirrors the params
    tree (a mismatched tree would fail shard_map's spec matching)."""
    cfg = ModelConfig(alpha=0.25, resolution=64)
    host = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    specs = param_specs_tp_fused(host)
    assert len(specs["blocks"]) == len(host["blocks"])
    assert specs["fc"]["w"] == jax.sharding.PartitionSpec("model", None)
