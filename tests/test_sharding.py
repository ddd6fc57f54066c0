"""Multi-device sharding tests on the 8-device virtual CPU mesh
(SURVEY.md SS4 'Distributed' tier)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params
from mobilenet_tpu.models import mobilenet_v1
from mobilenet_tpu.models.train import sgd_train_step
from mobilenet_tpu.parallel import mesh as pmesh


def _setup(tp):
    mesh = pmesh.make_mesh(8, model_parallel=tp)
    cfg = ModelConfig(alpha=0.25, resolution=64)
    host = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    shardings = pmesh.param_shardings(host, mesh)
    params = jax.tree.map(lambda x, s: jax.device_put(jnp.asarray(x), s), host, shardings)
    return mesh, cfg, host, params, shardings


def test_dp_tp_forward_matches_single_device():
    mesh, cfg, host, params, _ = _setup(tp=2)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (16, 64, 64, 3)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), pmesh.batch_sharding(mesh))

    sharded = jax.jit(lambda p, x: mobilenet_v1.forward(p, x, cfg))(params, xs)
    single = jax.jit(lambda p, x: mobilenet_v1.forward(p, x, cfg))(
        jax.tree.map(jnp.asarray, host), jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-4, rtol=1e-3
    )


def test_train_step_dp_tp_runs_and_descends():
    mesh, cfg, host, params, shardings = _setup(tp=2)
    rng = np.random.default_rng(1)
    x = jax.device_put(
        jnp.asarray(rng.uniform(-1, 1, (16, 64, 64, 3)), jnp.float32),
        pmesh.batch_sharding(mesh),
    )
    y = jax.device_put(
        jnp.asarray(rng.integers(0, 1000, (16,)), jnp.int32),
        NamedSharding(mesh, P(pmesh.DATA_AXIS)),
    )
    step = jax.jit(
        lambda p, x, y: sgd_train_step(p, x, y, cfg, lr=1e-2),
        in_shardings=(shardings, pmesh.batch_sharding(mesh),
                      NamedSharding(mesh, P(pmesh.DATA_AXIS))),
        out_shardings=(shardings, NamedSharding(mesh, P())),
    )
    p1, l1 = step(params, x, y)
    p2, l2 = step(p1, x, y)
    assert np.isfinite(float(l1)) and np.isfinite(float(l2))
    assert float(l2) < float(l1)  # same batch twice: loss must drop


def test_pure_dp_mesh():
    mesh, cfg, host, params, _ = _setup(tp=1)
    assert mesh.devices.shape == (8, 1)
    x = jax.device_put(jnp.zeros((8, 64, 64, 3)), pmesh.batch_sharding(mesh))
    out = jax.jit(lambda p, x: mobilenet_v1.forward(p, x, cfg))(params, x)
    assert out.shape == (8, 1000)


def test_tp4_forward_matches_single_device():
    """Wider tensor-parallel split (model=4): channel shards get as narrow
    as 2 lanes at alpha=0.25 — the stress case for the TP layout."""
    mesh, cfg, host, params, _ = _setup(tp=4)
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), pmesh.batch_sharding(mesh))

    sharded = jax.jit(lambda p, x: mobilenet_v1.forward(p, x, cfg))(params, xs)
    single = jax.jit(lambda p, x: mobilenet_v1.forward(p, x, cfg))(
        jax.tree.map(jnp.asarray, host), jnp.asarray(x)
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=1e-4, rtol=1e-3
    )


def test_v2_dp_tp_forward_matches_single_device():
    """Channel-TP over the EXPANDED dim for V2 (param_shardings' V2/V3
    layout): expand shards Cout, dw shards along, projection shards its
    contraction (GSPMD psums per block) — logits match single-device."""
    from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
    from mobilenet_tpu.models.mobilenet_v2 import V2Config, forward_v2

    mesh = pmesh.make_mesh(8, model_parallel=2)
    cfg = V2Config(alpha=1.0, resolution=96)
    host = fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps)
    shardings = pmesh.param_shardings(host, mesh)
    params = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), host, shardings)
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (16, 96, 96, 3)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), pmesh.batch_sharding(mesh))
    sharded = jax.jit(lambda p, v: forward_v2(p, v, cfg))(params, xs)
    single = jax.jit(lambda p, v: forward_v2(p, v, cfg))(
        jax.tree.map(jnp.asarray, host), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-4, rtol=1e-3)


def test_v3_dp_tp_forward_matches_single_device():
    """V3 twin incl. the SE gate: w1 shards its contraction (psum to the
    replicated squeeze vector), w2 re-shards the gate to match z."""
    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3

    mesh = pmesh.make_mesh(8, model_parallel=4)
    cfg = V3Config(variant="small", alpha=1.0, resolution=96)
    host = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    shardings = pmesh.param_shardings(host, mesh)
    params = jax.tree.map(
        lambda x, s: jax.device_put(jnp.asarray(x), s), host, shardings)
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (8, 96, 96, 3)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), pmesh.batch_sharding(mesh))
    sharded = jax.jit(lambda p, v: forward_v3(p, v, cfg))(params, xs)
    single = jax.jit(lambda p, v: forward_v3(p, v, cfg))(
        jax.tree.map(jnp.asarray, host), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-4, rtol=1e-3)
