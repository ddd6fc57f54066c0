"""Training-step tests (the rebuild's extension beyond the inference-only
reference; exercised multi-chip by __graft_entry__.dryrun_multichip)."""

import jax
import jax.numpy as jnp
import numpy as np

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
from mobilenet_tpu.models.train import (
    cross_entropy_loss, make_optax_trainer, sgd_train_step,
)


def _setup():
    cfg = ModelConfig(alpha=0.25, resolution=64)
    params = to_device(fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 64, 64, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 1000, (8,)), jnp.int32)
    return cfg, params, x, y


def test_sgd_step_descends():
    cfg, params, x, y = _setup()
    step = jax.jit(lambda p, x, y: sgd_train_step(p, x, y, cfg, lr=1e-2))
    p1, l1 = step(params, x, y)
    p2, l2 = step(p1, x, y)
    _, l3 = step(p2, x, y)
    assert float(l3) < float(l1)


def test_optax_trainer_descends_and_reports_top1():
    cfg, params, x, y = _setup()
    init_fn, step_fn = make_optax_trainer(cfg, lr=5e-2)
    opt_state = init_fn(params)
    step = jax.jit(step_fn)
    losses = []
    for _ in range(4):
        params, opt_state, loss, top1 = step(params, opt_state, x, y)
        losses.append(float(loss))
        assert 0.0 <= float(top1) <= 1.0
    assert losses[-1] < losses[0]


def test_loss_is_finite_and_grad_nonzero():
    cfg, params, x, y = _setup()
    loss, grads = jax.value_and_grad(cross_entropy_loss)(params, x, y, cfg)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g ** 2)) for g in jax.tree.leaves(grads))
    assert gnorm > 0
