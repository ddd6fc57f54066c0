"""INT8 channel-TP: bit-EXACT equality with the single-device int8 path on
the 8-device virtual CPU mesh — integer partial sums commute, so sharding
must not cost a single bit (quant/tp.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params
from mobilenet_tpu.parallel import mesh as pmesh
from mobilenet_tpu.quant import model as qmodel
from mobilenet_tpu.quant.tp import forward_i8_tp, shard_dev_i8_tp


def _setup(tp, alpha=0.25, res=64):
    mesh = pmesh.make_mesh(8, model_parallel=tp)
    cfg = ModelConfig(alpha=alpha, resolution=res)
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    q = qmodel.quantize_for_device(folded, cfg)
    dev = qmodel._as_device_tree(q)
    rng = np.random.default_rng(0)
    x_f = rng.uniform(-1, 1, (8, res, res, 3)).astype(np.float32)
    from mobilenet_tpu.quant.ops import quantize_input_dev
    from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

    x_i8 = np.asarray(quantize_input_dev(jnp.asarray(x_f), ACT_IN_SCALE))
    # close over dev: its six_q leaves are static floats that must stay
    # concrete at trace time (requantize's redundant-clip fast path)
    single = np.asarray(jax.jit(
        lambda x: qmodel.forward_i8(dev, x, cfg, use_fused=False)
    )(jnp.asarray(x_i8)))
    return mesh, cfg, dev, x_i8, single


@pytest.mark.parametrize("tp", [2, 4])
def test_int8_tp_logits_bit_exact(tp):
    """Row-sharded int8 pw + int32 psum reproduce single-device logits
    EXACTLY (same float ops on identical int32 accumulators)."""
    mesh, cfg, dev, x_i8, single = _setup(tp)
    arrays, six = shard_dev_i8_tp(dev, mesh)
    out = np.asarray(jax.jit(
        lambda a, x: forward_i8_tp(a, six, x, cfg, mesh)
    )(arrays, jnp.asarray(x_i8)))
    np.testing.assert_array_equal(out, single)


def test_int8_tp_dp_combined():
    """dp=2 x tp=4: batch sharding composes with the exact channel TP."""
    mesh, cfg, dev, x_i8, single = _setup(4)
    arrays, six = shard_dev_i8_tp(dev, mesh)
    out = np.asarray(forward_i8_tp(arrays, six, jnp.asarray(x_i8), cfg, mesh))
    assert out.shape == (8, cfg.num_classes)
    np.testing.assert_array_equal(out, single)
