"""Per-block backend routing: float + int8 spec resolution and equivalence.

Round-3 feature (VERDICT.md item 2): the int8 path gets the same per-block
routing machinery as the float path ("mixed" = xla for the two 112-squared
blocks, fused from block 2 on), so batch-1 int8 latency can ship a measured
mixed tuple instead of a global use_fused bool.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
from mobilenet_tpu.models import mobilenet_v1
from mobilenet_tpu.quant import ops as qops
from mobilenet_tpu.quant.model import (
    _as_device_tree,
    _routing_i8,
    forward_i8,
    quantize_for_device,
)
from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

CFG = ModelConfig(alpha=0.25, resolution=64)
N_BLOCKS = len(CFG.block_strides)


def test_routing_float_spec_resolution():
    r = mobilenet_v1._routing(CFG, False, "auto", 256)
    assert r == ("fused",) * N_BLOCKS
    r = mobilenet_v1._routing(CFG, False, "auto", 1)
    assert r == ("xla",) * 2 + ("fused",) * (N_BLOCKS - 2)
    assert mobilenet_v1._routing(CFG, False, "mixed", 256) == \
        ("xla",) * 2 + ("fused",) * (N_BLOCKS - 2)
    with pytest.raises(AssertionError):
        mobilenet_v1._routing(CFG, False, "bogus", 256)


def test_routing_i8_spec_resolution():
    assert _routing_i8(CFG, True, 1) == ("fused",) * N_BLOCKS
    assert _routing_i8(CFG, False, 256) == ("xla",) * N_BLOCKS
    assert _routing_i8(CFG, "auto", 256) == ("fused",) * N_BLOCKS
    # measured on v5e: int8 batch-1 winner is ALL-XLA, not the mixed tuple
    # (benchmarks/routing_crossover_v5e.jsonl)
    assert _routing_i8(CFG, "auto", 1) == ("xla",) * N_BLOCKS
    assert _routing_i8(CFG, "auto", 2) == ("fused",) * N_BLOCKS
    assert _routing_i8(CFG, "mixed", 256) == \
        ("xla",) * 2 + ("fused",) * (N_BLOCKS - 2)
    explicit = ("xla",) * 5 + ("fused",) * (N_BLOCKS - 5)
    assert _routing_i8(CFG, explicit, 256) == explicit
    with pytest.raises(AssertionError):
        _routing_i8(CFG, "bogus", 256)


def test_int8_mixed_routing_bit_exact():
    """int8 requant arithmetic is exact, so EVERY routing must produce
    bit-identical logits (the int8 acceptance bar, SURVEY.md SS4)."""
    folded = fold_bn(init_params(CFG, seed=0), eps=CFG.bn_eps)
    dev = _as_device_tree(quantize_for_device(folded, CFG, use_fused=True))
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    x_q = qops.quantize_input_dev(jnp.asarray(x), ACT_IN_SCALE)

    ref = np.asarray(forward_i8(dev, x_q, CFG, use_fused=False))
    for spec in (True, "mixed", ("xla",) * 6 + ("fused",) * (N_BLOCKS - 6)):
        got = np.asarray(forward_i8(dev, x_q, CFG, use_fused=spec))
        np.testing.assert_array_equal(got, ref, err_msg=f"routing={spec}")


def test_float_mixed_routing_matches_xla():
    cfg = ModelConfig(alpha=0.25, resolution=64, compute_dtype="float32")
    params = to_device(fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps))
    x = jnp.asarray(
        np.random.default_rng(1).uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(mobilenet_v1.forward(params, x, cfg, dw_backend="xla"))
    got = np.asarray(mobilenet_v1.forward(params, x, cfg, dw_backend="mixed"))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_autotune_cpu_defaults_xla():
    from mobilenet_tpu.runtime.autotune import autotune_backend

    best, results = autotune_backend(CFG, batch_size=4, steps=2)
    assert best == "xla"
    assert results["xla"] > 0


def test_int8_pipeline_auto_routing_batch_shapes():
    """Int8Pipeline's entry must run both a throughput batch and batch 1
    (the jit retraces per shape and _routing_i8 resolves per batch)."""
    from mobilenet_tpu.quant.model import Int8Pipeline

    pipe = Int8Pipeline(CFG, seed=0, use_fused="auto")
    rng = np.random.default_rng(0)
    big = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    one = big[:1]
    p_big = pipe.run_batch(big)
    p_one = pipe.run_batch(one)
    # int8 is exact: batch-1 probs must equal row 0 of the batch-4 probs.
    np.testing.assert_array_equal(p_one[0], p_big[0])
