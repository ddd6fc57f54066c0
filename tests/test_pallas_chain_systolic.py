"""Systolic chain kernel tests (ops/pallas_chain_systolic): K identical
stride-1 C->C fused blocks software-pipelined over tiles, intermediates
VMEM-only. Checked against the per-block oracle chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
from mobilenet_tpu.models import mobilenet_v1
from mobilenet_tpu.ops.pallas_chain_systolic import chain_systolic
from mobilenet_tpu.oracle import numpy_ref


@pytest.mark.parametrize(
    "n,h,c,k,block_n",
    [
        (4, 14, 512, 5, None),   # the alpha=1.0 14^2 stretch shape
        (2, 14, 128, 3, None),   # alpha=0.25
        (6, 7, 256, 4, 2),       # explicit tile size, 3 tiles, fill/drain
        (1, 8, 128, 2, None),    # single tile (t_tiles == 1)
        (8, 7, 128, 5, 1),       # more tiles than stages
    ],
)
def test_chain_vs_oracle(rng, n, h, c, k, block_n):
    x = rng.uniform(-1, 1, (n, h, h, c)).astype(np.float32)
    dw_ws = rng.normal(0, 0.4, (k, 3, 3, c)).astype(np.float32)
    dw_bs = rng.normal(0, 0.2, (k, c)).astype(np.float32)
    pw_ws = (rng.normal(0, 1.0, (k, c, c)) / np.sqrt(c)).astype(np.float32)
    pw_bs = rng.normal(0, 0.2, (k, c)).astype(np.float32)

    got = np.asarray(chain_systolic(
        jnp.asarray(x), jnp.asarray(dw_ws), jnp.asarray(dw_bs),
        jnp.asarray(pw_ws), jnp.asarray(pw_bs), True,
        block_n=block_n, interpret=True))

    ref = x
    for kk in range(k):
        ref = numpy_ref.pointwise_ref(
            numpy_ref.depthwise_ref(ref, dw_ws[kk].reshape(3, 3, 1, c), 1,
                                    dw_bs[kk], True),
            pw_ws[kk], pw_bs[kk], True)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_model_routing_chain_flag(monkeypatch):
    """Full fused forward with the systolic chain routed over the 14^2
    stretch matches the default routing."""
    from mobilenet_tpu.ops import pallas_chain_systolic as pcs

    cfg = ModelConfig(alpha=0.25, resolution=128)
    params = to_device(fold_bn(init_params(cfg, seed=9), eps=cfg.bn_eps))
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (4, 128, 128, 3)).astype(np.float32))
    ref = np.asarray(mobilenet_v1.forward(params, x, cfg, dw_backend="fused"))

    monkeypatch.setattr(pcs, "CHAIN_SYSTOLIC_F", True)
    got = np.asarray(mobilenet_v1.forward(params, x, cfg, dw_backend="fused"))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)

    # the detector finds the 5-block 14^2 stretch (blocks 6..10); y_shape is
    # the activation ENTERING block 0 (post-conv1: 64^2 at res 128)
    routing = ("fused",) * 13
    runs = mobilenet_v1._chain_runs(
        {"blocks": [jax.tree.map(np.asarray, b) for b in params["blocks"]]},
        cfg, routing, (4, 64, 64, 8), 4)
    assert runs.get(6) == 5, runs


def test_chain_runs_spatial_uses_tf_same_ceil(monkeypatch):
    """_chain_runs must track spatial size with TF-SAME ceil division: at an
    odd spatial side entering a stride-2 block, floor would understate hw
    and approve chains the kernel's own VMEM check then rejects (round-3
    review finding)."""
    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params
    from mobilenet_tpu.models import mobilenet_v1
    from mobilenet_tpu.ops import pallas_chain_systolic as pcs

    cfg = ModelConfig(alpha=0.25, resolution=128)
    params = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    seen = []

    def spy(hh, ww, c, k, itemsize):
        seen.append(hh)
        return False  # force no chains; we only audit the spatial sides

    monkeypatch.setattr(pcs, "chain_fits", spy)
    routing = ("fused",) * len(cfg.block_strides)
    # inject an ODD spatial side (25) entering block 0 — the grid's own
    # resolutions stay even until the final 7, so the divergence only
    # shows via y_shape: 25 -s2-> ceil 13 (floor would say 12), then
    # 13 -> 7 -> 4 at the C=128 chain stretch where chain_fits is probed
    mobilenet_v1._chain_runs(params, cfg, routing, (2, 25, 25, 8), 2)
    assert seen and set(seen) == {4}  # floor arithmetic would probe hh=3


def test_batch1_auto_routing_uses_chain_and_matches():
    """At batch 1 (launch-gap-dominated, measured win — tools/ab_chain_b1.py)
    the auto routing collapses the eligible stretch into the chain kernel;
    probs must match the per-block path."""
    import numpy as np

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.models import mobilenet_v1
    from mobilenet_tpu.ops import preprocess as prep

    cfg = ModelConfig(alpha=0.25, resolution=128)
    params = to_device(fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps),
                       dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = prep.preprocess(
        jnp.asarray(rng.integers(0, 256, (1, 128, 128, 3), dtype=np.uint8)),
        cfg.resolution, jnp.bfloat16)

    # the batch-1 eligibility itself (blocks 6-10: 8x8, 128ch at alpha=0.25)
    runs = mobilenet_v1._chain_runs(
        params, cfg, mobilenet_v1._routing(cfg, False, "auto", 1),
        x.shape, 2)
    assert runs.get(6) == 5, runs

    probs_auto = np.asarray(jax.jit(
        lambda x: mobilenet_v1.predict_probs(params, x, cfg,
                                             dw_backend="auto"))(x),
        np.float32)  # CHAIN_AT_BATCH1 path
    try:
        mobilenet_v1.CHAIN_AT_BATCH1 = False
        probs_blocks = np.asarray(jax.jit(
            lambda x: mobilenet_v1.predict_probs(params, x, cfg,
                                                 dw_backend="auto"))(x),
            np.float32)
    finally:
        mobilenet_v1.CHAIN_AT_BATCH1 = True
    np.testing.assert_allclose(probs_auto, probs_blocks, atol=1e-6)
    assert int(np.argmax(probs_auto)) == int(np.argmax(probs_blocks))
