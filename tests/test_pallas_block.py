"""Fused dw+pw separable block kernel tests (interpret tier) against the
fixed-order oracle, across real network shapes (SURVEY.md SS7 stage 3/4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
from mobilenet_tpu.models import mobilenet_v1
from mobilenet_tpu.ops.pallas_block import pick_tiles, separable_block_pallas
from mobilenet_tpu.oracle import numpy_ref

import jax


def _case(rng, n, h, cin, cout, stride, block_h=None, block_n=None,
          mxu_subsample=None):
    x = rng.uniform(-1, 1, (n, h, h, cin)).astype(np.float32)
    dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
    dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
    pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
    pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
    got = separable_block_pallas(
        jnp.asarray(x), jnp.asarray(dw_w), jnp.asarray(dw_b),
        jnp.asarray(pw_w), jnp.asarray(pw_b), stride, True,
        block_h=block_h, block_n=block_n, interpret=True,
        mxu_subsample=mxu_subsample,
    )
    mid = numpy_ref.depthwise_ref(x, dw_w, stride, dw_b, True)
    ref = numpy_ref.pointwise_ref(mid, pw_w, pw_b, True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "n,h,cin,cout,stride",
    [
        (2, 112, 32, 64, 1),
        (2, 112, 64, 128, 2),
        (1, 56, 128, 128, 1),
        (1, 28, 256, 512, 2),
        (4, 14, 512, 512, 1),   # batch-tiled
        (4, 7, 1024, 1024, 1),  # batch-tiled, single row tile
        (2, 16, 8, 16, 1),
        (2, 8, 16, 32, 2),
        (1, 4, 256, 256, 1),    # alpha=0.25/128 tail
    ],
)
def test_vs_oracle(rng, n, h, cin, cout, stride):
    _case(rng, n, h, cin, cout, stride)


@pytest.mark.parametrize("block_h,block_n", [(2, 1), (4, 2), (7, 1)])
def test_tile_shapes(rng, block_h, block_n):
    _case(rng, 2, 14, 64, 64, 1, block_h=block_h, block_n=block_n)


def test_two_row_tiles_edge(rng):
    # g == 2 exercises top+bottom branches with no middle branch.
    _case(rng, 1, 16, 32, 32, 1, block_h=8)
    _case(rng, 1, 16, 32, 32, 2, block_h=4)


@pytest.mark.parametrize("n,h,cin,cout", [(2, 112, 64, 128), (1, 28, 256, 512),
                                          (1, 16, 32, 32)])
def test_s2_mxu_subsample_vs_oracle(rng, n, h, cin, cout):
    """Stride-2 even-column selection via the K-zero-padded MXU weight must
    match the oracle exactly like the gather variant does."""
    _case(rng, n, h, cin, cout, 2, mxu_subsample=True)


def test_full_model_fused_routing_matches_xla():
    cfg = ModelConfig(alpha=0.25, resolution=128)
    params = to_device(fold_bn(init_params(cfg, seed=2), eps=cfg.bn_eps))
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))
    ref = mobilenet_v1.forward(params, x, cfg, dw_backend="xla")
    got = mobilenet_v1.forward(params, x, cfg, dw_backend="fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-3)


def test_pick_tiles_batches_small_layers():
    bn, th = pick_tiles(256, 7, 7, 1024, 1024, 1)
    assert bn >= 2  # small-spatial layers must batch-tile
    bn2, th2 = pick_tiles(256, 112, 112, 32, 64, 1)
    assert bn2 == 1  # big-spatial layers must not blow VMEM


@pytest.mark.parametrize("stride", [1, 2])
def test_pw_epilogue_false_emits_raw_partial(rng, stride):
    """pw_epilogue=False returns the RAW f32 pointwise accumulation (no
    bias, no relu) — applying the epilogue outside must equal the fused
    result bit-for-tolerance. This is the TP partial contract
    (parallel/tp_fused.py: bias+relu do not commute with the psum)."""
    n, h, cin, cout = 2, 16, 32, 64
    x = rng.uniform(-1, 1, (n, h, h, cin)).astype(np.float32)
    dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
    dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
    pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
    pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
    args = (jnp.asarray(x), jnp.asarray(dw_w), jnp.asarray(dw_b),
            jnp.asarray(pw_w), jnp.asarray(pw_b), stride, True)
    fused = separable_block_pallas(*args, interpret=True)
    raw = separable_block_pallas(*args, interpret=True, pw_epilogue=False)
    assert raw.dtype == jnp.float32
    outside = np.clip(np.asarray(raw) + pw_b, 0.0, 6.0)
    np.testing.assert_allclose(outside, np.asarray(fused), atol=3e-6,
                               rtol=1e-6)
