"""Pallas depthwise kernel unit tests (interpret mode = our sw_emu tier,
SURVEY.md SS4) against the XLA grouped conv and the fixed-order NumPy oracle,
across the alpha/resolution sweep shapes (BASELINE.json:8)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.ops.conv import depthwise_conv_xla
from mobilenet_tpu.ops.pallas_dw import depthwise_conv_pallas
from mobilenet_tpu.oracle import numpy_ref


def _case(rng, n, h, c, stride, relu6=True, dtype=np.float32):
    x = rng.uniform(-2, 2, (n, h, h, c)).astype(dtype)
    w = rng.normal(0, 0.5, (3, 3, 1, c)).astype(dtype)
    b = rng.normal(0, 0.2, (c,)).astype(dtype)
    got = depthwise_conv_pallas(jnp.asarray(x), jnp.asarray(w), stride, jnp.asarray(b),
                                relu6, interpret=True)
    ref = numpy_ref.depthwise_ref(x, w, stride, b, relu6)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-6, rtol=1e-6)
    xla = depthwise_conv_xla(jnp.asarray(x), jnp.asarray(w), stride, jnp.asarray(b), relu6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(xla), atol=2e-6, rtol=1e-6)


# Shapes drawn from the real network at each alpha/resolution (SURVEY.md SS2).
@pytest.mark.parametrize(
    "h,c,stride",
    [
        (112, 32, 1),   # block00 @ alpha=1.0/224
        (112, 64, 2),   # block01
        (56, 128, 1),   # block02
        (28, 256, 2),   # block05
        (14, 512, 1),   # block06..10
        (7, 1024, 1),   # block12
        (64, 8, 1),     # alpha=0.25/128 stem out
        (16, 64, 2),    # alpha=0.25 late block, odd tiling
        (8, 256, 2),    # small spatial stride-2
        (4, 256, 1),    # alpha=0.25/128 final 4x4
    ],
)
def test_vs_oracle_and_xla(rng, h, c, stride):
    _case(rng, 2, h, c, stride)


def test_relu_variant(rng):
    _case(rng, 1, 14, 128, 1, relu6=False)


def test_bfloat16_runs(rng):
    x = rng.uniform(-2, 2, (1, 14, 14, 256)).astype(np.float32)
    w = rng.normal(0, 0.5, (3, 3, 1, 256)).astype(np.float32)
    b = rng.normal(0, 0.2, (256,)).astype(np.float32)
    got = depthwise_conv_pallas(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(w, jnp.bfloat16), 1,
        jnp.asarray(b, jnp.bfloat16), True, interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = numpy_ref.depthwise_ref(x, w, 1, b, True)
    # bf16 inputs: tolerance at bf16 resolution
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, atol=0.15, rtol=0.05)


def test_odd_spatial_stride2(rng):
    # 7x7 stride 2 -> 4x4 (odd input: SAME pad (1,1)) — not used by MobileNet
    # (all stride-2 inputs are even) but guards the pad math.
    x = rng.uniform(-1, 1, (1, 7, 7, 32)).astype(np.float32)
    w = rng.normal(0, 0.5, (3, 3, 1, 32)).astype(np.float32)
    ref = numpy_ref.depthwise_ref(x, w, 2, None, True)
    got = depthwise_conv_pallas(jnp.asarray(x), jnp.asarray(w), 2, None, True,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-6, rtol=1e-6)
