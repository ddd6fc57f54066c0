"""Lane-packed fused block kernel tests (narrow-channel layers, Cin < 128).

Covers the alpha sweep's early blocks (C = 8..64, BASELINE.json:8) where lane
packing fixes the (8,128)-tile occupancy problem."""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
from mobilenet_tpu.models import mobilenet_v1
from mobilenet_tpu.ops.pallas_block_packed import (
    pack, separable_block_packed, unpack,
)
from mobilenet_tpu.oracle import numpy_ref


def _case(rng, n, h, cin, cout):
    x = rng.uniform(-1, 1, (n, h, h, cin)).astype(np.float32)
    dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
    dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
    pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
    pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
    yp = separable_block_packed(
        pack(jnp.asarray(x), cin), jnp.asarray(dw_w), jnp.asarray(dw_b),
        jnp.asarray(pw_w), jnp.asarray(pw_b), cin, cout, True, interpret=True,
    )
    got = np.asarray(unpack(yp, cout))
    mid = numpy_ref.depthwise_ref(x, dw_w, 1, dw_b, True)
    ref = numpy_ref.pointwise_ref(mid, pw_w, pw_b, True)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "n,h,cin,cout",
    [
        (2, 112, 32, 64),   # alpha=1.0 block 0 (R=4)
        (2, 56, 64, 64),    # R=2
        (2, 16, 8, 16),     # alpha=0.25 block 0 (R=16), single lane group
        (1, 32, 16, 32),    # R=8
        (2, 8, 64, 128),    # R=2, packed -> dense boundary
        (1, 112, 32, 32),   # Cout == Cin
    ],
)
def test_vs_oracle(rng, n, h, cin, cout):
    _case(rng, n, h, cin, cout)


def test_pack_unpack_roundtrip(rng):
    x = rng.uniform(-1, 1, (2, 8, 16, 32)).astype(np.float32)
    xp = pack(jnp.asarray(x), 32)
    assert xp.shape == (2, 8, 4, 128)
    np.testing.assert_array_equal(np.asarray(unpack(xp, 32)), x)


def test_model_uses_packed_for_narrow_blocks():
    """Fused routing at alpha=0.25/128 (all blocks narrow until late) must
    still match the XLA path end-to-end."""
    cfg = ModelConfig(alpha=0.5, resolution=160)
    params = to_device(fold_bn(init_params(cfg, seed=4), eps=cfg.bn_eps))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 160, 160, 3)).astype(np.float32))
    ref = mobilenet_v1.forward(params, x, cfg, dw_backend="xla")
    got = mobilenet_v1.forward(params, x, cfg, dw_backend="fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "n,h,cin,cout",
    [
        (2, 112, 64, 128),  # alpha=1.0 block 1 (R=2)
        (2, 32, 32, 64),    # alpha=0.5 block 1 (R=4)
        (2, 16, 16, 32),    # alpha=0.25 block 1 (R=8)
        (1, 64, 8, 16),     # R=16 stride-2
        (1, 16, 64, 128),   # single row tile (g==1)
    ],
)
def test_packed_s2_vs_oracle(rng, n, h, cin, cout):
    from mobilenet_tpu.ops.pallas_block_packed import separable_block_packed_s2

    x = rng.uniform(-1, 1, (n, h, h, cin)).astype(np.float32)
    dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
    dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
    pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
    pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
    got = np.asarray(unpack(separable_block_packed_s2(
        pack(jnp.asarray(x), cin), jnp.asarray(dw_w), jnp.asarray(dw_b),
        jnp.asarray(pw_w), jnp.asarray(pw_b), cin, cout, True, interpret=True,
    ), cout))
    mid = numpy_ref.depthwise_ref(x, dw_w, 2, dw_b, True)
    ref = numpy_ref.pointwise_ref(mid, pw_w, pw_b, True)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-5)


def test_randomized_valid_shapes_vs_oracle():
    """Sample random valid (n, h, cin, cout) configs for both packed kernels
    and check against the oracle — guards the shape-constraint edges the
    fixed parametrize lists miss."""
    rng = np.random.default_rng(99)
    from mobilenet_tpu.ops.pallas_block_packed import separable_block_packed_s2

    for _ in range(8):
        cin = int(rng.choice([8, 16, 32, 64]))
        r = 128 // cin  # always even for these cin, so stride 2 is legal
        # w*cin % 128 == 0  =>  w % r == 0; keep h == w for simplicity
        h = int(rng.choice([2, 3, 4])) * r
        stride = int(rng.choice([1, 2]))
        factor = r if stride == 1 else r // 2
        cout = (128 // factor) * int(rng.choice([1, 2]))
        n = int(rng.choice([1, 2]))

        x = rng.uniform(-1, 1, (n, h, h, cin)).astype(np.float32)
        dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
        dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
        pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
        pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
        kern = separable_block_packed if stride == 1 else separable_block_packed_s2
        got = np.asarray(unpack(kern(
            pack(jnp.asarray(x), cin), jnp.asarray(dw_w), jnp.asarray(dw_b),
            jnp.asarray(pw_w), jnp.asarray(pw_b), cin, cout, True,
            interpret=True), cout))
        ref = numpy_ref.pointwise_ref(
            numpy_ref.depthwise_ref(x, dw_w, stride, dw_b, True),
            pw_w, pw_b, True)
        np.testing.assert_allclose(
            got, ref, atol=3e-5, rtol=1e-5,
            err_msg=f"n={n} h={h} cin={cin} cout={cout} s={stride}")
