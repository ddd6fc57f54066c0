"""MXU-matmul depthwise packed-block tests (ops/pallas_block_packed_mxu).

Float kernels check against the NumPy oracle (accumulation order differs
from the VPU kernels: dot over banded tap matrices vs sequential FMAs, so a
small f32 tolerance applies). Int8 kernels must be EXACTLY equal to the
reference packed int8 kernel (integer arithmetic is order-independent)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params
from mobilenet_tpu.ops.pallas_block_packed import pack, unpack
from mobilenet_tpu.ops.pallas_block_packed_mxu import (
    build_tap_matrices, separable_block_packed_mxu,
    separable_block_packed_i8_mxu,
)
from mobilenet_tpu.oracle import numpy_ref
from mobilenet_tpu.quant import quantize


@pytest.mark.parametrize(
    "n,h,cin,cout,stride",
    [
        (2, 112, 32, 64, 1),   # alpha=1.0 block 0 (R=4)
        (2, 112, 64, 128, 2),  # alpha=1.0 block 1 (R=2)
        (2, 16, 8, 16, 1),     # R=16, single lane group
        (2, 16, 16, 32, 2),    # alpha=0.25 block 1 (R=8)
        (1, 32, 16, 32, 1),    # R=8
        (1, 64, 8, 16, 2),     # R=16 stride-2
        (2, 8, 64, 128, 1),    # packed -> dense boundary
        (1, 16, 64, 128, 2),   # single row tile (g==1)
        (1, 112, 32, 32, 1),   # Cout == Cin
    ],
)
def test_mxu_float_vs_oracle(rng, n, h, cin, cout, stride):
    x = rng.uniform(-1, 1, (n, h, h, cin)).astype(np.float32)
    dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
    dw_b = rng.normal(0, 0.2, (cin,)).astype(np.float32)
    pw_w = rng.normal(0, 0.3, (cin, cout)).astype(np.float32)
    pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)
    got = np.asarray(unpack(separable_block_packed_mxu(
        pack(jnp.asarray(x), cin), jnp.asarray(dw_w), jnp.asarray(dw_b),
        jnp.asarray(pw_w), jnp.asarray(pw_b), cin, cout, stride, True,
        interpret=True), cout))
    mid = numpy_ref.depthwise_ref(x, dw_w, stride, dw_b, True)
    ref = numpy_ref.pointwise_ref(mid, pw_w, pw_b, True)
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "n,h,cin_blk,stride",
    [
        (2, 16, 0, 1),   # block 0 channel shape (narrow)
        (2, 16, 1, 2),   # block 1 stride-2 shape
        (1, 32, 0, 1),
        (1, 8, 1, 2),    # single row tile
    ],
)
def test_mxu_i8_exact_vs_packed_i8(rng, n, h, cin_blk, stride):
    """MXU int8 packed block == reference packed int8 kernel, bit-for-bit."""
    from mobilenet_tpu.quant.pallas_block_packed_i8 import (
        separable_block_packed_i8,
    )

    cfg = ModelConfig(alpha=0.25, resolution=128)
    folded = fold_bn(init_params(cfg, seed=7), eps=cfg.bn_eps)
    q = quantize(folded, cfg)
    b = q.blocks[cin_blk]
    d, p = b["dw"], b["pw"]
    cin = d.w_i8.shape[-1]
    cout = p.w_i8.shape[-1]
    r = 128 // cin
    if stride == 2 and (r % 2 or ((r // 2) * cout) % 128):
        pytest.skip("shape not packed-s2-compatible")
    xi = rng.integers(-127, 128, (n, h, h, cin)).astype(np.int8)
    args = (jnp.asarray(d.w_i8), jnp.asarray(d.bias_i32), jnp.asarray(d.m),
            jnp.asarray(p.w_i8), jnp.asarray(p.bias_i32), jnp.asarray(p.m),
            cin, cout, stride, float(d.six_q), float(p.six_q), True)
    xp = pack(jnp.asarray(xi), cin)
    ref = np.asarray(separable_block_packed_i8(xp, *args, interpret=True))
    got = np.asarray(separable_block_packed_i8_mxu(xp, *args, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_tap_matrices_reconstruct_dw(rng):
    """The banded tap matrices applied densely (numpy) reproduce the
    depthwise conv exactly (f64): validates the index math independent of
    Pallas."""
    for cin, stride in [(32, 1), (64, 2), (8, 1), (16, 2)]:
        r = 128 // cin
        h = 2 * r
        x = rng.uniform(-1, 1, (1, h, h, cin)).astype(np.float32)
        dw_w = rng.normal(0, 0.5, (3, 3, 1, cin)).astype(np.float32)
        a = np.asarray(build_tap_matrices(
            jnp.asarray(dw_w), cin, r, stride, jnp.float32)).astype(np.float64)

        xp = np.asarray(pack(jnp.asarray(x), cin)).astype(np.float64)
        n_, hh, w4, _ = xp.shape
        # zero-bordered scratch in numpy
        if stride == 1:
            rows = np.pad(xp, ((0, 0), (1, 1), (1, 1), (0, 0)))
            h_out = hh
            out = np.zeros((n_, h_out, w4, 128))
            for dy in range(3):
                for s in range(3):
                    sl = rows[:, dy : dy + h_out, s : s + w4, :]
                    out += sl @ a[dy, s]
        else:
            rows = np.pad(xp, ((0, 0), (0, 2), (0, 1), (0, 0)))
            h_out = hh // 2
            out = np.zeros((n_, h_out, w4, 128))
            for dy in range(3):
                for s in range(2):
                    sl = rows[:, dy : dy + 2 * h_out : 2, s : s + w4, :]
                    out += sl @ a[dy, s]
        ref = numpy_ref.depthwise_ref(x, dw_w, stride)  # no bias/activation
        if stride == 1:
            refp = ref.reshape(n_, h_out, w4, 128)
            np.testing.assert_allclose(out, refp, atol=1e-5)
        else:
            lanes_used = (r // 2) * cin  # rest of the 128 lanes stay zero
            refp = ref.reshape(n_, h_out, w4, lanes_used)
            np.testing.assert_allclose(out[..., :lanes_used], refp, atol=1e-5)
            np.testing.assert_allclose(out[..., lanes_used:], 0.0, atol=0)


def test_model_routing_mxu_flags(monkeypatch):
    """Full fused forward with the MXU-dw flags flipped matches the default
    routing (float: tolerance; int8: exact)."""
    import jax

    from mobilenet_tpu.checkpoints import to_device
    from mobilenet_tpu.models import mobilenet_v1
    from mobilenet_tpu.ops import pallas_block_packed_mxu as pbm
    from mobilenet_tpu.quant import quantize_input
    from mobilenet_tpu.quant.model import _as_device_tree, forward_i8

    cfg = ModelConfig(alpha=0.5, resolution=64)
    folded = fold_bn(init_params(cfg, seed=3), eps=cfg.bn_eps)
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)

    params = to_device(folded)
    ref_f = np.asarray(mobilenet_v1.forward(params, jnp.asarray(x), cfg,
                                            dw_backend="fused"))
    q = quantize(folded, cfg)
    dev = _as_device_tree(q)
    xi = jnp.asarray(quantize_input(x))
    ref_q = np.asarray(jax.jit(
        lambda v: forward_i8(dev, v, cfg, use_fused=True))(xi))

    monkeypatch.setattr(pbm, "DW_MXU_S1_F", True)
    monkeypatch.setattr(pbm, "DW_MXU_S2_F", True)
    monkeypatch.setattr(pbm, "DW_MXU_S1_I8", True)
    monkeypatch.setattr(pbm, "DW_MXU_S2_I8", True)
    got_f = np.asarray(mobilenet_v1.forward(params, jnp.asarray(x), cfg,
                                            dw_backend="fused"))
    got_q = np.asarray(jax.jit(
        lambda v: forward_i8(dev, v, cfg, use_fused=True))(xi))
    np.testing.assert_allclose(got_f, ref_f, atol=1e-4, rtol=1e-3)
    np.testing.assert_array_equal(got_q, ref_q)
