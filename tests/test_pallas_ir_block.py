"""Fused inverted-residual kernel (ops.pallas_ir_block) vs the XLA ops.

The kernel is V2's whole-block Pallas path (expand -> dw -> linear project
-> residual in one call, expanded tensor never in HBM). Interpret tier =
sw_emu (SURVEY.md SS4); the hw twin runs in tools/tpu_smoke.py. The
reference twin here is the exact op sequence of forward_v2's xla branch,
so agreement transfers to the model-level oracle gates.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.ops import conv as ops
from mobilenet_tpu.ops.pallas_ir_block import (
    _mode, _pick_bn, inverted_residual_pallas, ir_fits)


def _ref(x, ew, eb, dww, dwb, pw, pb, stride, residual):
    z = ops.pointwise_conv(x, ew, bias=eb, relu6=True)
    zd = ops.depthwise_conv_xla(z, dww, stride, bias=dwb, relu6=True)
    out = ops.pointwise_conv(zd, pw, bias=pb, relu6=None)
    return out + x if residual else out


def _make(rng, n, h, cin, e, cout, dtype=np.float32):
    x = rng.standard_normal((n, h, h, cin)).astype(dtype) * 0.5
    ew = rng.standard_normal((cin, e)).astype(dtype) * (cin ** -0.5)
    eb = rng.standard_normal((e,)).astype(dtype) * 0.1
    dww = rng.standard_normal((3, 3, 1, e)).astype(dtype) * 0.2
    dwb = rng.standard_normal((e,)).astype(dtype) * 0.1
    pw = rng.standard_normal((e, cout)).astype(dtype) * (e ** -0.5)
    pb = rng.standard_normal((cout,)).astype(dtype) * 0.1
    return x, ew, eb, dww, dwb, pw, pb


# every shape class of the V2 grid: unaligned Cin/E/Cout, both strides,
# residual and not, odd spatial (s1), plus an already-aligned E.
@pytest.mark.parametrize(
    "n,h,cin,e,cout,stride,residual",
    [
        (2, 14, 64, 384, 64, 1, True),     # E already 128-aligned
        (2, 14, 96, 576, 160, 2, False),   # E pads 576->640
        (2, 7, 160, 960, 320, 1, False),   # the Mosaic-rejected width
        (1, 8, 160, 960, 160, 1, True),
        (2, 28, 24, 144, 32, 2, False),    # E nearly doubles (144->256)
        (2, 16, 16, 96, 24, 2, False),     # tiny channels
        (2, 9, 64, 384, 96, 1, False),     # odd spatial, stride 1
    ],
)
def test_vs_xla_ops(rng, n, h, cin, e, cout, stride, residual):
    args = _make(rng, n, h, cin, e, cout)
    got = inverted_residual_pallas(*args, stride, residual)
    want = _ref(*args, stride, residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)


def test_bf16_close(rng):
    args32 = _make(rng, 2, 14, 96, 576, 96, np.float32)
    args = tuple(jnp.asarray(a, jnp.bfloat16) for a in args32)
    got = np.asarray(inverted_residual_pallas(*args, 1, True), np.float32)
    want = np.asarray(_ref(*args32, 1, True))
    assert got.dtype == np.float32 and got.shape == want.shape
    assert np.abs(got - want).max() < 0.15  # bf16 kernel-tolerance class


def test_block_n_override_and_autopick(rng):
    # e=384 keeps the f32 whole-image estimate under the cap (960 would
    # bust it at itemsize 4 — the bf16 production shape fits, test_mode_*).
    args = _make(rng, 8, 7, 160, 384, 320, np.float32)
    base = np.asarray(inverted_residual_pallas(*args, 1, False))
    for bn in (1, 2, 8):
        got = np.asarray(inverted_residual_pallas(*args, 1, False, block_n=bn))
        np.testing.assert_allclose(got, base, atol=2e-5, rtol=1e-5)
    # small-spatial blocks batch-tile toward ~1024 MXU rows
    assert _pick_bn(256, 7, 7, 160, 1024, 320, 1, 2) > 1
    assert _pick_bn(256, 56, 56, 24, 256, 32, 2, 2) == 1
    # 7-squared output rows (49) violate the %8 sublane rule below bn=8:
    # the picker must never choose an illegal tile (Pallas TPU lowering
    # requires block rows % 8 == 0 unless the block IS the array).
    assert _pick_bn(256, 7, 7, 160, 1024, 320, 1, 2) % 8 == 0
    assert _pick_bn(3, 7, 7, 160, 1024, 320, 1, 2) == 3  # bn==n is legal


def test_mode_selection_across_the_v2_grid():
    # 1.0-224 batch 256: small-spatial blocks take whole-image tiles; the
    # 112/56-squared blocks (whole-image tile busts VMEM) take the
    # row-tiled mode — before it existed they fell to xla and held 51.6 of
    # V2's 62.4 ms/batch (tools/prefix_attr.py --model v2, v5e).
    assert _mode(256, 14, 14, 64, 384, 64, 1, 2)[0] == "whole"
    assert _mode(256, 7, 7, 160, 960, 320, 1, 2)[0] == "whole"
    assert _mode(256, 112, 112, 16, 96, 24, 2, 2)[0] == "rows"
    assert _mode(256, 112, 112, 32, 32, 16, 1, 2)[0] == "rows"
    assert _mode(256, 56, 56, 24, 144, 24, 1, 2)[0] == "rows"
    assert ir_fits(1, 14, 14, 96, 576, 160, 2, 2)  # batch 1: bn==n, fits
    # blk13 (14->7 s2) is forced to bn=8 by the sublane rule and its
    # whole-image estimate exceeds the cap; rows can't tile h_out=7 -> xla
    assert not ir_fits(256, 14, 14, 96, 576, 160, 2, 2)
    # odd spatial at stride 2 is never eligible (TF-SAME even contract)
    assert not ir_fits(256, 15, 15, 96, 576, 160, 2, 2)


@pytest.mark.parametrize(
    "n,h,cin,e,cout,stride,residual",
    [
        (2, 112, 32, 32, 16, 1, False),   # block0 shape (identity-exp class)
        (2, 112, 16, 96, 24, 2, False),   # block1
        (2, 56, 24, 144, 24, 1, True),    # block2: residual across row tiles
        (1, 48, 24, 144, 24, 1, True),    # g=3 interior-tile residual path
    ],
)
def test_rows_mode_vs_xla_ops(rng, n, h, cin, e, cout, stride, residual):
    args = _make(rng, n, h, cin, e, cout)
    assert _mode(n, h, h, cin, e, cout, stride, 4)[0] == "rows"
    got = inverted_residual_pallas(*args, stride, residual)
    want = _ref(*args, stride, residual)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)


def test_packed_linear_projection_mode(rng):
    """Block 0's lane-packed route: packed dw + LINEAR (pw_epilogue=False)
    projection with the pad_block0_v2 Cout padding, vs the XLA ops."""
    from mobilenet_tpu.ops.pallas_block_packed import (
        pack, separable_block_packed, unpack)

    n, h, cin, cout = 2, 16, 32, 16
    x = np.clip(rng.uniform(0, 6, (n, h, h, cin)), 0, 6).astype(np.float32)
    dww = rng.normal(0, 0.3, (3, 3, 1, cin)).astype(np.float32)
    dwb = rng.normal(0, 0.1, (cin,)).astype(np.float32)
    pw = rng.normal(0, cin ** -0.5, (cin, cout)).astype(np.float32)
    pb = rng.normal(0, 0.1, (cout,)).astype(np.float32)
    coutp = 32
    pw_p = np.pad(pw, ((0, 0), (0, coutp - cout)))
    pb_p = np.pad(pb, (0, coutp - cout))
    got = unpack(separable_block_packed(
        pack(jnp.asarray(x), cin), jnp.asarray(dww), jnp.asarray(dwb),
        jnp.asarray(pw_p), jnp.asarray(pb_p), cin, coutp, True,
        pw_epilogue=False), coutp)
    want = ops.pointwise_conv(
        ops.depthwise_conv_xla(jnp.asarray(x), jnp.asarray(dww), 1,
                               bias=jnp.asarray(dwb), relu6=True),
        jnp.asarray(pw), bias=jnp.asarray(pb), relu6=None)
    got = np.asarray(got)
    np.testing.assert_allclose(got[..., :cout], np.asarray(want),
                               atol=2e-5, rtol=1e-5)
    assert np.abs(got[..., cout:]).max() == 0.0  # padded lanes stay zero


def test_pad_block0_v2_model_equivalence(rng):
    """Padded fused tree vs unpadded xla tree: logits must agree within the
    V2 gate (padding itself is exact; kernels carry bf16-class tolerance)."""
    from mobilenet_tpu.checkpoints.padding import pad_block0_v2
    from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
    from mobilenet_tpu.models.mobilenet_v2 import V2Config, forward_v2

    cfg = V2Config(alpha=1.0, resolution=96)
    folded = fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps)
    padded = pad_block0_v2(folded)
    assert padded["blocks"][0]["prj"]["w"].shape[1] == 32
    assert padded["blocks"][1]["exp"]["w"].shape[0] == 32
    x = jnp.asarray(rng.uniform(-1, 1, (2, 96, 96, 3)), jnp.float32)
    ref = forward_v2(folded, x, cfg, dw_backend="xla")
    got = forward_v2(padded, x, cfg, dw_backend="fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_residual_requires_matching_channels(rng):
    args = _make(rng, 1, 8, 32, 192, 64, np.float32)
    with pytest.raises(AssertionError):
        inverted_residual_pallas(*args, 1, True)
