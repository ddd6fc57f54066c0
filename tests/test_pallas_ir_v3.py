"""Fused V3 bottleneck kernel (ops.pallas_ir_v3) vs the XLA ops.

The V3 twin of test_pallas_ir_block.py: k in {3,5} stencils, named
activations (relu / hswish), the IN-KERNEL squeeze-excite gate
(whole-image mode), identity expansion for no-expand blocks, and the
rows mode for the big-spatial non-SE blocks. Interpret tier = sw_emu
(SURVEY.md SS4); the hw twin runs in tools/tpu_smoke.py. The reference
twin is the exact op sequence of forward_v3's xla branch, so agreement
transfers to the model-level V3_TOL oracle gates.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.models.mobilenet_v3 import se_apply
from mobilenet_tpu.ops import conv as ops
from mobilenet_tpu.ops.pallas_ir_v3 import (
    _mode, _pads, v3_block_pallas, v3_fits)


def _ref(x, ew, eb, dww, dwb, pw, pb, se, k, stride, act, residual):
    z = x if ew is None else ops.pointwise_conv(x, ew, bias=eb, act=act)
    zd = ops.depthwise_conv_xla(z, dww, stride, bias=dwb, act=act)
    if se is not None:
        zd = se_apply(zd, se)
    out = ops.pointwise_conv(zd, pw, bias=pb)
    return out + x if residual else out


def _make(rng, n, h, cin, e, cout, k, se_mid, dtype=np.float32):
    x = rng.standard_normal((n, h, h, cin)).astype(dtype) * 0.5
    ew = rng.standard_normal((cin, e)).astype(dtype) * (cin ** -0.5)
    eb = rng.standard_normal((e,)).astype(dtype) * 0.1
    dww = rng.standard_normal((k, k, 1, e)).astype(dtype) * 0.2
    dwb = rng.standard_normal((e,)).astype(dtype) * 0.1
    pw = rng.standard_normal((e, cout)).astype(dtype) * (e ** -0.5)
    pb = rng.standard_normal((cout,)).astype(dtype) * 0.1
    se = None
    if se_mid:
        se = dict(
            w1=rng.standard_normal((e, se_mid)).astype(dtype) * (e ** -0.5),
            b1=rng.standard_normal((se_mid,)).astype(dtype) * 0.1,
            w2=rng.standard_normal((se_mid, e)).astype(dtype) * (
                se_mid ** -0.5),
            b2=rng.standard_normal((e,)).astype(dtype) * 0.1)
    return x, ew, eb, dww, dwb, pw, pb, se


def _run(args, k, stride, act, residual):
    x, ew, eb, dww, dwb, pw, pb, se = [
        jnp.asarray(a) if isinstance(a, np.ndarray) else a for a in args]
    se_kw = {}
    se_j = None
    if se is not None:
        se_j = {kk: jnp.asarray(v) for kk, v in se.items()}
        se_kw = dict(se_w1=se_j["w1"], se_b1=se_j["b1"],
                     se_w2=se_j["w2"], se_b2=se_j["b2"])
    got = v3_block_pallas(x, ew, eb, dww, dwb, pw, pb, k=k, stride=stride,
                          act=act, residual=residual, **se_kw)
    want = _ref(x, ew, eb, dww, dwb, pw, pb, se_j, k, stride, act, residual)
    return np.asarray(got), np.asarray(want)


# every V3-Large/Small shape class: k5 stencils (both strides), SE gates
# with unaligned Se dims, hard-swish, residuals, plus the 960-wide tail.
@pytest.mark.parametrize(
    "n,h,cin,e,cout,k,stride,se_mid,act,residual",
    [
        (2, 14, 64, 384, 64, 3, 1, 0, "relu", True),
        (2, 28, 24, 72, 40, 5, 2, 24, "relu", False),    # blk3-L class
        (2, 14, 40, 120, 40, 5, 1, 32, "relu", True),    # blk4-L: SE + res
        (2, 14, 112, 672, 160, 5, 2, 168, "hswish", False),  # blk12-L
        (2, 8, 160, 960, 160, 5, 1, 240, "hswish", True),    # blk13-L class
        (2, 14, 80, 184, 80, 3, 1, 0, "hswish", True),       # blk8-L
        (2, 9, 48, 144, 48, 5, 1, 40, "hswish", True),       # odd spatial s1
    ],
)
def test_vs_xla_ops(rng, n, h, cin, e, cout, k, stride, se_mid, act,
                    residual):
    args = _make(rng, n, h, cin, e, cout, k, se_mid)
    got, want = _run(args, k, stride, act, residual)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_identity_expand_no_activation(rng):
    """No-expand block 0: the identity expansion must NOT activate — the
    stem's hswish output is negative in places, and clamping it would be
    the V2-idempotency bug class (pallas_ir_block routes block 0 with
    relu6 only because V2 inputs sit in [0, 6]; V3's do not)."""
    x = rng.standard_normal((2, 16, 16, 16)).astype(np.float32)  # signed!
    assert (x < 0).any()
    dww = rng.standard_normal((3, 3, 1, 16)).astype(np.float32) * 0.2
    dwb = rng.standard_normal((16,)).astype(np.float32) * 0.1
    pw = rng.standard_normal((16, 16)).astype(np.float32) * 0.25
    pb = rng.standard_normal((16,)).astype(np.float32) * 0.1
    got = v3_block_pallas(
        jnp.asarray(x), None, None, jnp.asarray(dww), jnp.asarray(dwb),
        jnp.asarray(pw), jnp.asarray(pb), k=3, stride=1, act="relu",
        residual=True)
    want = _ref(jnp.asarray(x), None, None, jnp.asarray(dww),
                jnp.asarray(dwb), jnp.asarray(pw), jnp.asarray(pb), None,
                3, 1, "relu", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)


def test_rows_mode_identity_expand(rng):
    """V3-Large block 0 at 112-squared rides the rows mode (whole-image
    busts VMEM) with the identity expansion."""
    x = rng.standard_normal((1, 112, 112, 16)).astype(np.float32) * 0.5
    dww = rng.standard_normal((3, 3, 1, 16)).astype(np.float32) * 0.2
    dwb = rng.standard_normal((16,)).astype(np.float32) * 0.1
    pw = rng.standard_normal((16, 16)).astype(np.float32) * 0.25
    pb = rng.standard_normal((16,)).astype(np.float32) * 0.1
    assert _mode(1, 112, 112, 16, 16, 16, 3, 1, 0, 4)[0] == "rows"
    got = v3_block_pallas(
        jnp.asarray(x), None, None, jnp.asarray(dww), jnp.asarray(dwb),
        jnp.asarray(pw), jnp.asarray(pb), k=3, stride=1, act="relu",
        residual=True)
    want = _ref(jnp.asarray(x), None, None, jnp.asarray(dww),
                jnp.asarray(dwb), jnp.asarray(pw), jnp.asarray(pb), None,
                3, 1, "relu", True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-5)


def test_rows_mode_expand_hswish(rng):
    """Block-1-L class (112 -> 56 stride 2) in rows mode with an expansion."""
    args = _make(rng, 1, 112, 16, 96, 24, 3, 0)
    assert _mode(1, 112, 112, 16, 96, 24, 3, 2, 0, 4)[0] == "rows"
    got, want = _run(args, 3, 2, "relu", False)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_bf16_close(rng):
    args32 = _make(rng, 2, 14, 40, 120, 40, 5, 32)
    args = tuple(
        jnp.asarray(a, jnp.bfloat16) if isinstance(a, np.ndarray)
        else ({kk: jnp.asarray(v, jnp.bfloat16) for kk, v in a.items()}
              if a is not None else None)
        for a in args32)
    x, ew, eb, dww, dwb, pw, pb, se = args
    got = np.asarray(v3_block_pallas(
        x, ew, eb, dww, dwb, pw, pb, k=5, stride=1, act="hswish",
        residual=True, se_w1=se["w1"], se_b1=se["b1"], se_w2=se["w2"],
        se_b2=se["b2"]), np.float32)
    want = np.asarray(_ref(
        *(jnp.asarray(a) for a in args32[:7]),
        {kk: jnp.asarray(v) for kk, v in args32[7].items()},
        5, 1, "hswish", True))
    assert np.abs(got - want).max() < 0.15  # bf16 kernel-tolerance class


def test_pads_same_geometry():
    # TF-SAME for odd k: s1 splits k-1 evenly; s2 (even input) pads k-2
    # with the extra row at the BOTTOM (lo = (k-2)//2).
    assert _pads(3, 1) == (1, 1)
    assert _pads(5, 1) == (2, 2)
    assert _pads(3, 2) == (0, 1)
    assert _pads(5, 2) == (1, 2)


def test_mode_selection_v3_large_224():
    # The V3-Large 1.0-224 grid at batch 256 bf16: SE blocks take
    # whole-image tiles (in-kernel SE needs the full spatial extent);
    # the 112-squared blocks 0-1 (no SE) take rows mode; block 2's
    # 56-squared whole-image tile FITS at ep=128 (V2's 56-squared twin
    # needed rows only because its e=144 padded to 256).
    assert _mode(256, 112, 112, 16, 16, 16, 3, 1, 0, 2)[0] == "rows"
    assert _mode(256, 112, 112, 16, 64, 24, 3, 2, 0, 2)[0] == "rows"
    assert _mode(256, 56, 56, 24, 72, 24, 3, 1, 0, 2)[0] == "whole"
    assert _mode(256, 56, 56, 24, 72, 40, 5, 2, 24, 2)[0] == "whole"
    assert _mode(256, 28, 28, 40, 120, 40, 5, 1, 32, 2)[0] == "whole"
    # Block 12 (14 -> 7 s2): the %8 sublane rule forces bn=8 (49 output
    # rows) and that tile busts VMEM — the wpad mode pads w_out 7->8 so
    # bn follows the input-rows constraint alone (bn=2). The bf16 MODEL
    # routing excludes wpad (allow_wpad=False — XLA's MXU convs measured
    # faster there); the int8 route keeps it (v3_fits docstring).
    assert _mode(256, 14, 14, 112, 672, 160, 5, 2, 168, 2) == (
        "wpad", (2, 8))
    assert not v3_fits(256, 14, 14, 112, 672, 160, 5, 2, 168, 2,
                       allow_wpad=False)
    assert v3_fits(256, 14, 14, 112, 672, 160, 5, 2, 168, 2)
    assert v3_fits(1, 14, 14, 112, 672, 160, 5, 2, 168, 2,
                   allow_wpad=False)
    assert _mode(256, 7, 7, 160, 960, 160, 5, 1, 240, 2)[0] == "whole"
    # V3-Small block 0 at 224: SE at 112-squared — whole busts VMEM and
    # rows mode can't host the gate's global pool -> xla fallback.
    assert not v3_fits(256, 112, 112, 16, 16, 16, 3, 2, 8, 2)
    # ... but at 96 the 48-squared whole-image tile fits.
    assert v3_fits(256, 48, 48, 16, 16, 16, 3, 2, 8, 2)


def test_model_fused_matches_xla():
    """forward_v3 fused vs xla logits across variants (f32, CPU interpret)."""
    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3

    rng = np.random.default_rng(7)
    for variant, mini in (("small", False), ("large", False),
                          ("large", True)):
        cfg = V3Config(variant=variant, alpha=1.0, resolution=96,
                       minimalistic=mini)
        folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
        x = jnp.asarray(rng.uniform(-1, 1, (2, 96, 96, 3)), jnp.float32)
        ref = forward_v3(folded, x, cfg, dw_backend="xla")
        got = forward_v3(folded, x, cfg, dw_backend="fused")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-3, rtol=1e-3)


def test_se_padding_exactness(rng):
    """Padded expanded lanes must stay EXACTLY zero through the SE gate:
    sw2's padded columns are zero, so padded gate lanes are hsigmoid(0) =
    0.5 — multiplying the all-zero padded activations (docstring
    argument). e=72 pads to 128, so a third of lanes exercise this."""
    args = _make(rng, 1, 8, 24, 72, 40, 5, 24)
    got, want = _run(args, 5, 1, "relu", False)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


def test_residual_requires_matching_channels(rng):
    args = _make(rng, 1, 8, 32, 192, 64, 3, 0)[:7]
    with pytest.raises(AssertionError):
        v3_block_pallas(*(jnp.asarray(a) for a in args), k=3, stride=1,
                        act="relu", residual=True)
