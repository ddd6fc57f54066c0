"""Fused expand + dw3x3-s2 + projection kernel vs the NumPy oracle.

Covers the narrow stride-2 expand blocks (V3-Large block 1 geometry: Cin=16,
E=64 at 112p — the fattest bf16 segment after the 2026-08-19 packed campaign,
benchmarks/roofline_v5e.md) plus the eligibility grid edges: single/multi
grid step (border masks), R=2 (no odd discard ambiguity), relu6, and the
pw_epilogue (V1 separable-block) mode.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mobilenet_tpu.ops.pallas_block_packed import pack
from mobilenet_tpu.ops.pallas_expand_s2 import (
    expand_block_packed_s2, expand_s2_eligible,
)
from mobilenet_tpu.oracle import numpy_ref


def _oracle(x, exp_w, exp_b, dw_w, dw_b, pw_w, pw_b, relu6, pw_epilogue):
    z = numpy_ref.pointwise_ref(x, exp_w, exp_b, relu6)
    mid = numpy_ref.depthwise_ref(z, dw_w, 2, dw_b, relu6)
    return numpy_ref.pointwise_ref(
        mid, pw_w, pw_b, relu6 if pw_epilogue else None)


def _case(rng, n, h, cin, e, cout, relu6=False, pw_epilogue=False,
          block_h=None):
    x = rng.uniform(-1, 1, (n, h, h, cin)).astype(np.float32)
    exp_w = rng.normal(0, 0.4, (cin, e)).astype(np.float32)
    exp_b = rng.normal(0, 0.2, (e,)).astype(np.float32)
    dw_w = rng.normal(0, 0.5, (3, 3, 1, e)).astype(np.float32)
    dw_b = rng.normal(0, 0.2, (e,)).astype(np.float32)
    pw_w = rng.normal(0, 0.3, (e, cout)).astype(np.float32)
    pw_b = rng.normal(0, 0.2, (cout,)).astype(np.float32)

    assert expand_s2_eligible(cin, e, cout, h)
    got = expand_block_packed_s2(
        pack(jnp.asarray(x), cin), jnp.asarray(exp_w), jnp.asarray(exp_b),
        jnp.asarray(dw_w), jnp.asarray(dw_b), jnp.asarray(pw_w),
        jnp.asarray(pw_b), cin, relu6, pw_epilogue=pw_epilogue,
        block_h=block_h, interpret=True,
    )
    got = np.asarray(got).reshape(n, h // 2, h // 2, cout)
    ref = _oracle(x, exp_w, exp_b, dw_w, dw_b, pw_w, pw_b, relu6, pw_epilogue)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "n,h,cin,e,cout",
    [
        (1, 16, 16, 64, 32),    # V3-L block 1 geometry (R=8), small image
        (2, 32, 16, 64, 32),    # same, batch 2, multi grid step
        (1, 16, 64, 128, 128),  # R=2: EE=128, no structural zeros
        (2, 16, 32, 64, 64),    # R=4
        (1, 32, 8, 32, 16),     # R=16, deep packing
        (1, 16, 16, 96, 32),    # V3-Small b1 e-padded geometry (EE=384)
    ],
)
def test_vs_oracle(rng, n, h, cin, e, cout):
    _case(rng, n, h, cin, e, cout)


def test_relu6_and_epilogue(rng):
    _case(rng, 1, 16, 16, 64, 32, relu6=True, pw_epilogue=True)


def test_multi_grid_border_masks(rng):
    """Force g > 1 with a small row tile so the last-step row mask and the
    delta=2 tap's column fixup are both exercised."""
    _case(rng, 1, 32, 16, 64, 32, block_h=4)
    _case(rng, 2, 16, 64, 128, 128, block_h=2)


def test_i8_fused_kernel_exact_vs_ops():
    """expand_block_packed_s2_i8 alone vs the quant/v3 XLA ops sequence
    (expand requant -> dw requant -> linear prj requant) — EXACT int8
    contract, bit-for-bit."""
    import jax.numpy as jnp

    from mobilenet_tpu.ops.pallas_block_packed import pack
    from mobilenet_tpu.quant.pallas_expand_s2_i8 import (
        expand_block_packed_s2_i8)
    from mobilenet_tpu.quant.v3 import (_dwk_acc_dev, _pw_acc_dev,
                                        _requant_named_dev)

    rng = np.random.default_rng(5)
    cin, e, cout, h, w = 16, 64, 32, 16, 16
    x_q = rng.integers(-128, 128, (2, h, w, cin)).astype(np.int8)
    exp_w = rng.integers(-127, 128, (cin, e)).astype(np.int8)
    exp_b = rng.integers(-1000, 1000, (e,)).astype(np.int32)
    exp_a = (rng.uniform(0.5, 2.0, (e,)) * 1e-3).astype(np.float32)
    dw_w = rng.integers(-127, 128, (3, 3, 1, e)).astype(np.int8)
    dw_b = rng.integers(-1000, 1000, (e,)).astype(np.int32)
    dw_a = (rng.uniform(0.5, 2.0, (e,)) * 1e-3).astype(np.float32)
    pw_w = rng.integers(-127, 128, (e, cout)).astype(np.int8)
    pw_b = rng.integers(-1000, 1000, (cout,)).astype(np.int32)
    pw_a = (rng.uniform(0.5, 2.0, (cout,)) * 1e-3).astype(np.float32)
    e_inv, d_inv, p_inv = 29.0, 37.0, 53.0

    z = _requant_named_dev(
        _pw_acc_dev(jnp.asarray(x_q), jnp.asarray(exp_w),
                    jnp.asarray(exp_b)),
        jnp.asarray(exp_a), e_inv, "relu")
    z = _requant_named_dev(
        _dwk_acc_dev(z, jnp.asarray(dw_w), 2, 3) + jnp.asarray(dw_b),
        jnp.asarray(dw_a), d_inv, "relu")
    want = _requant_named_dev(
        _pw_acc_dev(z, jnp.asarray(pw_w), jnp.asarray(pw_b)),
        jnp.asarray(pw_a), p_inv, "linear")

    xp = pack(jnp.asarray(x_q).astype(jnp.bfloat16), cin)
    got = expand_block_packed_s2_i8(
        xp, jnp.asarray(exp_w), jnp.asarray(exp_b), jnp.asarray(exp_a),
        jnp.asarray(dw_w), jnp.asarray(dw_b), jnp.asarray(dw_a),
        jnp.asarray(pw_w), jnp.asarray(pw_b), jnp.asarray(pw_a),
        cin, "relu", e_inv, d_inv, p_inv, out_dtype="int8")
    got = np.asarray(got).reshape(2, h // 2, w // 2, cout)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_i8_fused_kernel_exact_multi_grid():
    """Multi-grid-step tiles (border masks) keep the EXACT contract."""
    import jax.numpy as jnp

    from mobilenet_tpu.ops.pallas_block_packed import pack
    from mobilenet_tpu.quant.pallas_expand_s2_i8 import (
        expand_block_packed_s2_i8)
    from mobilenet_tpu.quant.v3 import (_dwk_acc_dev, _pw_acc_dev,
                                        _requant_named_dev)

    rng = np.random.default_rng(11)
    cin, e, cout, h, w = 16, 64, 32, 32, 16
    x_q = rng.integers(-128, 128, (1, h, w, cin)).astype(np.int8)
    exp_w = rng.integers(-127, 128, (cin, e)).astype(np.int8)
    exp_b = rng.integers(-500, 500, (e,)).astype(np.int32)
    exp_a = (rng.uniform(0.5, 2.0, (e,)) * 1e-3).astype(np.float32)
    dw_w = rng.integers(-127, 128, (3, 3, 1, e)).astype(np.int8)
    dw_b = rng.integers(-500, 500, (e,)).astype(np.int32)
    dw_a = (rng.uniform(0.5, 2.0, (e,)) * 1e-3).astype(np.float32)
    pw_w = rng.integers(-127, 128, (e, cout)).astype(np.int8)
    pw_b = rng.integers(-500, 500, (cout,)).astype(np.int32)
    pw_a = (rng.uniform(0.5, 2.0, (cout,)) * 1e-3).astype(np.float32)

    z = _requant_named_dev(
        _pw_acc_dev(jnp.asarray(x_q), jnp.asarray(exp_w),
                    jnp.asarray(exp_b)),
        jnp.asarray(exp_a), 29.0, "relu")
    z = _requant_named_dev(
        _dwk_acc_dev(z, jnp.asarray(dw_w), 2, 3) + jnp.asarray(dw_b),
        jnp.asarray(dw_a), 37.0, "relu")
    want = _requant_named_dev(
        _pw_acc_dev(z, jnp.asarray(pw_w), jnp.asarray(pw_b)),
        jnp.asarray(pw_a), 53.0, "linear")

    xp = pack(jnp.asarray(x_q).astype(jnp.bfloat16), cin)
    got = expand_block_packed_s2_i8(
        xp, jnp.asarray(exp_w), jnp.asarray(exp_b), jnp.asarray(exp_a),
        jnp.asarray(dw_w), jnp.asarray(dw_b), jnp.asarray(dw_a),
        jnp.asarray(pw_w), jnp.asarray(pw_b), jnp.asarray(pw_a),
        cin, "relu", 29.0, 37.0, 53.0, out_dtype="int8", block_h=4)
    got = np.asarray(got).reshape(1, h // 2, w // 2, cout)
    np.testing.assert_array_equal(got, np.asarray(want))


def test_i8_eo_expand_bit_identical():
    """The int8 twin's even/odd split expansion (one matmul + ONE named
    requant pass + an E-lane roll of exact integers) is BIT-IDENTICAL to
    the per-tap route."""
    import jax.numpy as jnp

    from mobilenet_tpu.quant.pallas_expand_s2_i8 import (
        expand_block_packed_s2_i8)

    rng = np.random.default_rng(19)
    for (n, h, cin, e, cout, bh) in [(2, 16, 16, 64, 32, None),
                                     (1, 32, 16, 64, 32, 4),
                                     (1, 16, 64, 128, 128, None)]:
        x_q = rng.integers(-128, 128, (n, h, h, cin)).astype(np.int8)
        args = (
            pack(jnp.asarray(x_q).astype(jnp.bfloat16), cin),
            jnp.asarray(rng.integers(-127, 128, (cin, e)).astype(np.int8)),
            jnp.asarray(rng.integers(-1000, 1000, (e,)).astype(np.int32)),
            jnp.asarray((rng.uniform(0.5, 2, (e,)) * 1e-3).astype(
                np.float32)),
            jnp.asarray(rng.integers(-127, 128, (3, 3, 1, e)).astype(
                np.int8)),
            jnp.asarray(rng.integers(-1000, 1000, (e,)).astype(np.int32)),
            jnp.asarray((rng.uniform(0.5, 2, (e,)) * 1e-3).astype(
                np.float32)),
            jnp.asarray(rng.integers(-127, 128, (e, cout)).astype(np.int8)),
            jnp.asarray(rng.integers(-1000, 1000, (cout,)).astype(
                np.int32)),
            jnp.asarray((rng.uniform(0.5, 2, (cout,)) * 1e-3).astype(
                np.float32)),
            cin, "relu", 29.0, 37.0, 53.0)
        kw = dict(out_dtype="int8", block_h=bh, interpret=True)
        base = np.asarray(expand_block_packed_s2_i8(*args, **kw, eo=False))
        new = np.asarray(expand_block_packed_s2_i8(*args, **kw, eo=True))
        np.testing.assert_array_equal(base, new)


def test_i8_fused_route_taken_and_bit_identical(monkeypatch):
    """FUSED_EXPAND_S2_I8 fires at Large-96 (block 1) and the logits stay
    BIT-IDENTICAL to the XLA int8 route. The knob ships OFF (measured loss
    e2e on v5e — quant/v3.py comment); force it on to guard the kernel's
    route-level exactness."""
    import jax.numpy as jnp

    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.quant import pallas_expand_s2_i8 as pei
    from mobilenet_tpu.quant import v3 as qv3
    from mobilenet_tpu.quant.quantize import quantize_input
    from mobilenet_tpu.quant.v3 import (_as_device_tree_v3, forward_v3_i8,
                                        quantize_v3)

    monkeypatch.setattr(qv3, "FUSED_EXPAND_S2_I8", True)
    cfg = V3Config(variant="large", alpha=1.0, resolution=96)
    folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    dev = _as_device_tree_v3(quantize_v3(folded, cfg, n_calib=4))
    rng = np.random.default_rng(13)
    x = rng.uniform(-1, 1, (2, 96, 96, 3)).astype(np.float32) * 0.5
    x_i8 = jnp.asarray(quantize_input(x))
    calls = []
    orig = pei.expand_block_packed_s2_i8
    monkeypatch.setattr(
        pei, "expand_block_packed_s2_i8",
        lambda *a, **k: (calls.append(a[0].shape), orig(*a, **k))[1])
    lf = np.asarray(forward_v3_i8(dev, x_i8, cfg, use_fused=True))
    assert calls, "fused int8 expand-s2 route was not taken at Large-96"
    lx = np.asarray(forward_v3_i8(dev, x_i8, cfg))
    np.testing.assert_array_equal(lx, lf)


def test_pad_override_keeps_model_output(monkeypatch):
    """FUSED_EXPAND_S2_PAD=128 (the wide downstream-geometry variant) pads
    with zero cols only — the model output must match the minimal-padding
    default bitwise in f32 interpret mode (same op order, zeros exact)."""
    import jax.numpy as jnp

    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models import mobilenet_v3 as mod_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3

    cfg = V3Config(variant="large", alpha=1.0, resolution=96,
                   compute_dtype="float32")
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 96, 96, 3)).astype(np.float32))
    base = forward_v3(params, x, cfg, dw_backend="fused")
    monkeypatch.setattr(mod_v3, "FUSED_EXPAND_S2_PAD", 128)
    wide = forward_v3(params, x, cfg, dw_backend="fused")
    np.testing.assert_allclose(np.asarray(wide), np.asarray(base),
                               atol=5e-5, rtol=1e-4)


@pytest.mark.parametrize(
    "n,h,cin,e,cout,block_h",
    [
        (1, 16, 16, 64, 32, None),   # V3-L b1 geometry (R=8)
        (1, 16, 64, 128, 128, None),  # R=2: delta-2 tap = whole next column
        (1, 32, 8, 32, 16, None),    # R=16, deep packing
        (1, 32, 16, 64, 32, 4),      # multi grid step: border masks
    ],
)
def test_eo_expand_bit_identical(rng, n, h, cin, e, cout, block_h):
    """The even/odd split expansion (eo=True: one (128, 2*EE) matmul + a
    lane roll for the delta-2 tap) is BIT-IDENTICAL to the per-tap route:
    the shift is a pixel permutation and the kron'd matmuls accumulate
    the same 16 products in the same K order."""
    x = rng.uniform(-1, 1, (n, h, h, cin)).astype(np.float32)
    ew = rng.normal(0, 0.4, (cin, e)).astype(np.float32)
    eb = rng.normal(0, 0.2, (e,)).astype(np.float32)
    dw = rng.normal(0, 0.5, (3, 3, 1, e)).astype(np.float32)
    db = rng.normal(0, 0.2, (e,)).astype(np.float32)
    pw = rng.normal(0, 0.3, (e, cout)).astype(np.float32)
    pb = rng.normal(0, 0.2, (cout,)).astype(np.float32)
    args = (pack(jnp.asarray(x), cin), jnp.asarray(ew), jnp.asarray(eb),
            jnp.asarray(dw), jnp.asarray(db), jnp.asarray(pw),
            jnp.asarray(pb), cin)
    base = np.asarray(expand_block_packed_s2(
        *args, block_h=block_h, interpret=True, eo=False))
    new = np.asarray(expand_block_packed_s2(
        *args, block_h=block_h, interpret=True, eo=True))
    np.testing.assert_array_equal(base, new)


def test_epad_route_fires_v3small(monkeypatch):
    """E-padding (72 -> 96 zero cols/taps/rows — exact) makes V3-Small
    block 1 eligible for the fused expand-s2 kernel; the route must fire
    and match the xla route within the f32 reassociation class."""
    import jax.numpy as jnp

    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3
    from mobilenet_tpu.ops import pallas_expand_s2 as pes

    cfg = V3Config(variant="small", alpha=1.0, resolution=96,
                   compute_dtype="float32")
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 96, 96, 3)).astype(np.float32))
    calls = []
    orig = pes.expand_block_packed_s2
    monkeypatch.setattr(
        pes, "expand_block_packed_s2",
        lambda *a, **k: (calls.append(tuple(a[1].shape)), orig(*a, **k))[1])
    fused = np.asarray(forward_v3(params, x, cfg, dw_backend="fused"))
    assert (16, 96) in calls, calls  # exp_w padded 72 -> 96
    xla = np.asarray(forward_v3(params, x, cfg, dw_backend="xla"))
    np.testing.assert_allclose(fused, xla, atol=5e-5, rtol=1e-4)
    assert (fused.argmax(1) == xla.argmax(1)).all()


def test_eligibility():
    assert expand_s2_eligible(16, 64, 32, 112)      # V3-L b1 (padded cout)
    assert not expand_s2_eligible(16, 64, 24, 112)  # unpadded cout: 4*24=96
    assert not expand_s2_eligible(24, 64, 32, 112)  # 128 % 24 != 0
    assert not expand_s2_eligible(128, 256, 128, 7)  # not narrow
    assert not expand_s2_eligible(16, 60, 32, 112)  # EE=240 not lane-aligned


def test_v2_i8_fused_route_blocks_knob(monkeypatch):
    """The V2 int8 fused expand-s2 route: at 96 res (dw-input H=48) the
    shipped MIN_H=96 gate keeps it OFF (measured loss below H=96 on v5e);
    with the gate lowered, blocks=None fires b1+b3 and the shipped
    blocks={1} default fires b1 only (b3's cout padding ripple measured a
    loss both dtypes). Every variant stays BIT-IDENTICAL to the XLA int8
    route."""
    import jax.numpy as jnp

    from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
    from mobilenet_tpu.models.mobilenet_v2 import V2Config
    from mobilenet_tpu.quant import pallas_expand_s2_i8 as pei
    from mobilenet_tpu.quant import v2 as qv2
    from mobilenet_tpu.quant.quantize import quantize_input
    from mobilenet_tpu.quant.v2 import (_as_device_tree_v2, forward_v2_i8,
                                        quantize_v2)

    cfg = V2Config(alpha=1.0, resolution=96)
    folded = fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps)
    dev = _as_device_tree_v2(quantize_v2(folded, cfg, n_calib=4))
    rng = np.random.default_rng(17)
    x_i8 = jnp.asarray(quantize_input(
        rng.uniform(-1, 1, (2, 96, 96, 3)).astype(np.float32)))
    lx = np.asarray(forward_v2_i8(dev, x_i8, cfg))

    calls = []
    orig = pei.expand_block_packed_s2_i8
    monkeypatch.setattr(
        pei, "expand_block_packed_s2_i8",
        lambda *a, **k: (calls.append(a[0].shape), orig(*a, **k))[1])

    assert qv2.FUSED_EXPAND_S2_I8_MIN_H == 96  # shipped measured crossover
    lf = np.asarray(forward_v2_i8(dev, x_i8, cfg, use_fused=True))
    assert not calls, f"H=48 < MIN_H must not fire, fired {calls}"
    np.testing.assert_array_equal(lx, lf)

    monkeypatch.setattr(qv2, "FUSED_EXPAND_S2_I8_MIN_H", 0)
    monkeypatch.setattr(qv2, "FUSED_EXPAND_S2_I8_BLOCKS", None)
    lf2 = np.asarray(forward_v2_i8(dev, x_i8, cfg, use_fused=True))
    assert len(calls) == 2, f"blocks=None must fire b1+b3, fired {calls}"
    np.testing.assert_array_equal(lx, lf2)

    calls.clear()
    monkeypatch.setattr(qv2, "FUSED_EXPAND_S2_I8_BLOCKS", frozenset({1}))
    lf3 = np.asarray(forward_v2_i8(dev, x_i8, cfg, use_fused=True))
    assert len(calls) == 1, f"blocks={{1}} must fire b1 only, fired {calls}"
    np.testing.assert_array_equal(lx, lf3)


def test_fastmask_bit_identical_bf16(rng):
    """The masked-bias border formulation (FASTMASK, shipped OFF after the
    2026-08-20 wash race — module docstring) must stay bit-identical to
    the where-based path, incl. multi-grid border steps."""
    from mobilenet_tpu.ops.pallas_block_packed import pack
    from mobilenet_tpu.ops.pallas_expand_s2 import expand_block_packed_s2

    for (cin, e, cout, h, w, bh) in [(16, 96, 32, 16, 16, None),
                                     (16, 64, 32, 32, 16, 4),
                                     (32, 128, 64, 8, 8, 2)]:
        x = jnp.asarray(rng.standard_normal((2, h, w, cin)), jnp.float32)
        xp = pack(x, cin)
        ew = jnp.asarray(rng.standard_normal((cin, e)) * 0.3, jnp.float32)
        eb = jnp.asarray(rng.standard_normal((e,)), jnp.float32)
        dw = jnp.asarray(rng.standard_normal((3, 3, 1, e)) * 0.3, jnp.float32)
        db = jnp.asarray(rng.standard_normal((e,)), jnp.float32)
        pw = jnp.asarray(rng.standard_normal((e, cout)) * 0.3, jnp.float32)
        pb = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        for relu6 in (False, True):
            a = expand_block_packed_s2(xp, ew, eb, dw, db, pw, pb, cin,
                                       relu6, block_h=bh, fastmask=False)
            b = expand_block_packed_s2(xp, ew, eb, dw, db, pw, pb, cin,
                                       relu6, block_h=bh, fastmask=True)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fastmask_bit_identical_i8():
    """Same identity on the int8 twin: masked bias -> exact post-requant
    zeros (every named requant fixes 0), all acts."""
    import jax.numpy as jnp

    from mobilenet_tpu.ops.pallas_block_packed import pack
    from mobilenet_tpu.quant.pallas_expand_s2_i8 import (
        expand_block_packed_s2_i8)

    rng = np.random.default_rng(23)
    cin, e, cout, h, w = 16, 64, 32, 32, 16
    x_q = rng.integers(-128, 128, (1, h, w, cin)).astype(np.int8)
    xp = pack(jnp.asarray(x_q).astype(jnp.bfloat16), cin)
    exp_w = rng.integers(-127, 128, (cin, e)).astype(np.int8)
    exp_b = rng.integers(-500, 500, (e,)).astype(np.int32)
    exp_a = (rng.uniform(0.5, 2.0, (e,)) * 1e-3).astype(np.float32)
    dw_w = rng.integers(-127, 128, (3, 3, 1, e)).astype(np.int8)
    dw_b = rng.integers(-500, 500, (e,)).astype(np.int32)
    dw_a = (rng.uniform(0.5, 2.0, (e,)) * 1e-3).astype(np.float32)
    pw_w = rng.integers(-127, 128, (e, cout)).astype(np.int8)
    pw_b = rng.integers(-500, 500, (cout,)).astype(np.int32)
    pw_a = (rng.uniform(0.5, 2.0, (cout,)) * 1e-3).astype(np.float32)
    for act in ("relu", "hswish"):
        for bh in (None, 4):
            outs = []
            for fm in (False, True):
                outs.append(np.asarray(expand_block_packed_s2_i8(
                    xp, jnp.asarray(exp_w), jnp.asarray(exp_b),
                    jnp.asarray(exp_a), jnp.asarray(dw_w),
                    jnp.asarray(dw_b), jnp.asarray(dw_a),
                    jnp.asarray(pw_w), jnp.asarray(pw_b),
                    jnp.asarray(pw_a), cin, act, 29.0, 37.0, 53.0,
                    out_dtype="int8", block_h=bh, fastmask=fm)))
            np.testing.assert_array_equal(outs[0], outs[1])
