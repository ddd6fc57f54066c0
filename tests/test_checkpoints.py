"""Checkpoint subsystem tests: save/load roundtrip, BN folding math, golden
fixture stability, export CLI (reference analog C9, SURVEY.md SS2)."""

import os

import numpy as np
import pytest

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params, load_npz, save_npz
from mobilenet_tpu.oracle import numpy_ref
from mobilenet_tpu.quant import quantize, quantize_input
from mobilenet_tpu.quant import oracle as qoracle

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "mnv1_0.25_128_seed0.npz")


def test_npz_roundtrip(tmp_path):
    cfg = ModelConfig(alpha=0.25, resolution=128)
    params = init_params(cfg, seed=7)
    path = str(tmp_path / "ckpt.npz")
    save_npz(path, params)
    loaded = load_npz(path)
    assert len(loaded["blocks"]) == 13
    np.testing.assert_array_equal(loaded["conv1"]["w"], params["conv1"]["w"])
    np.testing.assert_array_equal(
        loaded["blocks"][5]["pw"]["bn"]["var"], params["blocks"][5]["pw"]["bn"]["var"]
    )
    np.testing.assert_array_equal(loaded["fc"]["b"], params["fc"]["b"])


def test_fold_bn_math():
    """Folded conv+bias must equal conv -> BN exactly (to fp32 rounding)."""
    cfg = ModelConfig(alpha=0.25, resolution=128)
    params = init_params(cfg, seed=1)
    folded = fold_bn(params, eps=cfg.bn_eps)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    # unfolded: conv (no bias) then BN
    y_conv = numpy_ref.conv2d_ref(x, params["conv1"]["w"], 2)
    bn = params["conv1"]["bn"]
    s = bn["gamma"] / np.sqrt(bn["var"] + cfg.bn_eps)
    y_bn = y_conv * s + (bn["beta"] - bn["mean"] * s)
    # folded: conv with scaled weights + bias
    y_fold = numpy_ref.conv2d_ref(x, folded["conv1"]["w"], 2, folded["conv1"]["b"])
    np.testing.assert_allclose(y_fold, y_bn, atol=1e-5, rtol=1e-5)


def test_golden_fixture_stable():
    """Committed golden vectors must regenerate identically — guards against
    silent semantic drift in the oracles (SURVEY.md SS4 'golden dumps')."""
    data = np.load(GOLDEN)
    cfg = ModelConfig(alpha=0.25, resolution=128)
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    logits, acts = numpy_ref.forward_all(folded, data["x"], cfg)
    np.testing.assert_array_equal(logits, data["logits"])
    assert acts["conv1"].astype(np.float64).sum() == data["conv1_sum"]
    assert acts["block06_dw"].astype(np.float64).sum() == data["block06_dw_sum"]

    q = quantize(folded, cfg)
    logits_i8, _ = qoracle.forward_all(q, quantize_input(data["x"]), cfg)
    np.testing.assert_array_equal(logits_i8, data["logits_i8"])


def test_export_cli(tmp_path):
    from mobilenet_tpu.cli import main

    out = str(tmp_path / "exp")
    main(["--backend", "cpu", "export", "--alpha", "0.25", "--res", "128",
          "--out", out])
    files = sorted(os.listdir(out))
    assert files == [
        "mobilenet_v1_0.25_128_folded.npz",
        "mobilenet_v1_0.25_128_int8.npz",
        "mobilenet_v1_0.25_128_raw.npz",
    ]
    q = load_npz(os.path.join(out, "mobilenet_v1_0.25_128_int8.npz"))
    assert q["conv1"]["w_i8"].dtype == np.int8
    assert q["blocks"][0]["dw"]["bias_i32"].dtype == np.int32


def test_golden_fixture_stable_v2():
    """V2 twin of test_golden_fixture_stable: committed fp32 + int8 golden
    vectors must regenerate identically from the seeded weight set."""
    from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
    from mobilenet_tpu.models.mobilenet_v2 import V2Config
    from mobilenet_tpu.quant.v2 import forward_all_v2_i8, quantize_v2

    data = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                "mnv2_1.0_96_seed0.npz"))
    cfg = V2Config(alpha=1.0, resolution=96)
    folded = fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps)
    logits, acts = numpy_ref.forward_all_v2(folded, data["x"], cfg)
    np.testing.assert_array_equal(logits, data["logits"])
    assert acts["conv1"].astype(np.float64).sum() == data["conv1_sum"]
    assert acts["block06_dw"].astype(np.float64).sum() == data["block06_dw_sum"]
    q = quantize_v2(folded, cfg, n_calib=8)
    logits_i8, _ = forward_all_v2_i8(q, quantize_input(data["x"]), cfg)
    np.testing.assert_array_equal(logits_i8, data["logits_i8"])


def test_golden_fixture_stable_v3():
    """V3 twin — incl. an SE tap sum (pins the gate semantics) and the
    calibrated int8 logits (pins calibration + the named-act requant)."""
    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.quant.v3 import forward_all_v3_i8, quantize_v3

    data = np.load(os.path.join(os.path.dirname(__file__), "golden",
                                "mnv3s_1.0_96_seed0.npz"))
    cfg = V3Config(variant="small", alpha=1.0, resolution=96)
    folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    logits, acts = numpy_ref.forward_all_v3(folded, data["x"], cfg)
    np.testing.assert_array_equal(logits, data["logits"])
    assert acts["conv1"].astype(np.float64).sum() == data["conv1_sum"]
    assert acts["block04_se"].astype(np.float64).sum() == data["block04_se_sum"]
    q = quantize_v3(folded, cfg, n_calib=8)
    logits_i8, _ = forward_all_v3_i8(q, quantize_input(data["x"]), cfg)
    np.testing.assert_array_equal(logits_i8, data["logits_i8"])
