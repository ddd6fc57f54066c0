"""Keras .h5 importer tests for the V2/V3 families (reference analog C9 —
the V1 twin is tests/test_keras_import.py). No real pretrained checkpoint
exists in this environment (SURVEY.md SS0), so synthetic .h5 files with the
keras.applications layer naming exercise the converters."""

import h5py
import numpy as np

from mobilenet_tpu.checkpoints.v2 import (fold_bn_v2, import_keras_h5_v2,
                                          init_params_v2)
from mobilenet_tpu.checkpoints.v3 import (fold_bn_v3, import_keras_h5_v3,
                                          init_params_v3)
from mobilenet_tpu.models.mobilenet_v2 import V2Config
from mobilenet_tpu.models.mobilenet_v3 import V3Config


def _bn_group(parent, name, bn):
    g = parent.create_group(name).create_group(name)
    g["gamma:0"] = bn["gamma"]
    g["beta:0"] = bn["beta"]
    g["moving_mean:0"] = bn["mean"]
    g["moving_variance:0"] = bn["var"]


def _conv_group(parent, name, **datasets):
    g = parent.create_group(name).create_group(name)
    for k, v in datasets.items():
        g[f"{k}:0"] = v


def _write_keras_h5_v2(path, params, cfg):
    """Write our pytree in keras MobileNetV2 .h5 layout."""
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        _conv_group(mw, "Conv1", kernel=params["conv1"]["w"])
        _bn_group(mw, "bn_Conv1", params["conv1"]["bn"])
        for i, blk in enumerate(params["blocks"]):
            pre = "expanded_conv" if i == 0 else f"block_{i}"
            if "exp" in blk:
                _conv_group(mw, f"{pre}_expand",
                            kernel=blk["exp"]["w"][None, None])
                _bn_group(mw, f"{pre}_expand_BN", blk["exp"]["bn"])
            _conv_group(mw, f"{pre}_depthwise",
                        depthwise_kernel=blk["dw"]["w"].transpose(0, 1, 3, 2))
            _bn_group(mw, f"{pre}_depthwise_BN", blk["dw"]["bn"])
            _conv_group(mw, f"{pre}_project",
                        kernel=blk["prj"]["w"][None, None])
            _bn_group(mw, f"{pre}_project_BN", blk["prj"]["bn"])
        _conv_group(mw, "Conv_1", kernel=params["conv_last"]["w"][None, None])
        _bn_group(mw, "Conv_1_bn", params["conv_last"]["bn"])
        _conv_group(mw, "predictions", kernel=params["fc"]["w"],
                    bias=params["fc"]["b"])


def _write_keras_h5_v3(path, params, cfg):
    """Write our pytree in keras MobileNetV3 .h5 layout (slash-scoped layer
    names become nested h5 groups, duplicated inside the layer group the way
    keras save_weights lays out variable paths)."""
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")
        _conv_group(mw, "Conv", kernel=params["conv1"]["w"])
        _bn_group(mw, "Conv/BatchNorm", params["conv1"]["bn"])
        for i, (bd, blk) in enumerate(zip(cfg.block_defs, params["blocks"])):
            pre = "expanded_conv" if i == 0 else f"expanded_conv_{i}"
            if "exp" in blk:
                _conv_group(mw, f"{pre}/expand",
                            kernel=blk["exp"]["w"][None, None])
                _bn_group(mw, f"{pre}/expand/BatchNorm", blk["exp"]["bn"])
            _conv_group(mw, f"{pre}/depthwise",
                        depthwise_kernel=blk["dw"]["w"].transpose(0, 1, 3, 2))
            _bn_group(mw, f"{pre}/depthwise/BatchNorm", blk["dw"]["bn"])
            if "se" in blk:
                _conv_group(mw, f"{pre}/squeeze_excite/Conv",
                            kernel=blk["se"]["w1"][None, None],
                            bias=blk["se"]["b1"])
                _conv_group(mw, f"{pre}/squeeze_excite/Conv_1",
                            kernel=blk["se"]["w2"][None, None],
                            bias=blk["se"]["b2"])
            _conv_group(mw, f"{pre}/project",
                        kernel=blk["prj"]["w"][None, None])
            _bn_group(mw, f"{pre}/project/BatchNorm", blk["prj"]["bn"])
        _conv_group(mw, "Conv_1", kernel=params["conv_last"]["w"][None, None])
        _bn_group(mw, "Conv_1/BatchNorm", params["conv_last"]["bn"])
        _conv_group(mw, "Conv_2", kernel=params["head"]["w"][None, None],
                    bias=params["head"]["b"])
        _conv_group(mw, "Logits", kernel=params["fc"]["w"][None, None],
                    bias=params["fc"]["b"])


def test_keras_h5_v2_roundtrip(tmp_path):
    cfg = V2Config(alpha=1.0, resolution=96)
    params = init_params_v2(cfg, seed=11)
    path = str(tmp_path / "keras_mnv2.h5")
    _write_keras_h5_v2(path, params, cfg)

    imp = import_keras_h5_v2(path, cfg)
    np.testing.assert_array_equal(imp["conv1"]["w"], params["conv1"]["w"])
    assert "exp" not in imp["blocks"][0]  # t == 1 at block 0
    np.testing.assert_array_equal(
        imp["blocks"][3]["exp"]["w"], params["blocks"][3]["exp"]["w"])
    np.testing.assert_array_equal(
        imp["blocks"][7]["dw"]["w"], params["blocks"][7]["dw"]["w"])
    np.testing.assert_array_equal(
        imp["blocks"][12]["prj"]["bn"]["var"],
        params["blocks"][12]["prj"]["bn"]["var"])
    np.testing.assert_array_equal(imp["conv_last"]["w"],
                                  params["conv_last"]["w"])
    np.testing.assert_array_equal(imp["fc"]["w"], params["fc"]["w"])

    f1 = fold_bn_v2(params, eps=cfg.bn_eps)
    f2 = fold_bn_v2(imp, eps=cfg.bn_eps)
    np.testing.assert_array_equal(f1["blocks"][1]["prj"]["b"],
                                  f2["blocks"][1]["prj"]["b"])


def test_keras_h5_v3_roundtrip(tmp_path):
    cfg = V3Config(variant="large", alpha=1.0, resolution=96)
    params = init_params_v3(cfg, seed=11)
    path = str(tmp_path / "keras_mnv3.h5")
    _write_keras_h5_v3(path, params, cfg)

    imp = import_keras_h5_v3(path, cfg)
    np.testing.assert_array_equal(imp["conv1"]["w"], params["conv1"]["w"])
    assert "exp" not in imp["blocks"][0]
    se_i = next(i for i, bd in enumerate(cfg.block_defs) if bd.se_mid)
    np.testing.assert_array_equal(
        imp["blocks"][se_i]["se"]["w1"], params["blocks"][se_i]["se"]["w1"])
    np.testing.assert_array_equal(
        imp["blocks"][se_i]["se"]["b2"], params["blocks"][se_i]["se"]["b2"])
    np.testing.assert_array_equal(
        imp["blocks"][5]["dw"]["w"], params["blocks"][5]["dw"]["w"])
    np.testing.assert_array_equal(imp["head"]["w"], params["head"]["w"])
    np.testing.assert_array_equal(imp["fc"]["b"], params["fc"]["b"])

    f1 = fold_bn_v3(params, eps=cfg.bn_eps)
    f2 = fold_bn_v3(imp, eps=cfg.bn_eps)
    np.testing.assert_array_equal(f1["blocks"][2]["prj"]["b"],
                                  f2["blocks"][2]["prj"]["b"])


def test_cli_export_from_keras_v2(tmp_path):
    """The CLI wiring: `export --model v2 --from-keras` converts a keras .h5
    straight into the raw/folded/int8 .npz set (reference analog C9 — the
    offline weight-export flow, SURVEY.md SS2)."""
    from mobilenet_tpu.checkpoints import load_npz
    from mobilenet_tpu.cli import main

    cfg = V2Config(alpha=1.0, resolution=96)
    params = init_params_v2(cfg, seed=3)
    h5 = str(tmp_path / "mnv2.h5")
    _write_keras_h5_v2(h5, params, cfg)

    out = str(tmp_path / "ckpts")
    main(["--backend", "cpu", "export", "--model", "v2", "--alpha", "1.0",
          "--res", "96", "--from-keras", h5, "--out", out])

    raw = load_npz(f"{out}/{cfg.variant_name()}_raw.npz")
    np.testing.assert_array_equal(raw["conv1"]["w"], params["conv1"]["w"])
    folded = load_npz(f"{out}/{cfg.variant_name()}_folded.npz")
    ref = fold_bn_v2(params, eps=cfg.bn_eps)
    np.testing.assert_array_equal(folded["blocks"][1]["prj"]["b"],
                                  ref["blocks"][1]["prj"]["b"])


def test_cli_export_from_keras_v3small(tmp_path):
    from mobilenet_tpu.checkpoints import load_npz
    from mobilenet_tpu.cli import main

    cfg = V3Config(variant="small", alpha=1.0, resolution=96)
    params = init_params_v3(cfg, seed=5)
    h5 = str(tmp_path / "mnv3s.h5")
    _write_keras_h5_v3(h5, params, cfg)

    out = str(tmp_path / "ckpts")
    main(["--backend", "cpu", "export", "--model", "v3small", "--alpha",
          "1.0", "--res", "96", "--from-keras", h5, "--out", out])

    folded = load_npz(f"{out}/{cfg.variant_name()}_folded.npz")
    ref = fold_bn_v3(params, eps=cfg.bn_eps)
    np.testing.assert_array_equal(folded["blocks"][2]["prj"]["b"],
                                  ref["blocks"][2]["prj"]["b"])


def test_keras_h5_v3_minimalistic_roundtrip(tmp_path):
    """Minimalistic Small: no SE anywhere — the importer reads only what
    config.block_defs declares."""
    cfg = V3Config(variant="small", alpha=1.0, resolution=96,
                   minimalistic=True)
    params = init_params_v3(cfg, seed=7)
    path = str(tmp_path / "keras_mnv3s_min.h5")
    _write_keras_h5_v3(path, params, cfg)

    imp = import_keras_h5_v3(path, cfg)
    assert all("se" not in b for b in imp["blocks"])
    np.testing.assert_array_equal(
        imp["blocks"][1]["dw"]["w"], params["blocks"][1]["dw"]["w"])
    np.testing.assert_array_equal(imp["fc"]["w"], params["fc"]["w"])
