"""Keras .h5 checkpoint importer test (reference analog C9: converting the
pretrained-weight export into our pytree). No real pretrained checkpoint
exists in this environment (SURVEY.md SS0), so a synthetic .h5 with the keras
MobileNet layer naming exercises the converter."""

import h5py
import numpy as np

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params
from mobilenet_tpu.checkpoints.io import import_keras_h5


def _write_keras_h5(path, params, cfg):
    """Write our pytree in keras MobileNet .h5 layout (mobilenet.py naming)."""
    with h5py.File(path, "w") as f:
        mw = f.create_group("model_weights")

        def bn_group(name, bn):
            g = mw.create_group(name).create_group(name)
            g["gamma:0"] = bn["gamma"]
            g["beta:0"] = bn["beta"]
            g["moving_mean:0"] = bn["mean"]
            g["moving_variance:0"] = bn["var"]

        g = mw.create_group("conv1").create_group("conv1")
        g["kernel:0"] = params["conv1"]["w"]
        bn_group("conv1_bn", params["conv1"]["bn"])
        for i, blk in enumerate(params["blocks"], start=1):
            g = mw.create_group(f"conv_dw_{i}").create_group(f"conv_dw_{i}")
            # keras dw kernels are (3,3,C,1)
            g["depthwise_kernel:0"] = blk["dw"]["w"].transpose(0, 1, 3, 2)
            bn_group(f"conv_dw_{i}_bn", blk["dw"]["bn"])
            g = mw.create_group(f"conv_pw_{i}").create_group(f"conv_pw_{i}")
            g["kernel:0"] = blk["pw"]["w"][None, None]  # (1,1,Cin,Cout)
            bn_group(f"conv_pw_{i}_bn", blk["pw"]["bn"])
        g = mw.create_group("conv_preds").create_group("conv_preds")
        g["kernel:0"] = params["fc"]["w"][None, None]
        g["bias:0"] = params["fc"]["b"]


def test_keras_h5_roundtrip(tmp_path):
    cfg = ModelConfig(alpha=0.25, resolution=128)
    params = init_params(cfg, seed=13)
    path = str(tmp_path / "keras_mnv1.h5")
    _write_keras_h5(path, params, cfg)

    imported = import_keras_h5(path, cfg)
    np.testing.assert_array_equal(imported["conv1"]["w"], params["conv1"]["w"])
    np.testing.assert_array_equal(
        imported["blocks"][3]["dw"]["w"], params["blocks"][3]["dw"]["w"]
    )
    np.testing.assert_array_equal(
        imported["blocks"][7]["pw"]["bn"]["var"], params["blocks"][7]["pw"]["bn"]["var"]
    )
    np.testing.assert_array_equal(imported["fc"]["w"], params["fc"]["w"])

    # imported weights fold + run identically
    f1 = fold_bn(params, eps=cfg.bn_eps)
    f2 = fold_bn(imported, eps=cfg.bn_eps)
    np.testing.assert_array_equal(f1["blocks"][0]["dw"]["b"], f2["blocks"][0]["dw"]["b"])
