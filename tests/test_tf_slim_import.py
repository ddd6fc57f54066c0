"""TF-slim checkpoint importer test (reference analog C9: TF-slim is the
canonical pretrained-weight source for the FPGA-port genre). No real
checkpoint exists in this environment (SURVEY.md SS0), so a synthetic
checkpoint with the exact slim variable naming exercises the converter,
including the 1001-class background-drop."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from mobilenet_tpu import ModelConfig
from mobilenet_tpu.checkpoints import fold_bn, init_params
from mobilenet_tpu.checkpoints.io import import_tf_slim


def _write_slim_ckpt(prefix, params, cfg, background_class=True):
    """Write our pytree as a TF checkpoint with slim MobilenetV1 naming."""
    tf1 = tf.compat.v1
    tf1.reset_default_graph()
    g = tf.Graph()
    with g.as_default():
        def var(name, val):
            tf1.get_variable(name, initializer=tf.constant(val))

        def bn_vars(scope, bn):
            var(f"{scope}/BatchNorm/gamma", bn["gamma"])
            var(f"{scope}/BatchNorm/beta", bn["beta"])
            var(f"{scope}/BatchNorm/moving_mean", bn["mean"])
            var(f"{scope}/BatchNorm/moving_variance", bn["var"])

        with tf1.variable_scope("MobilenetV1"):
            var("Conv2d_0/weights", params["conv1"]["w"])
            bn_vars("Conv2d_0", params["conv1"]["bn"])
            for i, blk in enumerate(params["blocks"], start=1):
                # slim dw kernels are (3,3,C,1)
                var(f"Conv2d_{i}_depthwise/depthwise_weights",
                    blk["dw"]["w"].transpose(0, 1, 3, 2))
                bn_vars(f"Conv2d_{i}_depthwise", blk["dw"]["bn"])
                var(f"Conv2d_{i}_pointwise/weights", blk["pw"]["w"][None, None])
                bn_vars(f"Conv2d_{i}_pointwise", blk["pw"]["bn"])
            fc_w, fc_b = params["fc"]["w"], params["fc"]["b"]
            if background_class:  # slim's 1001-way classifier (bg at col 0)
                fc_w = np.concatenate(
                    [np.full((fc_w.shape[0], 1), 7.0, np.float32), fc_w], axis=1)
                fc_b = np.concatenate([np.float32([3.0]), fc_b])
            var("Logits/Conv2d_1c_1x1/weights", fc_w[None, None])
            var("Logits/Conv2d_1c_1x1/biases", fc_b)

        with tf1.Session(graph=g) as sess:
            sess.run(tf1.global_variables_initializer())
            tf1.train.Saver().save(sess, prefix, write_meta_graph=False)


@pytest.mark.parametrize("background_class", [True, False])
def test_tf_slim_roundtrip(tmp_path, background_class):
    cfg = ModelConfig(alpha=0.25, resolution=128)
    params = init_params(cfg, seed=17)
    prefix = str(tmp_path / "mobilenet_v1_0.25_128.ckpt")
    _write_slim_ckpt(prefix, params, cfg, background_class=background_class)

    imported = import_tf_slim(prefix, cfg)
    np.testing.assert_array_equal(imported["conv1"]["w"], params["conv1"]["w"])
    np.testing.assert_array_equal(
        imported["blocks"][3]["dw"]["w"], params["blocks"][3]["dw"]["w"])
    np.testing.assert_array_equal(
        imported["blocks"][7]["pw"]["bn"]["var"],
        params["blocks"][7]["pw"]["bn"]["var"])
    # 1001-class checkpoints drop the background column; 1000-class pass through
    np.testing.assert_array_equal(imported["fc"]["w"], params["fc"]["w"])
    np.testing.assert_array_equal(imported["fc"]["b"], params["fc"]["b"])

    f1 = fold_bn(params, eps=cfg.bn_eps)
    f2 = fold_bn(imported, eps=cfg.bn_eps)
    np.testing.assert_array_equal(
        f1["blocks"][0]["dw"]["b"], f2["blocks"][0]["dw"]["b"])


def test_cli_export_from_tf_slim(tmp_path):
    """cli export --from-tf-slim converts a slim checkpoint into the
    documented raw/folded/int8 .npz set (the C9 offline-export flow)."""
    import os

    from mobilenet_tpu import cli
    from mobilenet_tpu.checkpoints import load_npz

    cfg = ModelConfig(alpha=0.25, resolution=128)
    params = init_params(cfg, seed=19)
    prefix = str(tmp_path / "mobilenet_v1_0.25_128.ckpt")
    _write_slim_ckpt(prefix, params, cfg)

    out = str(tmp_path / "exp")
    cli.main(["--backend", "cpu", "export", "--alpha", "0.25", "--res", "128",
              "--from-tf-slim", prefix, "--out", out])
    raw = load_npz(os.path.join(out, "mobilenet_v1_0.25_128_raw.npz"))
    np.testing.assert_array_equal(raw["conv1"]["w"], params["conv1"]["w"])
    assert os.path.exists(os.path.join(out, "mobilenet_v1_0.25_128_folded.npz"))
    assert os.path.exists(os.path.join(out, "mobilenet_v1_0.25_128_int8.npz"))
