"""MobileNet-V3 weight init + BN folding (twin of v2.py / io.py).

Pytree layout (folded form consumed by models.mobilenet_v3.forward_v3):

    conv1:     {w (3,3,3,16), b}
    blocks[i]: {exp: {w (Cin, Ce), b}?,        # absent at block 0
                dw:  {w (k,k,1,Ce), b},        # k in {3, 5}
                se:  {w1 (Ce, Cr), b1, w2 (Cr, Ce), b2}?,  # bias convs, no BN
                prj: {w (Ce, Cout), b}}        # LINEAR
    conv_last: {w (C, C6), b}                  # BN-folded + act
    head:      {w (C6, Cp), b}                 # bias conv, no BN (keras :345)
    fc:        {w (Cp, classes), b}            # the 1x1 "logits" conv

SE convs and the head conv carry a plain bias in keras (use_bias default
True, no BatchNormalization follows) — they pass through folding unchanged.
save_npz/load_npz from io.py work on this form (layout-agnostic flattener).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..models.mobilenet_v3 import V3Config
from .io import _he_std

Params = Dict[str, Any]


# Per-conv damping on the block weights: V3's ReLU (unbounded) + hard-swish
# chains have no ReLU6 re-bounding, so plain He init grows ~1.4x per block
# and Large's logits explode to O(1e4) over 15 blocks — useless as a gate
# signal. 0.8 per conv keeps the measured profile healthy (block14_prj ~8,
# logits ~32 on the seeded set) while every activation stays well away
# from zero.
_V3_BLOCK_GAIN = 0.8


def init_params_v3(config: V3Config, seed: int = 0) -> Params:
    """Seeded reference weight set with non-identity BN stats (io.py:33)."""
    rng = np.random.default_rng(seed)

    def bn(c):
        return {
            "gamma": rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32),
            "beta": rng.uniform(-0.2, 0.2, size=(c,)).astype(np.float32),
            "mean": rng.normal(0.0, 0.3, size=(c,)).astype(np.float32),
            "var": rng.uniform(0.5, 1.5, size=(c,)).astype(np.float32),
        }

    c1 = config.stem_channels
    params: Params = {
        "conv1": {
            "w": (rng.standard_normal((3, 3, 3, c1)) * _he_std(27)).astype(
                np.float32),
            "bn": bn(c1),
        },
        "blocks": [],
    }
    for bd in config.block_defs:
        blk: Params = {}
        g = _V3_BLOCK_GAIN
        if bd.has_expand:
            blk["exp"] = {
                "w": (rng.standard_normal((bd.cin, bd.cexp))
                      * (g * _he_std(bd.cin))).astype(np.float32),
                "bn": bn(bd.cexp),
            }
        k = bd.kernel
        blk["dw"] = {
            "w": (rng.standard_normal((k, k, 1, bd.cexp))
                  * (g * _he_std(k * k))).astype(np.float32),
            "bn": bn(bd.cexp),
        }
        if bd.se_mid:
            blk["se"] = {
                "w1": (rng.standard_normal((bd.cexp, bd.se_mid))
                       * _he_std(bd.cexp)).astype(np.float32),
                "b1": np.zeros((bd.se_mid,), np.float32),
                "w2": (rng.standard_normal((bd.se_mid, bd.cexp))
                       * _he_std(bd.se_mid)).astype(np.float32),
                "b2": np.zeros((bd.cexp,), np.float32),
            }
        blk["prj"] = {
            "w": (rng.standard_normal((bd.cexp, bd.cout))
                  * (g * _he_std(bd.cexp))).astype(np.float32),
            "bn": bn(bd.cout),
        }
        params["blocks"].append(blk)
    c_in = config.block_defs[-1].cout
    c6 = config.last_conv_channels
    cp = config.last_point_channels
    params["conv_last"] = {
        "w": (rng.standard_normal((c_in, c6)) * _he_std(c_in)).astype(
            np.float32),
        "bn": bn(c6),
    }
    params["head"] = {
        "w": (rng.standard_normal((c6, cp)) * _he_std(c6)).astype(np.float32),
        "b": np.zeros((cp,), np.float32),
    }
    params["fc"] = {
        "w": (rng.standard_normal((cp, config.num_classes))
              * _he_std(cp)).astype(np.float32),
        "b": np.zeros((config.num_classes,), np.float32),
    }
    return params


def _import_keras3_v3(store, config: V3Config) -> Params:
    """Map a keras-3 `.weights.h5` store (io._keras3_store) onto the V3
    pytree. Creation order (keras mobilenet_v3.py): Conv2D = [stem] +
    per-block([expand?] + [se_conv1, se_conv2 if SE] + [project]) +
    [Conv_1 (conv_last), Conv_2 (post-pool head), Logits]; DepthwiseConv2D
    = one per block; BatchNormalization = [stem_bn] + per-block([exp_bn?,
    dw_bn, prj_bn]) + [Conv_1_bn]. SE and head convs carry [kernel, bias]."""
    from .io import _k3_bn, _k3_classes

    convs, dws, bns = _k3_classes(
        store, "conv2d", "depthwise_conv2d", "batch_normalization")
    n_exp = sum(1 for bd in config.block_defs if bd.has_expand)
    n_se = sum(1 for bd in config.block_defs if bd.se_mid)
    n_blk = len(config.block_defs)
    want = (1 + n_exp + 2 * n_se + n_blk + 3, n_blk,
            1 + n_exp + 2 * n_blk + 1)
    if (len(convs), len(dws), len(bns)) != want:
        raise ValueError(
            f"keras-3 store shape mismatch: {len(convs)} convs/{len(dws)} "
            f"dw/{len(bns)} bn vs expected {want[0]}/{want[1]}/{want[2]} — "
            "wrong variant, alpha, or minimalistic flag")
    params: Params = {"conv1": {"w": convs[0][0], "bn": _k3_bn(bns[0])},
                      "blocks": []}
    ci = bi = 1
    for i, bd in enumerate(config.block_defs):
        blk: Params = {}
        if bd.has_expand:
            blk["exp"] = {"w": convs[ci][0][0, 0], "bn": _k3_bn(bns[bi])}
            ci += 1
            bi += 1
        blk["dw"] = {"w": dws[i][0].transpose(0, 1, 3, 2),
                     "bn": _k3_bn(bns[bi])}
        bi += 1
        if bd.se_mid:
            se1, se2 = convs[ci], convs[ci + 1]
            ci += 2
            blk["se"] = {"w1": se1[0][0, 0], "b1": se1[1],
                         "w2": se2[0][0, 0], "b2": se2[1]}
        blk["prj"] = {"w": convs[ci][0][0, 0], "bn": _k3_bn(bns[bi])}
        ci += 1
        bi += 1
        params["blocks"].append(blk)
    if ci != len(convs) - 3 or bi != len(bns) - 1:
        raise ValueError(
            f"keras-3 store walk mismatch: consumed {ci}/{len(convs)} convs, "
            f"{bi}/{len(bns)} bns with conv_last+head+logits / conv_last_bn "
            "expected to remain — wrong variant or minimalistic flag")
    params["conv_last"] = {"w": convs[ci][0][0, 0], "bn": _k3_bn(bns[bi])}
    head, logits = convs[ci + 1], convs[ci + 2]
    params["head"] = {"w": head[0][0, 0], "b": head[1]}
    params["fc"] = {"w": logits[0].reshape(config.last_point_channels, -1),
                    "b": logits[1]}
    return params


def import_keras_h5_v3(path: str, config: V3Config) -> Params:
    """Convert a keras MobileNetV3 .h5 checkpoint into our pytree (the V3
    twin of io.import_keras_h5 — reference analog C9, SURVEY.md SS2).

    Two layouts, as in io.import_keras_h5. Legacy named .h5
    (keras.applications.mobilenet_v3) uses slash-scoped
    names, which h5py resolves as nested groups: stem Conv + Conv/BatchNorm;
    block i under `expanded_conv[_{i}]` with sublayers expand[/BatchNorm]
    (absent at block 0), depthwise[/BatchNorm], squeeze_excite/Conv and
    squeeze_excite/Conv_1 (bias convs, no BN), project[/BatchNorm]; the
    tail is Conv_1[/BatchNorm], the post-pool head conv Conv_2 (bias), and
    the Logits 1x1 conv (bias). Keras-3 `.weights.h5` is the class-ordinal
    layout (`_import_keras3_v3`). Keras dw kernels are (k,k,C,1); ours are
    (k,k,1,C). Which sublayers exist is driven by config.block_defs, so the
    minimalistic variants (no SE) read cleanly. Validated against a real
    `keras.applications.MobileNetV3Small` forward in
    tests/test_keras_real.py."""
    import h5py  # noqa: PLC0415  (optional dependency, gated)

    from .io import _keras3_store

    store = _keras3_store(path)
    if store is not None:
        return _import_keras3_v3(store, config)

    with h5py.File(path, "r") as f:
        mw = f["model_weights"] if "model_weights" in f else f

        def grp(name):
            g = mw[name]
            return g[name] if name in g else g

        def bn_of(name):
            g = grp(name)
            return {
                "gamma": np.asarray(g["gamma:0"]),
                "beta": np.asarray(g["beta:0"]),
                "mean": np.asarray(g["moving_mean:0"]),
                "var": np.asarray(g["moving_variance:0"]),
            }

        params: Params = {
            "conv1": {"w": np.asarray(grp("Conv")["kernel:0"]),
                      "bn": bn_of("Conv/BatchNorm")},
            "blocks": [],
        }
        for i, bd in enumerate(config.block_defs):
            pre = "expanded_conv" if i == 0 else f"expanded_conv_{i}"
            blk: Params = {}
            if bd.has_expand:
                blk["exp"] = {
                    "w": np.asarray(grp(f"{pre}/expand")["kernel:0"])[0, 0],
                    "bn": bn_of(f"{pre}/expand/BatchNorm"),
                }
            dw_k = np.asarray(grp(f"{pre}/depthwise")["depthwise_kernel:0"])
            blk["dw"] = {"w": dw_k.transpose(0, 1, 3, 2),
                         "bn": bn_of(f"{pre}/depthwise/BatchNorm")}
            if bd.se_mid:
                se1 = grp(f"{pre}/squeeze_excite/Conv")
                se2 = grp(f"{pre}/squeeze_excite/Conv_1")
                blk["se"] = {
                    "w1": np.asarray(se1["kernel:0"])[0, 0],
                    "b1": np.asarray(se1["bias:0"]),
                    "w2": np.asarray(se2["kernel:0"])[0, 0],
                    "b2": np.asarray(se2["bias:0"]),
                }
            blk["prj"] = {
                "w": np.asarray(grp(f"{pre}/project")["kernel:0"])[0, 0],
                "bn": bn_of(f"{pre}/project/BatchNorm"),
            }
            params["blocks"].append(blk)
        params["conv_last"] = {
            "w": np.asarray(grp("Conv_1")["kernel:0"])[0, 0],
            "bn": bn_of("Conv_1/BatchNorm"),
        }
        head = grp("Conv_2")
        params["head"] = {"w": np.asarray(head["kernel:0"])[0, 0],
                          "b": np.asarray(head["bias:0"])}
        logits = grp("Logits")
        params["fc"] = {
            "w": np.asarray(logits["kernel:0"]).reshape(
                config.last_point_channels, -1),
            "b": np.asarray(logits["bias:0"]),
        }
    return params


def fold_bn_v3(params: Params, eps: float = 1e-3) -> Params:
    """Fold BN into conv weight + per-channel bias (float64 math, io.py:83).
    SE and head entries have no BN — copied through as-is."""

    def fold(w: np.ndarray, bnp: Dict[str, np.ndarray], out_axis: int):
        s64 = bnp["gamma"].astype(np.float64) / np.sqrt(
            bnp["var"].astype(np.float64) + eps)
        b64 = (bnp["beta"].astype(np.float64)
               - bnp["mean"].astype(np.float64) * s64)
        shape = [1] * w.ndim
        shape[out_axis] = -1
        w_f = (w.astype(np.float64) * s64.reshape(shape)).astype(np.float32)
        return w_f, b64.astype(np.float32)

    out: Params = {"blocks": []}
    w, b = fold(params["conv1"]["w"], params["conv1"]["bn"], out_axis=3)
    out["conv1"] = {"w": w, "b": b}
    for blk in params["blocks"]:
        fblk: Params = {}
        if "exp" in blk:
            ew, eb = fold(blk["exp"]["w"], blk["exp"]["bn"], out_axis=1)
            fblk["exp"] = {"w": ew, "b": eb}
        dw_w, dw_b = fold(blk["dw"]["w"], blk["dw"]["bn"], out_axis=3)
        fblk["dw"] = {"w": dw_w, "b": dw_b}
        if "se" in blk:
            fblk["se"] = {k: np.asarray(v) for k, v in blk["se"].items()}
        pj_w, pj_b = fold(blk["prj"]["w"], blk["prj"]["bn"], out_axis=1)
        fblk["prj"] = {"w": pj_w, "b": pj_b}
        out["blocks"].append(fblk)
    cw, cb = fold(params["conv_last"]["w"], params["conv_last"]["bn"],
                  out_axis=1)
    out["conv_last"] = {"w": cw, "b": cb}
    out["head"] = {"w": np.asarray(params["head"]["w"]),
                   "b": np.asarray(params["head"]["b"])}
    out["fc"] = {"w": np.asarray(params["fc"]["w"]),
                 "b": np.asarray(params["fc"]["b"])}
    return out
