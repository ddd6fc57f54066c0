"""MobileNet-V2 weight init + BN folding (twin of io.py's V1 functions).

Pytree layout (folded form consumed by models.mobilenet_v2.forward_v2):

    conv1:     {w (3,3,3,C1), b (C1,)}
    blocks[i]: {exp: {w (Cin, t*Cin), b}?,   # absent when t == 1
                dw:  {w (3,3,1,Ce), b},
                prj: {w (Ce, Cout), b}}      # LINEAR (bias only, no act)
    conv_last: {w (C, 1280), b}
    fc:        {w (1280, classes), b}

The raw (unfolded) form carries {w, bn{gamma,beta,mean,var}} per conv, like
io.init_params; folding math is identical (float64 intermediate so device
path and oracles agree — io.py:83-114). save_npz/load_npz from io.py work
unchanged on both forms (the flattener is layout-agnostic).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..models.mobilenet_v2 import V2Config
from .io import _he_std

Params = Dict[str, Any]


def init_params_v2(config: V2Config, seed: int = 0) -> Params:
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
            "w": (rng.standard_normal((3, 3, 3, c1)) * _he_std(27)).astype(np.float32),
            "bn": bn(c1),
        },
        "blocks": [],
    }
    for t, cin, cout, _stride in config.block_defs:
        ce = t * cin
        blk: Params = {}
        if t > 1:
            blk["exp"] = {
                "w": (rng.standard_normal((cin, ce)) * _he_std(cin)).astype(np.float32),
                "bn": bn(ce),
            }
        blk["dw"] = {
            "w": (rng.standard_normal((3, 3, 1, ce)) * _he_std(9)).astype(np.float32),
            "bn": bn(ce),
        }
        blk["prj"] = {
            "w": (rng.standard_normal((ce, cout)) * _he_std(ce)).astype(np.float32),
            "bn": bn(cout),
        }
        params["blocks"].append(blk)
    cl = config.last_channels
    c_in = config.block_defs[-1][2]
    params["conv_last"] = {
        "w": (rng.standard_normal((c_in, cl)) * _he_std(c_in)).astype(np.float32),
        "bn": bn(cl),
    }
    params["fc"] = {
        "w": (rng.standard_normal((cl, config.num_classes)) * _he_std(cl)).astype(
            np.float32),
        "b": np.zeros((config.num_classes,), dtype=np.float32),
    }
    return params


def _import_keras3_v2(store, config: V2Config) -> Params:
    """Map a keras-3 `.weights.h5` store (io._keras3_store) onto the V2
    pytree. Creation order (keras mobilenet_v2.py): Conv2D = [Conv1] +
    per-block([expand if t>1] + [project]) + [Conv_1]; DepthwiseConv2D = one
    per block; BatchNormalization = [bn_Conv1] + per-block([exp_bn?, dw_bn,
    prj_bn]) + [Conv_1_bn]; Dense = [predictions]."""
    from .io import _k3_bn, _k3_classes

    convs, dws, bns, dense_l = _k3_classes(
        store, "conv2d", "depthwise_conv2d", "batch_normalization", "dense")
    dense = dense_l[0]
    n_exp = sum(1 for t, *_ in config.block_defs if t > 1)
    n_blk = len(config.block_defs)
    want = (1 + n_exp + n_blk + 1, n_blk, 1 + n_exp + 2 * n_blk + 1)
    if (len(convs), len(dws), len(bns)) != want:
        raise ValueError(
            f"keras-3 store shape mismatch: {len(convs)} convs/{len(dws)} "
            f"dw/{len(bns)} bn vs expected {want[0]}/{want[1]}/{want[2]} — "
            "wrong model family or alpha")
    params: Params = {"conv1": {"w": convs[0][0], "bn": _k3_bn(bns[0])},
                      "blocks": []}
    ci = bi = 1
    for i, (t, _cin, _cout, _s) in enumerate(config.block_defs):
        blk: Params = {}
        if t > 1:
            blk["exp"] = {"w": convs[ci][0][0, 0], "bn": _k3_bn(bns[bi])}
            ci += 1
            bi += 1
        blk["dw"] = {"w": dws[i][0].transpose(0, 1, 3, 2),
                     "bn": _k3_bn(bns[bi])}
        bi += 1
        blk["prj"] = {"w": convs[ci][0][0, 0], "bn": _k3_bn(bns[bi])}
        ci += 1
        bi += 1
        params["blocks"].append(blk)
    if ci != len(convs) - 1 or bi != len(bns) - 1:
        raise ValueError(
            f"keras-3 store walk mismatch: consumed {ci}/{len(convs)} convs, "
            f"{bi}/{len(bns)} bns with one of each expected to remain — "
            "wrong model family or alpha")
    params["conv_last"] = {"w": convs[ci][0][0, 0], "bn": _k3_bn(bns[bi])}
    params["fc"] = {"w": dense[0].reshape(config.last_channels, -1),
                    "b": dense[1]}
    return params


def import_keras_h5_v2(path: str, config: V2Config) -> Params:
    """Convert a keras MobileNetV2 .h5 checkpoint into our pytree (the V2
    twin of io.import_keras_h5 — reference analog C9, SURVEY.md SS2).

    Two layouts, as in io.import_keras_h5: legacy named .h5 (Conv1 /
    bn_Conv1; block 0 expanded_conv_{depthwise,project}[_BN], no expand
    conv; blocks 1..16 block_{i}_{expand,depthwise,project}[_BN]; tail
    Conv_1 / Conv_1_bn + `predictions` Dense) and keras-3 `.weights.h5`
    (class-ordinal layout, `_import_keras3_v2`). Keras dw kernels are
    (3,3,C,1); ours are (3,3,1,C). Validated against a real
    `keras.applications.MobileNetV2` forward in tests/test_keras_real.py."""
    import h5py  # noqa: PLC0415  (optional dependency, gated)

    from .io import _keras3_store

    store = _keras3_store(path)
    if store is not None:
        return _import_keras3_v2(store, config)

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
            "conv1": {"w": np.asarray(grp("Conv1")["kernel:0"]),
                      "bn": bn_of("bn_Conv1")},
            "blocks": [],
        }
        for i, (t, _cin, _cout, _s) in enumerate(config.block_defs):
            pre = "expanded_conv" if i == 0 else f"block_{i}"
            blk: Params = {}
            if t > 1:
                blk["exp"] = {
                    "w": np.asarray(grp(f"{pre}_expand")["kernel:0"])[0, 0],
                    "bn": bn_of(f"{pre}_expand_BN"),
                }
            dw_k = np.asarray(grp(f"{pre}_depthwise")["depthwise_kernel:0"])
            blk["dw"] = {"w": dw_k.transpose(0, 1, 3, 2),
                         "bn": bn_of(f"{pre}_depthwise_BN")}
            blk["prj"] = {
                "w": np.asarray(grp(f"{pre}_project")["kernel:0"])[0, 0],
                "bn": bn_of(f"{pre}_project_BN"),
            }
            params["blocks"].append(blk)
        params["conv_last"] = {
            "w": np.asarray(grp("Conv_1")["kernel:0"])[0, 0],
            "bn": bn_of("Conv_1_bn"),
        }
        preds = grp("predictions")
        params["fc"] = {
            "w": np.asarray(preds["kernel:0"]).reshape(
                config.last_channels, -1),
            "b": np.asarray(preds["bias:0"]),
        }
    return params


def fold_bn_v2(params: Params, eps: float = 1e-3) -> Params:
    """Fold BN into conv weight + per-channel bias (float64 math, io.py:83)."""

    def fold(w: np.ndarray, bnp: Dict[str, np.ndarray], out_axis: int):
        s64 = bnp["gamma"].astype(np.float64) / np.sqrt(
            bnp["var"].astype(np.float64) + eps)
        b64 = bnp["beta"].astype(np.float64) - bnp["mean"].astype(np.float64) * s64
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
        pj_w, pj_b = fold(blk["prj"]["w"], blk["prj"]["bn"], out_axis=1)
        fblk["dw"] = {"w": dw_w, "b": dw_b}
        fblk["prj"] = {"w": pj_w, "b": pj_b}
        out["blocks"].append(fblk)
    cw, cb = fold(params["conv_last"]["w"], params["conv_last"]["bn"], out_axis=1)
    out["conv_last"] = {"w": cw, "b": cb}
    out["fc"] = {"w": np.asarray(params["fc"]["w"]),
                 "b": np.asarray(params["fc"]["b"])}
    return out
