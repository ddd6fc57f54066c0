"""Fine-grained stage timings for the V3 stem + block-1 route on the chip.

The 2026-08-19 prefix attribution puts conv1+pre at 2.19 ms and block 1 at
3.85 ms (floors 0.17 each) — this probe times the SUB-stages of both so the
attack lands on the real cost: preprocess alone, +conv1, +hard-swish, +pack
(the block-0 packed route's layout transition), then block 1's expand matmul
and packed-s2 kernel separately vs chained.

Usage: python tools/stage_probe_v3.py [--batch 256] [--res 224]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.ops import conv as ops
    from mobilenet_tpu.ops import preprocess as prep
    from mobilenet_tpu.ops.pallas_block_packed import (
        pack, packed_expand, separable_block_packed, separable_block_packed_s2)
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = V3Config(variant="large", alpha=1.0, resolution=args.res)
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    # bf16 weights, as the pipeline ships them (f32 weights flip the packed
    # kernels' matmuls to HIGHEST precision and mismeasure every stage).
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    params = jax.device_put(params)
    blk0, blk1 = params["blocks"][0], params["blocks"][1]

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 256, (args.batch, args.res, args.res, 3),
                                   dtype=np.uint8))

    def scalarize(y):
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    def s_pre(u8):
        return scalarize(prep.preprocess(u8, cfg.resolution, jnp.bfloat16))

    def s_conv1_noact(u8):
        x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
        return scalarize(ops.conv2d_same(x, params["conv1"]["w"], 2,
                                         bias=params["conv1"]["b"], act=None))

    def s_conv1(u8):
        x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
        return scalarize(ops.conv2d_same(x, params["conv1"]["w"], 2,
                                         bias=params["conv1"]["b"],
                                         act=cfg.head_act))

    def _stem(u8):
        x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
        return ops.conv2d_same(x, params["conv1"]["w"], 2,
                               bias=params["conv1"]["b"], act=cfg.head_act)

    def s_conv1_pack(u8):
        return scalarize(pack(_stem(u8), 16))

    def _b0(u8):
        xp = pack(_stem(u8), 16)
        yp = separable_block_packed(
            xp, blk0["dw"]["w"], blk0["dw"]["b"],
            blk0["prj"]["w"], blk0["prj"]["b"], 16, 16,
            False, pw_epilogue=False)
        return yp + xp

    def s_b0(u8):
        return scalarize(_b0(u8))

    def s_b1_expand(u8):
        from mobilenet_tpu.ops.pallas_block_packed import unpack
        y = unpack(_b0(u8), 16)
        ye = packed_expand(y, blk1["exp"]["w"], blk1["exp"]["b"], "relu")
        return scalarize(ye)

    def s_b1_full(u8):
        from mobilenet_tpu.ops.pallas_block_packed import unpack
        y = unpack(_b0(u8), 16)
        ye = packed_expand(y, blk1["exp"]["w"], blk1["exp"]["b"], "relu")
        pw = jnp.pad(blk1["prj"]["w"], ((0, 0), (0, 128 - 24)))
        pb = jnp.pad(blk1["prj"]["b"], (0, 128 - 24))
        yo = separable_block_packed_s2(
            pack(ye, 64), blk1["dw"]["w"], blk1["dw"]["b"], pw, pb,
            64, 128, False, pw_epilogue=False)
        return scalarize(yo)

    stages = [
        ("preprocess", s_pre),
        ("+conv1 (no act)", s_conv1_noact),
        ("+conv1+hs", s_conv1),
        ("+pack", s_conv1_pack),
        ("+block0 packed", s_b0),
        ("+b1 expand", s_b1_expand),
        ("+b1 s2 kernel", s_b1_full),
    ]
    fns = {name: jax.jit(fn) for name, fn in stages}
    for name, fn in fns.items():
        np.asarray(fn(img))  # compile + warm
        print(f"compiled {name}", flush=True)

    meds = {}
    results = {name: [] for name, _ in stages}
    for _ in range(args.rounds):
        for name, _ in stages:
            fn = fns[name]
            dt, n = fenced_window(lambda: fn(img), np.asarray, 20)
            results[name].append(dt / n * 1e3)
    prev = 0.0
    print(f"\n{'stage':>18} | cumulative | delta  (ms/batch-{args.batch})")
    for name, _ in stages:
        med = float(np.median(results[name]))
        meds[name] = med
        print(f"{name:>18} | {med:10.3f} | {med - prev:+7.3f}", flush=True)
        prev = med
    print()
    print({k: round(v, 4) for k, v in meds.items()})


if __name__ == "__main__":
    main()
