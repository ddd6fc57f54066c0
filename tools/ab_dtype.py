"""Interleaved A/B: bf16 fused network vs int8 fused network, ONE process.

Cross-process comparisons through the TPU tunnel carry +-1 ms/batch of
run-to-run variance — this interleaves the two full e2e entries (uint8 in,
reduced scalar out) round-robin and reports medians, so the int8-vs-bf16 gap
is measured under identical conditions (VERDICT.md next-round item 2).

Usage: python tools/ab_dtype.py [--batch 256] [--steps 15] [--rounds 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.checkpoints.padding import needs_padding, pad_channels
    from mobilenet_tpu.models import mobilenet_v1
    from mobilenet_tpu.ops import preprocess as prep
    from mobilenet_tpu.quant import ops as qops
    from mobilenet_tpu.quant.model import (_as_device_tree, forward_i8,
                                           quantize_for_device)
    from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)

    dev = _as_device_tree(quantize_for_device(folded, cfg))
    fold_bf = pad_channels(folded) if needs_padding(folded) else folded
    params = to_device(fold_bf, dtype=jnp.bfloat16)

    def fn_bf16(u8):
        x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
        y = mobilenet_v1.forward(params, x, cfg, dw_backend="fused")
        return jnp.sum(y.astype(jnp.float32)).reshape(1)

    def fn_i8(u8):
        x = prep.preprocess(u8, cfg.resolution, jnp.float32)
        x_q = qops.quantize_input_dev(x, ACT_IN_SCALE, out_dtype=jnp.bfloat16)
        y = forward_i8(dev, x_q, cfg, use_fused=True)
        return jnp.sum(y).reshape(1)

    entries = {"bf16": jax.jit(fn_bf16), "int8": jax.jit(fn_i8)}

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.integers(
        0, 256, (args.batch, args.res, args.res, 3), dtype=np.uint8)))

    for label, fn in entries.items():
        t0 = time.perf_counter()
        _ = np.asarray(fn(img))
        print(f"{label}: compile+warm {time.perf_counter()-t0:.1f}s", flush=True)

    times = {k: [] for k in entries}
    for r in range(args.rounds):
        for label, fn in entries.items():
            _ = np.asarray(fn(img))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fn(img)
            _ = np.asarray(out)
            times[label].append((time.perf_counter() - t0) / args.steps * 1e3)
    meds = {}
    for label, ts in times.items():
        med = float(np.median(ts))
        meds[label] = med
        ips = args.batch / med * 1e3
        print(f"{label:>5}: median {med:7.3f} ms/batch -> {ips:,.0f} img/s  "
              f"(rounds: {[round(t, 2) for t in ts]})")
    print(f"int8/bf16 speed ratio: {meds['bf16'] / meds['int8']:.3f} "
          f"(>1 means int8 is faster)")


if __name__ == "__main__":
    main()
