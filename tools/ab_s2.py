"""Interleaved A/B of the stride-2 even-column selection strategy.

A = reshape-gather of the f32 accumulator (round-1 design)
B = free lane-merge + K-zero-padded pointwise weight (MXU drops odd columns)

Affects the dense s2 blocks (B3 cin=128, B5 cin=256, B11 cin=512); the packed
s2 block (B1) already selects in the MXU. Measures the FULL network e2e
(standalone micro-benches mislead through the tunnel, docs/design.md SS5),
interleaving 5 rounds per variant and reporting medians.

Usage: python tools/ab_s2.py [--int8] [--batch 256] [--steps 15]
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
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.ops import preprocess as prep
    from mobilenet_tpu.ops import pallas_block as pb
    from mobilenet_tpu.quant import pallas_block_i8 as pbi

    cfg = ModelConfig(alpha=1.0, resolution=224, compute_dtype="bfloat16")
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)

    entries = {}
    for label, flag in [("A:gather", False), ("B:mxu", True)]:
        pb.S2_MXU_SUBSAMPLE = flag
        pbi.S2_MXU_SUBSAMPLE = flag
        if args.int8:
            from mobilenet_tpu.quant import ops as qops
            from mobilenet_tpu.quant.model import (_as_device_tree, forward_i8,
                                                   quantize_for_device)
            from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

            dev = _as_device_tree(quantize_for_device(folded, cfg))

            def fn(u8, dev=dev, flag=flag):
                pbi.S2_MXU_SUBSAMPLE = flag  # resolved at trace time
                x = prep.preprocess(u8, cfg.resolution, jnp.float32)
                y = forward_i8(dev, qops.quantize_input_dev(x, ACT_IN_SCALE),
                               cfg, use_fused=True)
                return jnp.sum(y).reshape(1)
        else:
            from mobilenet_tpu.models import mobilenet_v1

            params = to_device(folded, dtype=jnp.bfloat16)

            def fn(u8, params=params, flag=flag):
                pb.S2_MXU_SUBSAMPLE = flag
                x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
                y = mobilenet_v1.forward(params, x, cfg, dw_backend="fused")
                return jnp.sum(y.astype(jnp.float32)).reshape(1)

        entries[label] = jax.jit(fn)

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.integers(
        0, 256, (args.batch, 224, 224, 3), dtype=np.uint8)))

    outs = {}
    for label, fn in entries.items():
        outs[label] = float(np.asarray(fn(img))[0])  # compile + warm
    ok = np.isclose(outs["A:gather"], outs["B:mxu"], rtol=1e-3)
    print(f"outputs: {outs}  agree={bool(ok)}", flush=True)

    times = {k: [] for k in entries}
    for r in range(args.rounds):
        for label, fn in entries.items():
            _ = np.asarray(fn(img))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fn(img)
            _ = np.asarray(out)
            times[label].append((time.perf_counter() - t0) / args.steps * 1e3)
    for label, ts in times.items():
        med = float(np.median(ts))
        ips = args.batch / med * 1e3
        print(f"{label:>9}: median {med:7.3f} ms/batch -> {ips:,.0f} img/s  "
              f"(rounds: {[round(t, 2) for t in ts]})")


if __name__ == "__main__":
    main()
