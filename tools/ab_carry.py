"""Interleaved A/B of bf16-carried int8 activations between dense blocks.

Carried blocks store requantized integers as bf16 (exact for |v| <= 127):
the consumer skips the i8 -> i32 -> f32 window widen and the producer skips
the i8 store, at 2x the HBM bytes on that boundary. The threshold is the
block's OUTPUT spatial side:
  0    = carriage off (i8 everywhere, round-1 behavior)
  14   = carry the 14^2/7^2 stretch only (B6..B12)
  28   = + the 28^2 blocks (B4..B5)
  1000 = every dense block (B2.. at 56^2 too)

Measured on v5e (1.0-224 batch-256): a WASH — 12.12 (off) / 12.13 / 12.15 /
12.31 ms — the widen fuses into the window pipeline (docs/design.md SS5).
Kept as the reproduction harness; default routing stays off.

Usage: python tools/ab_carry.py [--batch 256] [--steps 15] [--carries 0,14,28,1000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_common import compile_and_report, interleave_bench, make_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--carries", default="0,14,28,1000")
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params
    from mobilenet_tpu.ops import preprocess as prep
    from mobilenet_tpu.quant import ops as qops
    from mobilenet_tpu.quant.model import (_as_device_tree, forward_i8,
                                           quantize_for_device)
    from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    dev = _as_device_tree(quantize_for_device(folded, cfg))

    entries = {}
    for carry in [int(c) for c in args.carries.split(",")]:

        def fn(u8, carry=carry):
            x = prep.preprocess(u8, cfg.resolution, jnp.float32)
            x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                          out_dtype=jnp.bfloat16)
            y = forward_i8(dev, x_q, cfg, use_fused=True,
                           bf16_carry_max_hw=carry)
            return jnp.sum(y).reshape(1)

        entries[f"carry<={carry}"] = jax.jit(fn)

    img = make_batch(args.batch, args.res)
    outs = compile_and_report(entries, img)
    vals = list(outs.values())
    agree = all(v == vals[0] for v in vals)
    print(f"outputs: {outs}  bit_agree={agree}", flush=True)
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
