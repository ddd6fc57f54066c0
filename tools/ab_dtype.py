"""Interleaved A/B: bf16 fused network vs int8 fused network, ONE process.

Measures the true int8-vs-bf16 gap under identical conditions (VERDICT.md
round-1 item 2); see docs/design.md SS3.4 for the measured result and the
structural account of the residual gap.

Usage: python tools/ab_dtype.py [--batch 256] [--steps 15] [--rounds 5]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from _bench_common import compile_and_report, interleave_bench, make_batch


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
    img = make_batch(args.batch, args.res)
    compile_and_report(entries, img)
    meds = interleave_bench(entries, img, args.batch, args.steps, args.rounds)
    print(f"int8/bf16 speed ratio: {meds['bf16'] / meds['int8']:.3f} "
          f"(>1 means int8 is faster)")


if __name__ == "__main__":
    main()
