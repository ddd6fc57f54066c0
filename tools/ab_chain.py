"""Interleaved A/B of the systolic software-pipelined chain kernel over the
14^2 stretch vs per-block fused calls (ops/pallas_chain_systolic.py).

Variants (full-network e2e, interleaved medians):
  blocks — per-block fused Pallas calls (default routing)
  chain  — the 14^2 stretch (blocks 6..10 at alpha=1.0) as ONE systolic
           kernel: stage k on tile i-k per grid step, intermediates VMEM-only

Usage: python tools/ab_chain.py [--batch 256] [--steps 15]
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
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.checkpoints.padding import needs_padding, pad_channels
    from mobilenet_tpu.models import mobilenet_v1
    from mobilenet_tpu.ops import pallas_chain_systolic as pcs
    from mobilenet_tpu.ops import preprocess as prep

    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    fold_bf = pad_channels(folded) if needs_padding(folded) else folded
    params = to_device(fold_bf, dtype=jnp.bfloat16)

    entries = {}
    for name, flag in [("blocks", False), ("chain", True)]:
        def fn(u8, flag=flag):
            pcs.CHAIN_SYSTOLIC_F = flag  # resolved at trace time
            x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
            y = mobilenet_v1.forward(params, x, cfg, dw_backend="fused")
            return jnp.sum(y.astype(jnp.float32)).reshape(1)

        entries[name] = jax.jit(fn)

    img = make_batch(args.batch, args.res)
    outs = compile_and_report(entries, img)
    agree = np.isclose(outs["blocks"], outs["chain"], rtol=1e-3)
    print(f"outputs: {outs}  agree={bool(agree)}", flush=True)
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
