"""Interleaved A/B of the stride-2 even-column selection strategy.

A = reshape-gather of the f32 accumulator (round-1 design)
B = free lane-merge + K-zero-padded pointwise weight (MXU drops odd columns)

Affects the dense s2 blocks with cin % 128 == 0 (B3 cin=128, B5 cin=256,
B11 cin=512; cin=192 at alpha=0.75 always gathers — the lane-merge is
illegal there, see pallas_block_i8). Measures the FULL network e2e
(standalone micro-benches mislead through the tunnel, docs/design.md SS5).
Measured: B wins int8 (12.18 vs 12.40 ms), A wins bf16 — per-dtype defaults.

Usage: python tools/ab_s2.py [--int8] [--batch 256] [--steps 15]
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
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.ops import preprocess as prep
    from mobilenet_tpu.ops import pallas_block as pb
    from mobilenet_tpu.quant import pallas_block_i8 as pbi

    cfg = ModelConfig(alpha=1.0, resolution=224, compute_dtype="bfloat16")
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)

    if args.int8:
        from mobilenet_tpu.quant import ops as qops
        from mobilenet_tpu.quant.model import (_as_device_tree, forward_i8,
                                               quantize_for_device)
        from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

        dev = _as_device_tree(quantize_for_device(folded, cfg))
    else:
        from mobilenet_tpu.models import mobilenet_v1

        params = to_device(folded, dtype=jnp.bfloat16)

    entries = {}
    for label, flag in [("A:gather", False), ("B:mxu", True)]:
        if args.int8:
            def fn(u8, flag=flag):
                pbi.S2_MXU_SUBSAMPLE = flag  # resolved at trace time
                x = prep.preprocess(u8, cfg.resolution, jnp.float32)
                x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                              out_dtype=jnp.bfloat16)
                y = forward_i8(dev, x_q, cfg, use_fused=True)
                return jnp.sum(y).reshape(1)
        else:
            def fn(u8, flag=flag):
                pb.S2_MXU_SUBSAMPLE = flag
                x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
                y = mobilenet_v1.forward(params, x, cfg, dw_backend="fused")
                return jnp.sum(y.astype(jnp.float32)).reshape(1)

        entries[label] = jax.jit(fn)

    img = make_batch(args.batch, 224)
    outs = compile_and_report(entries, img)
    ok = np.isclose(outs["A:gather"], outs["B:mxu"],
                    rtol=0 if args.int8 else 1e-3)
    print(f"outputs: {outs}  agree={bool(ok)}", flush=True)
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
