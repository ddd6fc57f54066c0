"""Interleaved A/B of MXU-matmul depthwise vs VPU-stencil depthwise for the
packed blocks (ops/pallas_block_packed_mxu.py).

Variants (full-network e2e, interleaved medians):
  vpu      — both packed blocks on the VPU stencil (round-1 routing)
  mxu_s1   — stride-1 packed blocks on the MXU, s2 on VPU
  mxu_s2   — stride-2 packed blocks on the MXU, s1 on VPU
  mxu_both — both on the MXU

Measured on v5e (1.0-224 batch-256): VPU wins both dtypes — bf16
14.24/11.07 ms (mxu s1/s2) vs 10.91 (vpu); int8 14.73/12.14 vs 12.02
(docs/design.md SS5). Kept as the reproduction harness.

Usage: python tools/ab_mxu_dw.py [--int8] [--batch 256] [--steps 15]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_common import compile_and_report, interleave_bench, make_batch

VARIANTS = {
    "vpu": (False, False),
    "mxu_s1": (True, False),
    "mxu_s2": (False, True),
    "mxu_both": (True, True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=15)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--variants", default="vpu,mxu_s1,mxu_s2,mxu_both")
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.checkpoints.padding import needs_padding, pad_channels
    from mobilenet_tpu.ops import pallas_block_packed_mxu as pbm
    from mobilenet_tpu.ops import preprocess as prep

    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)

    entries = {}
    if args.int8:
        from mobilenet_tpu.quant import ops as qops
        from mobilenet_tpu.quant.model import (_as_device_tree, forward_i8,
                                               quantize_for_device)
        from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

        dev = _as_device_tree(quantize_for_device(folded, cfg))
    else:
        from mobilenet_tpu.models import mobilenet_v1

        fold_bf = pad_channels(folded) if needs_padding(folded) else folded
        params = to_device(fold_bf, dtype=jnp.bfloat16)

    for name in args.variants.split(","):
        s1, s2 = VARIANTS[name]
        if args.int8:
            def fn(u8, s1=s1, s2=s2):
                pbm.DW_MXU_S1_I8, pbm.DW_MXU_S2_I8 = s1, s2  # trace-time
                x = prep.preprocess(u8, cfg.resolution, jnp.float32)
                x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                              out_dtype=jnp.bfloat16)
                y = forward_i8(dev, x_q, cfg, use_fused=True)
                return jnp.sum(y).reshape(1)
        else:
            def fn(u8, s1=s1, s2=s2):
                pbm.DW_MXU_S1_F, pbm.DW_MXU_S2_F = s1, s2
                x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
                y = mobilenet_v1.forward(params, x, cfg, dw_backend="fused")
                return jnp.sum(y.astype(jnp.float32)).reshape(1)

        entries[name] = jax.jit(fn)

    img = make_batch(args.batch, args.res)
    outs = compile_and_report(entries, img)
    base = outs[next(iter(outs))]
    tol = 0 if args.int8 else 1e-3
    agree = all(np.isclose(v, base, rtol=tol, atol=tol) for v in outs.values())
    print(f"outputs: {outs}  agree={agree}", flush=True)
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
