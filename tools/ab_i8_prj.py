"""Race the int8 V3 kernel's projection dot: bf16-exact vs s8 (+ f32->i8
cast) — one process, interleaved, e2e int8 V3.

The s8 projection needs the dw/SE output cast f32 -> int8 at full width
(an int8 (32,128)-tile repack per block, the narrow-dtype relayout class
of design.md §3); the bf16 dot on the same exact integers replaces it
with a cheap truncation. Both are bit-identical to the oracle — this
race picks the FASTER exact program.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_common import interleave_bench, make_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--model", default="v3", choices=["v3", "v3small"])
    args = ap.parse_args()

    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.ops import preprocess as prep
    from mobilenet_tpu.quant import pallas_ir_v3_i8 as pk
    from mobilenet_tpu.quant.quantize import ACT_IN_SCALE
    from mobilenet_tpu.quant.v3 import (_as_device_tree_v3, forward_v3_i8,
                                        quantize_v3)

    cfg = V3Config(variant="large" if args.model == "v3" else "small",
                   alpha=args.alpha, resolution=args.res)
    folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    dev = _as_device_tree_v3(quantize_v3(folded, cfg))

    entries = {}
    for label, flag in (("s8_prj", False), ("bf16_prj", True)):
        def fn(images_u8, flag=flag):
            from mobilenet_tpu.quant.ops import quantize_input_dev

            x = prep.preprocess(images_u8, cfg.resolution, jnp.float32)
            x_q = quantize_input_dev(x, ACT_IN_SCALE, out_dtype=jnp.bfloat16)
            old = pk.PRJ_BF16_DOT
            pk.PRJ_BF16_DOT = flag
            try:
                return forward_v3_i8(dev, x_q, cfg, use_fused=True)
            finally:
                pk.PRJ_BF16_DOT = old

        entries[label] = jax.jit(fn)

    img = make_batch(args.batch, args.res)
    ys = {k: np.asarray(f(img)).astype(np.float64)
          for k, f in entries.items()}
    d = np.abs(ys["bf16_prj"] - ys["s8_prj"])
    print(f"int8 logits max_abs diff = {d.max():.4e} "
          f"(EXACT contract: must be 0)", flush=True)
    assert d.max() == 0.0
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
