"""Race the lane-packed s1 SE bottleneck route (ops/pallas_se_packed.py)
against the dense whole-image kernel — one process, interleaved, e2e.

At V3-Large 1.0-224 the route captures b2 (56², Cin=32), b4 and b5 (28²,
Cin=40 -> Cp=64): 1.35 + 1.11 + 1.43 ms in-network on the dense kernel
(benchmarks/roofline_v5e.md 2026-08-19 map) at <= 31% lane occupancy.
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
    from mobilenet_tpu.models import mobilenet_v3 as mod
    from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3
    from mobilenet_tpu.ops import preprocess as prep

    cfg = V3Config(variant="large" if args.model == "v3" else "small",
                   alpha=args.alpha, resolution=args.res,
                   compute_dtype="bfloat16")
    folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)

    # (label, PACKED_SE value, PACKED_SE_BN) — subsets race which blocks
    # earn the packed route e2e (standalone wins don't compose: the
    # widened cout a packed b4/b5 hands b6 taxes the downstream kernel).
    variants = [("dense", False, None),
                ("packed_all", True, None),
                ("packed_all_bn1", True, 1),
                ("packed_b2_bn1", frozenset({2}), 1),
                ("packed_b45_bn1", frozenset({4, 5}), 1)]
    entries = {}
    for label, flag, bn in variants:
        def fn(images_u8, flag=flag, bn=bn):
            x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
            old, oldbn = mod.PACKED_SE, mod.PACKED_SE_BN
            mod.PACKED_SE, mod.PACKED_SE_BN = flag, bn  # trace-time knobs
            try:
                return forward_v3(params, x, cfg, dw_backend="fused")
            finally:
                mod.PACKED_SE, mod.PACKED_SE_BN = old, oldbn

        entries[label] = jax.jit(fn)

    img = make_batch(args.batch, args.res)
    ys = {k: np.asarray(f(img)).astype(np.float64)
          for k, f in entries.items()}
    d = np.abs(ys["packed_all"] - ys["dense"])
    scale = np.abs(ys["dense"]).max()
    agree = (ys["dense"].argmax(1) == ys["packed_all"].argmax(1)).mean()
    print(f"logits max_abs diff = {d.max():.4e}  (absmax {scale:.2f}, rel "
          f"{d.max() / scale:.2%}), top-1 agreement {agree:.4f}", flush=True)
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
