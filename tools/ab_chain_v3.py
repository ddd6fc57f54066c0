"""Race the chain megakernel route (ops/pallas_chain_v3.py) against the
per-block dense route — one process, interleaved, e2e.

At V3-Large 1.0-224 the chain captures b2-b5 (56²/28², one launch) and
b6-b11 (28²->14², one launch): 10 dense launches with ~0.08 ms of HBM
boundary each collapse into 2. The per-block route measured 0.77-1.23
ms/block at 14² against ~0.02 ms of MXU work (roofline_v5e.md)."""

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
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--model", default="v3", choices=["v3", "v3small"])
    ap.add_argument("--segs", default="greedy,6:12,12:14,6:12+12:14",
                    help="comma list of chain segmentations: 'greedy', or "
                         "'+'-joined start:stop ranges")
    ap.add_argument("--bn", type=int, default=None,
                    help="chain block_n override (default auto)")
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

    variants = [("per_block", False, None)]
    for tok in args.segs.split(","):
        tok = tok.strip()
        if tok == "greedy":
            variants.append(("chain_greedy", True, args.bn))
        else:
            ranges = tuple(tuple(map(int, r.split(":")))
                           for r in tok.split("+"))
            variants.append((f"chain_{tok}", ranges, args.bn))

    entries = {}
    for label, flag, bn in variants:
        def fn(images_u8, flag=flag, bn=bn):
            x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
            old = (mod.CHAIN_V3, mod.CHAIN_V3_SMALL, mod.CHAIN_V3_BN)
            # trace-time knobs (CHAIN is per-variant since 2026-08-20)
            mod.CHAIN_V3 = mod.CHAIN_V3_SMALL = flag
            mod.CHAIN_V3_BN = bn
            try:
                return forward_v3(params, x, cfg, dw_backend="fused")
            finally:
                mod.CHAIN_V3, mod.CHAIN_V3_SMALL, mod.CHAIN_V3_BN = old

        entries[label] = jax.jit(fn)

    img = make_batch(args.batch, args.res)
    ys = {}
    for label, f in entries.items():
        ys[label] = np.asarray(f(img)).astype(np.float64)
        print(f"warmed {label}", flush=True)
    base = ys["per_block"]
    scale = np.abs(base).max()
    for label, y in ys.items():
        if label == "per_block":
            continue
        d = np.abs(y - base)
        agree = (base.argmax(1) == y.argmax(1)).mean()
        print(f"{label}: max_abs diff {d.max():.4e} (rel "
              f"{d.max() / scale:.2%}), top-1 agreement {agree:.4f}",
              flush=True)
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
