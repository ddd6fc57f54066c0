"""Race the fused head kernel (ops/pallas_head.py) against the XLA ops
chain — one process, interleaved, e2e.

The head stretch (conv_last -> pool -> head -> fc on V3; pool+fc on V1)
measured 1.43 / ~1.2 ms/batch-256 against a ~0.03 ms floor (2026-08-19
prefix attribution): launch overhead across 4 (2) tiny kernels, not
compute. One Pallas launch with VMEM-resident weights should reclaim most
of it.
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
    ap.add_argument("--model", default="v3",
                    choices=["v1", "v2", "v3", "v3small"])
    args = ap.parse_args()

    from mobilenet_tpu.ops import preprocess as prep

    if args.model == "v1":
        from mobilenet_tpu import ModelConfig
        from mobilenet_tpu.checkpoints import fold_bn, init_params
        from mobilenet_tpu.models import mobilenet_v1 as mod

        cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                          compute_dtype="bfloat16")
        folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)
        fwd = lambda p, x, c, **kw: mod.forward(p, x, c, **kw)
        backend = "auto"
    elif args.model == "v2":
        from mobilenet_tpu.checkpoints.padding import pad_block0_v2
        from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
        from mobilenet_tpu.models import mobilenet_v2 as mod
        from mobilenet_tpu.models.mobilenet_v2 import V2Config, forward_v2

        cfg = V2Config(alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        folded = pad_block0_v2(
            fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps))
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)
        fwd = forward_v2
        backend = "fused"
    else:
        from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
        from mobilenet_tpu.models import mobilenet_v3 as mod
        from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3

        cfg = V3Config(variant="large" if args.model == "v3" else "small",
                       alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)
        fwd = forward_v3
        backend = "fused"

    entries = {}
    for label, flag in (("xla_head", False), ("fused_head", True)):
        def fn(images_u8, flag=flag):
            x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
            old = mod.FUSED_HEAD
            mod.FUSED_HEAD = flag  # trace-time knob
            try:
                return fwd(params, x, cfg, dw_backend=backend)
            finally:
                mod.FUSED_HEAD = old

        entries[label] = jax.jit(fn)

    img = make_batch(args.batch, args.res)
    ys = {k: np.asarray(f(img)).astype(np.float64)
          for k, f in entries.items()}
    d = np.abs(ys["fused_head"] - ys["xla_head"])
    scale = np.abs(ys["xla_head"]).max()
    agree = (ys["xla_head"].argmax(1) == ys["fused_head"].argmax(1)).mean()
    print(f"logits max_abs diff = {d.max():.4e}  (absmax {scale:.2f}, rel "
          f"{d.max() / scale:.2%}), top-1 agreement {agree:.4f}", flush=True)
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
