"""One-process A/B: the product path (InferencePipeline probs_u8 entry)
vs a direct fused-routing jit of the same V3 model — separates harness
effects from session/tunnel state when regress and the ab tools
disagree (2026-08-19: regress 13,840 vs ab_se_packed dense 15,802 on
the same chip, same code).
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
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--rounds", type=int, default=5)
    args = ap.parse_args()

    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models import mobilenet_v3 as mv3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.ops import preprocess as prep
    from mobilenet_tpu.runtime.pipeline import InferencePipeline

    cfg = V3Config(variant="large", alpha=args.alpha, resolution=args.res,
                   compute_dtype="bfloat16")
    pipe = InferencePipeline(cfg, seed=0)
    entry = pipe._entry("probs_u8")

    folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)

    def direct(images_u8):
        x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
        return mv3.forward_v3(params, x, cfg, dw_backend="fused")

    def direct_auto(images_u8):
        x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
        return mv3.forward_v3(params, x, cfg, dw_backend="auto")

    def via_pipe_params(images_u8):
        # the pipeline's own device tree through predict_probs_v3_u8 —
        # exactly what benchmark() compiles
        return entry(pipe.params, images_u8)

    entries = {
        "pipeline": via_pipe_params,
        "direct_fused": jax.jit(direct),
        "direct_auto": jax.jit(direct_auto),
    }
    img = make_batch(args.batch, args.res)
    for label, fn in entries.items():
        np.asarray(fn(img))
        print(f"warmed {label}", flush=True)
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
