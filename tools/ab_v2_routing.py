"""MobileNet-V2 routing race on the real chip: xla vs the fused
inverted-residual Pallas kernel (ops.pallas_ir_block).

Numerics gate first (logits must agree before timing counts), then
interleaved fenced windows — the same corrected-window methodology as
every other A/B here (utils/timing.fenced_window).

History: the first fused attempt routed only dw+projection through the V1
block kernel and was rejected by Mosaic at every standard V2 width
("vector<8x7x7x960xbf16> -> vector<392x960xbf16>: unsupported shape
cast" — expanded channels 96..960 are never %128==0). The IR kernel's
2D-in/2D-out + pad-E-in-VMEM design is the fix; this race measured it
at 4,163 vs 3,683 img/s xla (1.0-224 batch 256, 2026-08-17) on its first
hw run — before the early-blocks attack (see tools/prefix_attr.py
--model v2 for where the remaining time lives).

Usage: python tools/ab_v2_routing.py [--alpha 1.0] [--res 224] [--batch 256]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
    from mobilenet_tpu.models.mobilenet_v2 import V2Config, forward_v2
    from mobilenet_tpu.utils.timing import fenced_window

    from mobilenet_tpu.checkpoints.padding import pad_block0_v2

    cfg = V2Config(alpha=args.alpha, resolution=args.res,
                   compute_dtype="bfloat16")
    folded = fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps)
    params = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a, jnp.bfloat16)),
        {"xla": folded, "fused": pad_block0_v2(folded)})

    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (args.batch, args.res, args.res, 3)),
        jnp.bfloat16))

    # Each arm's tree is built exactly as production ships it (xla unpadded,
    # fused with the block-0 lane-divisor padding) — the round-3 autotune
    # lesson: padding is bit-neutral but not time-neutral.
    entries = {
        name: jax.jit(lambda v, p=params[name], b=name: forward_v2(
            p, v, cfg, dw_backend=b))
        for name in ("xla", "fused")
    }

    def sync(o):
        return np.asarray(o[0, :4])

    # numerics gate: logits agreement before any timing
    lg = {}
    for name, fn in entries.items():
        out = fn(x)
        sync(out)
        lg[name] = np.asarray(out[:8], np.float32)
    d = np.abs(lg["xla"] - lg["fused"]).max()
    agree = int((lg["xla"].argmax(-1) == lg["fused"].argmax(-1)).sum())
    print(f"numerics: max_abs_logit_diff={d:.3e} top1 {agree}/8", flush=True)

    results = {n: [] for n in entries}
    for r in range(args.rounds):
        for name, fn in entries.items():
            for _ in range(3):
                out = fn(x)
            sync(out)
            dt, steps = fenced_window(lambda: fn(x), sync, args.steps)
            ips = steps * args.batch / dt
            results[name].append(ips)
            print(f"round {r} {name:6s}: {ips:,.0f} img/s", flush=True)
    meds = {k: float(np.median(v)) for k, v in results.items()}
    print(f"medians: { {k: round(v, 1) for k, v in meds.items()} }  "
          f"winner={max(meds, key=meds.get)}", flush=True)


if __name__ == "__main__":
    main()
