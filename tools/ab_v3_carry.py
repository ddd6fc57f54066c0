"""Race int8 V3 CARRY_MIN_H settings: how deep should bf16 integer
carriage extend into the fused int8 V3 route?

The 2026-08-19 int8-vs-bf16 attribution (v3_campaign_raw.log) leaves
blocks[3:6) (28-sq SE blocks) +2.7 ms and blocks[12:13) +0.6 ms over
their bf16 twins; those blocks run int8 carriers today (CARRY_MIN_H=56
was set from the 112-sq 6x element-window measurement, small spatials
untested for V3's whole/wpad modes). This tool races the full int8 net
e2e with CARRY_MIN_H in {56, 28, 14, 7}, one process, interleaved.

Exactness is structural (the carrier holds the same integers; the plan's
bias bound guards the bf16 expand dot), but each candidate is still
logit-compared against the shipping one before timing.
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
    ap.add_argument("--carries", default="56,28,14,7")
    args = ap.parse_args()

    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.ops import preprocess as prep
    from mobilenet_tpu.quant import ops as qops
    from mobilenet_tpu.quant import v3 as qv3
    from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

    cfg = V3Config(variant="large" if args.model == "v3" else "small",
                   alpha=args.alpha, resolution=args.res,
                   compute_dtype="bfloat16")
    folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    dev = qv3._as_device_tree_v3(qv3.quantize_v3(folded, cfg))

    entries = {}
    for carry in [int(c) for c in args.carries.split(",")]:
        def fn(images_u8, carry=carry):
            x = prep.preprocess(images_u8, cfg.resolution, jnp.float32)
            x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                          out_dtype=jnp.bfloat16)
            old = qv3.CARRY_MIN_H
            qv3.CARRY_MIN_H = carry  # trace-time plan knob
            try:
                y = qv3.forward_v3_i8(dev, x_q, cfg, use_fused=True)
            finally:
                qv3.CARRY_MIN_H = old
            return y

        entries[f"carry{carry}"] = jax.jit(fn)

    img = make_batch(args.batch, args.res)
    # compile + logits equality gate vs the first (shipping) candidate
    ref = None
    for label, f in entries.items():
        y = np.asarray(f(img))
        if ref is None:
            ref = y
        else:
            d = float(np.abs(y.astype(np.float64)
                             - ref.astype(np.float64)).max())
            print(f"{label}: logits max_abs vs ship = {d:.3e}", flush=True)
            assert d == 0.0, f"{label} broke int8 exactness"
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
