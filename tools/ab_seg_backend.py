"""Race per-SEGMENT dw-backend choices end-to-end on the chip.

The routing crossover (benchmarks/routing_crossover_v5e.jsonl) raced uniform
tuples (all-xla / all-fused / the batch-1 mixed tuple). The roofline audit
(tools/roofline.py) shows the dense mid-network segments at 39-45% of their
floors, so this tool asks a sharper question: within an otherwise-fused
network, does flipping ONE segment's blocks to XLA grouped conv help at
throughput batches? Each candidate is a full-net per-block routing tuple
(models.mobilenet_v1.forward accepts one), raced with fetch-fenced windows,
interleaved rounds, one process.

  python tools/ab_seg_backend.py [--batch 256] [--segments B2-B5,B6-B12]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

# segment label -> block index range (same bounds as tools/roofline.py)
SEGMENTS = {"B0": (0, 1), "B1": (1, 2), "B2-B5": (2, 6), "B6-B12": (6, 13)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--segments", default="B2-B5,B6-B12")
    ap.add_argument("--flip-to", default="xla", choices=["xla", "pallas"])
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.models import mobilenet_v1
    from mobilenet_tpu.ops import preprocess as prep
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    params = to_device(fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps),
                       dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.integers(
        0, 256, (args.batch, args.res, args.res, 3), dtype=np.uint8)))

    nblocks = len(cfg.block_strides)
    tuples = {"all_fused": ("fused",) * nblocks}
    for seg in args.segments.split(","):
        lo, hi = SEGMENTS[seg]
        t = ["fused"] * nblocks
        t[lo:hi] = [args.flip_to] * (hi - lo)
        tuples[f"{seg}->{args.flip_to}"] = tuple(t)

    def sync(o):
        return np.asarray(o[0, :4])

    entries = {}
    ref = None
    for name, routing in tuples.items():
        def fn(u8, routing=routing):
            x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
            return mobilenet_v1.forward(params, x, cfg, dw_backend=routing)

        e = jax.jit(fn)
        t0 = time.perf_counter()
        out = np.asarray(e(img)[:2], np.float32)
        print(f"compile {name}: {time.perf_counter()-t0:5.1f}s", flush=True)
        if ref is None:
            ref = out
        else:
            assert np.allclose(out, ref, atol=6e-2), name
        entries[name] = e

    meas = {k: [] for k in entries}
    for _ in range(args.rounds):
        for k, e in entries.items():
            sync(e(img))
            dt, n = fenced_window(lambda e=e: e(img), sync, args.steps)
            meas[k].append(n * args.batch / dt)
    for k in entries:
        med = float(np.median(meas[k]))
        print(json.dumps({"routing": k, "images_per_sec": round(med, 1),
                          "runs": [round(v, 1) for v in meas[k]]}),
              flush=True)


if __name__ == "__main__":
    main()
