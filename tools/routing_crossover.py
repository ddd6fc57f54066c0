"""Measure the routing crossover: xla vs fused vs mixed across batch sizes.

Round-2 shipped `_routing`'s "auto" threshold (fused at batch >= 32) from two
measured points (batch 1 and 256) — everything between was interpolation
(VERDICT weak #2). This tool races the candidates at the micro-batcher's
partial-fill sizes in ONE process, interleaved rounds, medians:

  - batch 1: RTT-cancelled differenced scan chains (ms/forward, lower wins) —
    a fenced window at batch 1 is tunnel-dispatch-dominated
  - batch >= 2: fetch-fenced >= min-window throughput (img/s, higher wins)

Usage (chunk long runs; each (candidate, batch) graph is one remote compile,
cached across processes):
  python tools/routing_crossover.py --batches 1,8,16,32,64,128
  python tools/routing_crossover.py --int8 --batches 1,8,32,256
Appends JSONL rows to benchmarks/routing_crossover_v5e.jsonl with --record.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "routing_crossover_v5e.jsonl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batches", default="1,8,16,32,64,128")
    ap.add_argument("--candidates", default=None,
                    help="comma list; default xla,fused,mixed")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--record", action="store_true",
                    help=f"append rows to {ART}")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.runtime.autotune import (_float_latency_ms,
                                                _int8_latency_ms)
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    cands = (args.candidates.split(",") if args.candidates
             else ["xla", "fused", "mixed"])
    batches = [int(b) for b in args.batches.split(",")]
    dtype_name = "int8" if args.int8 else "bfloat16"
    rows = []

    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.checkpoints.padding import needs_padding, pad_channels

    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    if needs_padding(folded):
        folded = pad_channels(folded)

    if args.int8:
        from mobilenet_tpu.ops import preprocess as prep
        from mobilenet_tpu.quant import ops as qops
        from mobilenet_tpu.quant.model import (_as_device_tree, forward_i8,
                                               quantize_for_device)
        from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

        dev = _as_device_tree(quantize_for_device(folded, cfg,
                                                  use_fused=True))

        def make_entry(cand):
            def fn(u8):
                x = prep.preprocess(u8, cfg.resolution, jnp.float32)
                x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                              out_dtype=jnp.bfloat16)
                return forward_i8(dev, x_q, cfg, use_fused=cand)

            return jax.jit(fn)

        def latency_ms(cand):
            return _int8_latency_ms(cfg, dev, cand)
    else:
        from mobilenet_tpu.models import mobilenet_v1
        from mobilenet_tpu.ops import preprocess as prep

        params = to_device(folded, dtype=jnp.bfloat16)

        def make_entry(cand):
            def fn(u8):
                x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
                return mobilenet_v1.forward(params, x, cfg, dw_backend=cand)

            return jax.jit(fn)

        def latency_ms(cand):
            return _float_latency_ms(cfg, params, cand, jnp.bfloat16)

    def sync(out):
        return np.asarray(out[0, :4])

    rng = np.random.default_rng(0)
    for batch in batches:
        if batch == 1:
            for cand in cands:
                ms = latency_ms(cand)
                row = {"variant": cfg.variant_name(), "dtype": dtype_name,
                       "batch": 1, "candidate": cand,
                       "device_latency_ms": round(ms, 4)}
                rows.append(row)
                print(json.dumps(row), flush=True)
            continue
        img = jax.device_put(jnp.asarray(rng.integers(
            0, 256, (batch, args.res, args.res, 3), dtype=np.uint8)))
        entries = {c: make_entry(c) for c in cands}
        for c, e in entries.items():
            t0 = time.perf_counter()
            sync(e(img))
            print(f"compile {c} batch={batch}: {time.perf_counter()-t0:5.1f}s",
                  flush=True)
        meas = {c: [] for c in cands}
        for _ in range(args.rounds):
            for c, e in entries.items():
                sync(e(img))  # re-warm after switching graphs
                dt, n = fenced_window(lambda e=e: e(img), sync, args.steps)
                meas[c].append(n * batch / dt)
        for c in cands:
            row = {"variant": cfg.variant_name(), "dtype": dtype_name,
                   "batch": batch, "candidate": c,
                   "images_per_sec": round(float(np.median(meas[c])), 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    if args.record:
        with open(ART, "a") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")
        print(f"recorded {len(rows)} rows to {ART}")


if __name__ == "__main__":
    main()
