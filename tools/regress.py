"""Benchmark regression check: fresh measurements vs the recorded artifacts.

SURVEY.md §5 (metrics/observability) calls for PROGRESS-style bench artifacts
for regression tracking; `benchmarks/*.jsonl` are the records. This tool
re-measures a subset of configs on the current device and flags any that fall
more than --tolerance below the recorded number.

    python tools/regress.py                        # flagship bf16 + int8
    python tools/regress.py --configs 0.25:128,1.0:224 --tolerance 0.10

Exit 1 if any config regresses. Records are matched by variant name within
the artifact for the current dtype.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks")


def recorded(path: str) -> dict:
    rows = {}
    if not os.path.exists(path):
        return rows
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            row = json.loads(line)
            rows[row["variant"]] = row["images_per_sec"]
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1.0:224",
                    help="comma list of alpha:res pairs")
    ap.add_argument("--tolerance", type=float, default=0.10,
                    help="allowed fractional drop vs the recorded artifact")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    from mobilenet_tpu.config import ModelConfig

    if args.int8:
        from mobilenet_tpu.cli import _int8_throughput

        baseline = recorded(os.path.join(ART, "sweep_int8_batch256_v5e.jsonl"))
    else:
        from mobilenet_tpu.runtime.pipeline import InferencePipeline

        baseline = recorded(os.path.join(ART, "sweep_bf16_batch256_v5e.jsonl"))

    failures = 0
    for pair in args.configs.split(","):
        alpha, res = pair.split(":")
        # bfloat16 matches how the bf16 sweep artifact was recorded
        # (cmd_sweep's default dtype); the int8 path quantizes internally.
        cfg = ModelConfig(alpha=float(alpha), resolution=int(res),
                          compute_dtype="bfloat16")
        if args.int8:
            row = _int8_throughput(cfg, args.batch, args.steps, 0, latency=False)
            fresh = row["images_per_sec"]
        else:
            pipe = InferencePipeline(cfg, seed=0)
            fresh = pipe.benchmark(batch_size=args.batch,
                                   steps=args.steps)["images_per_sec"]
        ref = baseline.get(cfg.variant_name())
        if ref is None:
            print(f"[??  ] {cfg.variant_name()}: fresh {fresh:,.0f} img/s "
                  "(no recorded baseline)")
            continue
        drop = 1.0 - fresh / ref
        ok = drop <= args.tolerance
        print(f"[{'OK ' if ok else 'FAIL'}] {cfg.variant_name()}: "
              f"fresh {fresh:,.0f} vs recorded {ref:,.0f} img/s "
              f"({-drop:+.1%})")
        failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
