"""Benchmark regression check: fresh measurements vs the recorded artifacts.

SURVEY.md §5 (metrics/observability) calls for PROGRESS-style bench artifacts
for regression tracking; `benchmarks/*.jsonl` are the records. This tool
re-measures configs on the current device and flags any that fall below the
recorded number by more than a tolerance.

    python tools/regress.py                          # flagship 1.0-224
    python tools/regress.py --configs all            # every recorded bf16 row
    python tools/regress.py --configs all --int8     # every recorded int8 row
    python tools/regress.py --configs 0.25:128,1.0:224 --tolerance 0.10
    python tools/regress.py --model v2 --configs all # the V2 family rows

Tolerances default PER ROW from the measured tunnel-variance model
(BASELINE.md): configs under ~2 ms/batch spread ±15% run-to-run through the
tunnel (tolerance 0.30 = 2 sigma-ish), 2-5 ms ones are intermediate (0.15),
and ≥5 ms/batch configs repeat within ~0.2% (tolerance 0.08 covers fresh-
process jitter with margin). --tolerance overrides every row.

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


def variant_to_pair(variant: str):
    """'mobilenet_v1_0.25_128' / 'mobilenet_v2_1_224' /
    'mobilenet_v3_small_[min_]1_224' -> (alpha, res, minimalistic) —
    the min flag rides along so minimalistic rows regress as the model
    they were recorded with (round-3 review finding)."""
    stem = variant
    for pre in ("mobilenet_v1_", "mobilenet_v2_", "mobilenet_v3_large_",
                "mobilenet_v3_small_", "mobilenet_v3_"):
        stem = stem.removeprefix(pre)
    mini = stem.startswith("min_")
    stem = stem.removeprefix("min_")
    alpha_s, res_s = stem.rsplit("_", 1)
    return float(alpha_s), int(res_s), mini


def row_tolerance(ref_img_s: float, batch: int) -> float:
    """Variance-aware default tolerance from the recorded batch time."""
    ms_per_batch = batch / ref_img_s * 1e3
    if ms_per_batch < 2.0:
        return 0.30
    if ms_per_batch < 5.0:
        return 0.15
    return 0.08


def host_coupled_flags(current_cls: str, rows) -> list:
    """Cross-class comparison flags for HOST-COUPLED artifact rows.

    Device-side sweep rows repeat within ~0.2% and need no class; e2e and
    serving rows swung 2.6-3.7x across round-4 records purely with host
    capacity (VERDICT r4 weak #4/#5). A recorded row is only comparable to
    a fresh measurement within the same h2d capacity class
    (benchmarks/health_band_v5e.json h2d_class_hi_min). Returns one flag
    string per row whose class differs from (or predates) the current one.
    """
    flags = []
    for label, row in rows:
        cls = row.get("h2d_class") or (row.get("tunnel_health") or {}).get(
            "h2d_class")
        if cls is None:
            flags.append(f"{label}: UNSTAMPED host-coupled row — "
                         "capacity class unknown; re-record before comparing")
        elif cls != current_cls:
            flags.append(f"{label}: recorded in class '{cls}' vs current "
                         f"'{current_cls}' — host-coupled numbers are NOT "
                         "comparable across classes")
    return flags


def check_host_coupled(current_cls: str) -> int:
    """Load the host-coupled artifacts (bench contract e2e + latest serving
    rows per variant/arm/load) and print cross-class flags; returns count."""
    rows = []
    cpath = os.path.join(ART, "bench_contract_v5e.json")
    if os.path.exists(cpath):
        with open(cpath) as f:
            rows.append(("bench_contract e2e", json.load(f)))
    spath = os.path.join(ART, "serving_v5e.jsonl")
    latest = {}
    if os.path.exists(spath):
        with open(spath) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                row = json.loads(line)
                if "images_per_sec" not in row or "variant" not in row:
                    continue
                key = (row["variant"], row.get("dtype"),
                       row.get("arm", "tiered"), row.get("streams"))
                latest[key] = row  # later lines supersede earlier ones
    for (variant, dtype, arm, streams), row in sorted(
            latest.items(), key=str):
        rows.append((f"serving {variant} {dtype} {arm} s{streams}", row))
    flags = host_coupled_flags(current_cls, rows)
    for fl in flags:
        print(f"[host-coupled] {fl}")
    if not flags:
        print(f"[host-coupled] all {len(rows)} rows in current class "
              f"'{current_cls}'")
    return len(flags)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1.0:224",
                    help="comma list of alpha:res pairs, or 'all' for every "
                         "row recorded in the sweep artifact")
    ap.add_argument("--tolerance", type=float, default=None,
                    help="allowed fractional drop vs the recorded artifact "
                         "(default: per-row from the tunnel-variance model)")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--model", default="v1",
                    choices=["v1", "v2", "v3", "v3small"])
    ap.add_argument("--force-degraded", action="store_true",
                    help="measure anyway when the tunnel-health stamp is "
                         "outside the recorded band (results are suspect)")
    args = ap.parse_args()

    # Refuse to record regression verdicts on a degraded tunnel: the
    # 2026-08-20 03:13 session committed a phantom 7.5 ms attribution row
    # that only a human re-run caught (roofline_v5e.md methods note).
    from _bench_common import (check_health_band, h2d_class,
                               load_health_band, tunnel_health)

    stamp = tunnel_health()
    ok, reasons = check_health_band(stamp, load_health_band())
    if stamp.get("device") == "tpu":
        check_host_coupled(h2d_class(stamp))
    if not ok:
        print(f"TUNNEL DEGRADED: {'; '.join(reasons)}")
        if not args.force_degraded:
            print("refusing to measure (pass --force-degraded to override); "
                  "recorded artifacts stay authoritative")
            return 2

    from mobilenet_tpu.config import ModelConfig

    v2 = args.model == "v2"
    fam = {"v1": "", "v2": "v2_", "v3": "v3_",
           "v3small": "v3small_"}[args.model]
    if args.int8:
        from mobilenet_tpu.cli import _int8_throughput

        baseline = recorded(os.path.join(
            ART, f"sweep_{fam}int8_batch256_v5e.jsonl"))
    else:
        from mobilenet_tpu.runtime.pipeline import InferencePipeline

        baseline = recorded(os.path.join(
            ART, f"sweep_{fam}bf16_batch256_v5e.jsonl"))

    if args.configs == "all":
        pairs = sorted({variant_to_pair(v) for v in baseline})
        if not pairs:
            print("no recorded artifact rows to regress against")
            return 1
    else:
        pairs = [(float(a), int(r), False) for a, r in
                 (p.split(":") for p in args.configs.split(","))]

    failures = 0
    for alpha, res, mini in pairs:
        # bfloat16 matches how the bf16 sweep artifact was recorded
        # (cmd_sweep's default dtype); the int8 path quantizes internally.
        if v2:
            from mobilenet_tpu.models.mobilenet_v2 import V2Config

            cfg = V2Config(alpha=alpha, resolution=res,
                           compute_dtype="bfloat16")
        elif args.model in ("v3", "v3small"):
            from mobilenet_tpu.models.mobilenet_v3 import V3Config

            cfg = V3Config(variant="large" if args.model == "v3"
                           else "small", alpha=alpha, resolution=res,
                           minimalistic=mini, compute_dtype="bfloat16")
        else:
            cfg = ModelConfig(alpha=alpha, resolution=res,
                              compute_dtype="bfloat16")
        if args.int8 and args.model != "v1":
            import argparse as _ap

            from mobilenet_tpu.cli import _bench_int8_family

            row = _bench_int8_family(_ap.Namespace(
                alpha=alpha, res=res, batch=args.batch, steps=args.steps,
                seed=0, ckpt=None, model=args.model, minimalistic=mini))
            fresh = row["images_per_sec"]
        elif args.int8:
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
        tol = (args.tolerance if args.tolerance is not None
               else row_tolerance(ref, args.batch))
        drop = 1.0 - fresh / ref
        if drop > tol:
            # One retry before flagging: the 2026-08-20 full-sweep run
            # produced a single -11.9% row (V1 int8 0.75-160) that
            # re-measured at +0.2%/-0.4% immediately after — one-shot
            # dispatch anomalies in long runs are real; a regression is
            # not transient and fails twice.
            print(f"[retry] {cfg.variant_name()}: first window "
                  f"{fresh:,.0f} ({-drop:+.1%}) — re-measuring once",
                  flush=True)
            first = fresh
            if args.int8 and args.model != "v1":
                import argparse as _ap2  # noqa: PLC0415

                from mobilenet_tpu.cli import (  # noqa: PLC0415
                    _bench_int8_family as _bif)

                row = _bif(_ap2.Namespace(
                    alpha=alpha, res=res, batch=args.batch,
                    steps=args.steps, seed=0, ckpt=None, model=args.model,
                    minimalistic=mini))
                second = row["images_per_sec"]
            elif args.int8:
                from mobilenet_tpu.cli import (  # noqa: PLC0415
                    _int8_throughput as _i8t)

                row = _i8t(cfg, args.batch, args.steps, 0, latency=False)
                second = row["images_per_sec"]
            else:
                from mobilenet_tpu.runtime.pipeline import (  # noqa: PLC0415
                    InferencePipeline as _IP)

                second = _IP(cfg, seed=0).benchmark(
                    batch_size=args.batch,
                    steps=args.steps)["images_per_sec"]
            # max() covers the documented one-shot-anomaly case, but a row
            # whose two windows disagree by more than the tolerance is
            # BIMODAL, not anomalous — say so even when the fast window
            # passes, so the behavior is visible in the log (ADVICE.md r4).
            if abs(first - second) / ref > tol:
                print(f"[bimodal] {cfg.variant_name()}: windows "
                      f"{first:,.0f} / {second:,.0f} img/s disagree by "
                      f"{abs(first - second) / ref:.1%} (> tol {tol:.0%}) — "
                      "gating on the faster one; investigate if persistent",
                      flush=True)
            fresh = max(first, second)
            drop = 1.0 - fresh / ref
        ok = drop <= tol
        print(f"[{'OK ' if ok else 'FAIL'}] {cfg.variant_name()}: "
              f"fresh {fresh:,.0f} vs recorded {ref:,.0f} img/s "
              f"({-drop:+.1%}, tol -{tol:.0%})", flush=True)
        failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
