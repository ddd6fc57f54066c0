"""Compile-only kernel tier: lower every shipping Pallas route to Mosaic
without the chip (the `hw_emu` analog — SURVEY.md SS4's middle flow tier).

The repo's sw_emu tier runs kernels in Python interpret mode (semantics, not
lowering) and the hw tier needs the TPU tunnel, which is down for whole
sessions at a time (2026-08-20 produced zero on-chip evidence). In between
sits this check: `jax.export` cross-platform lowering builds the FULL
StableHLO module for platform "tpu" on the CPU backend — including the
Pallas->Mosaic kernel lowering pass that produces each `tpu_custom_call`
payload — so type/layout/shape regressions in kernel code surface in
seconds, offline. What it cannot catch: Mosaic->machine-code errors (the
device-side compile, e.g. scoped-VMEM overflow), which remain hw-tier.

    python tools/lower_check.py            # all families x dtypes, ships routing
    python tools/lower_check.py --only v3small:int8
    make lower-check

Exit 1 on any lowering failure. Each entry reports its tpu_custom_call
count — a route silently falling back to XLA (count drop) is also a finding.
"""

import argparse
import os
import sys
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Flagship configs per family; batch 256 = the throughput routing the sweeps
# ship, batch 1 = the measured MIXED batch-1 routing (both are production).
ENTRIES = [
    ("v1", "bf16", 256), ("v1", "int8", 256),
    ("v2", "bf16", 256), ("v2", "int8", 256),
    ("v3", "bf16", 256), ("v3", "int8", 256),
    ("v3small", "bf16", 256), ("v3small", "int8", 256),
    ("v1", "bf16", 1), ("v2", "bf16", 1), ("v3", "bf16", 1),
    ("v3small", "bf16", 1),
    # int8 batch-1 FUSED became production for v2/v3small on 2026-08-20
    # (resolve_int8_fused family-aware crossover); lower those tilings too
    ("v2", "int8", 1), ("v3small", "int8", 1),
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma list of model:dtype[:batch] filters")
    ap.add_argument("--verbose", action="store_true",
                    help="dump full exception text on failures")
    args = ap.parse_args()

    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax import export

    from mobilenet_tpu.ops import pallas_dw
    from prefix_attr import build_entries

    # Off-TPU the kernels default to interpret mode (the sw_emu tier),
    # which lowers to plain HLO and would make this check vacuous; force
    # the real Mosaic lowering path.
    pallas_dw.FORCE_COMPILE = True

    entries = ENTRIES
    if args.only:
        keep = {tuple(f.split(":")) for f in args.only.split(",")}
        entries = [e for e in ENTRIES
                   if (e[0], e[1]) in keep or
                   (e[0], e[1], str(e[2])) in keep]
        if not entries:
            print(f"no entries match --only {args.only}")
            return 1

    rng = np.random.default_rng(0)
    failures = 0
    for model, dtype, batch in entries:
        # batch-1 ships the measured MIXED routing; throughput ships fused
        routing = "mixed" if (batch == 1 and model != "v1") else "fused"
        a = SimpleNamespace(alpha=1.0, res=224, int8=dtype == "int8",
                            model=model, routing=routing)
        label = f"{model:>7} {dtype} b{batch}"
        t0 = time.perf_counter()
        try:
            _, fns = build_entries(a, ["full"])
            img = rng.integers(0, 256, (batch, a.res, a.res, 3),
                               dtype=np.uint8)
            exp = export.export(fns["full"], platforms=["tpu"])(img)
            n_kernels = exp.mlir_module().count("@tpu_custom_call")
            print(f"[OK  ] {label}: {n_kernels} Mosaic kernels lowered "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 — report every lowering break
            failures += 1
            # Mosaic lowering errors carry the operative detail several
            # lines down (ADVICE.md r4): show first + last lines, or
            # everything under --verbose.
            lines = [ln for ln in str(e).split("\n") if ln.strip()]
            if args.verbose or len(lines) <= 6:
                msg = "\n        ".join(lines)
            else:
                msg = "\n        ".join(lines[:2] + ["..."] + lines[-4:])
            print(f"[FAIL] {label}: {type(e).__name__}: {msg}", flush=True)
    print(f"{len(entries) - failures}/{len(entries)} entries lower cleanly")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
