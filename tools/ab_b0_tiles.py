"""A/B row/batch tiles of the PACKED stride-1 kernel on B0 shapes.

B0 (112², 32→64 at α=1.0) is the audit's biggest %-of-floor gap (32%,
benchmarks/roofline_v5e.md). Its tile policy — whole-image rows (g=1),
bn=1 — was chosen in round 1 with the PRE-correction timing method; this
tool re-races block_h/block_n with fetch-fenced ≥1.5 s windows on the
standalone kernel (device-resident packed input, one process, interleaved
rounds), plus the α=0.25 counterpart (8→16 at 128²) for the sweep configs.

  python tools/ab_b0_tiles.py [--batch 256] [--ths 112,56,28,16] [--bns 1,2]
"""

import argparse
import itertools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--h", type=int, default=112)
    ap.add_argument("--cin", type=int, default=32)
    ap.add_argument("--cout", type=int, default=64)
    ap.add_argument("--ths", default="112,56,28,16")
    ap.add_argument("--bns", default="1,2")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from mobilenet_tpu.ops.pallas_block_packed import (
        pack, separable_block_packed)
    from mobilenet_tpu.utils.timing import fenced_window

    rng = np.random.default_rng(0)
    n, h, cin, cout = args.batch, args.h, args.cin, args.cout
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, h, cin)), jnp.bfloat16)
    xp = jax.device_put(pack(x, cin))
    dw_w = jnp.asarray(rng.normal(0, 0.5, (3, 3, 1, cin)), jnp.bfloat16)
    dw_b = jnp.asarray(rng.normal(0, 0.2, (cin,)), jnp.bfloat16)
    pw_w = jnp.asarray(rng.normal(0, 0.3, (cin, cout)), jnp.bfloat16)
    pw_b = jnp.asarray(rng.normal(0, 0.2, (cout,)), jnp.bfloat16)

    def sync(o):
        return np.asarray(o[0, :1, :4])

    cands = {}
    ref = None
    for th, bn in itertools.product(
            [int(t) for t in args.ths.split(",")],
            [int(b) for b in args.bns.split(",")]):
        if h % th or n % bn:
            continue
        name = f"th{th}_bn{bn}"

        def fn(xp, th=th, bn=bn):
            return separable_block_packed(
                xp, dw_w, dw_b, pw_w, pw_b, cin, cout, True,
                block_h=th, block_n=bn)

        e = jax.jit(fn)
        t0 = time.perf_counter()
        try:
            out = np.asarray(e(xp)[:1, :2, :8], np.float32)
        except Exception as err:
            print(f"compile {name}: INFEASIBLE "
                  f"({str(err).splitlines()[0][:120]})", flush=True)
            continue
        print(f"compile {name}: {time.perf_counter()-t0:5.1f}s", flush=True)
        if ref is None:
            ref = out
        else:
            assert np.allclose(out, ref, atol=5e-2), name
        cands[name] = e

    meas = {k: [] for k in cands}
    for _ in range(args.rounds):
        for k, e in cands.items():
            sync(e(xp))
            dt, nst = fenced_window(lambda e=e: e(xp), sync, args.steps)
            meas[k].append(dt / nst * 1e3)
    for k in meas:
        med = float(np.median(meas[k]))
        print(json.dumps({"tiles": k, "ms_per_batch": round(med, 3),
                          "runs_ms": [round(v, 3) for v in meas[k]]}),
              flush=True)


if __name__ == "__main__":
    main()
