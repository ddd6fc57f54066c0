"""Shared scaffold for the interleaved A/B tools (ab_s2 / ab_carry /
ab_dtype / ab_mxu_dw).

Cross-process comparisons through the TPU tunnel carry +-1 ms/batch of
run-to-run variance, so every A/B here compiles all variants in ONE process
and interleaves `rounds` timing rounds per variant, reporting medians.
Timing is fetch-fenced (np.asarray of the output) because
block_until_ready returns early through the tunnel (CLAUDE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def make_batch(batch: int, res: int, seed: int = 0):
    """Deterministic uint8 image batch, device-resident."""
    rng = np.random.default_rng(seed)
    return jax.device_put(jnp.asarray(rng.integers(
        0, 256, (batch, res, res, 3), dtype=np.uint8)))


def compile_and_report(entries, img):
    """Compile+warm every variant (fetch-fenced); returns {label: scalar}."""
    outs = {}
    for label, fn in entries.items():
        t0 = time.perf_counter()
        outs[label] = float(np.asarray(fn(img)).ravel()[0])
        print(f"{label}: compile+warm {time.perf_counter() - t0:.1f}s",
              flush=True)
    return outs


def interleave_bench(entries, img, batch: int, steps: int, rounds: int):
    """Interleaved timing: per round, each variant runs `steps` fenced
    iterations; prints per-variant medians and returns {label: median_ms}."""
    times = {k: [] for k in entries}
    for _ in range(rounds):
        for label, fn in entries.items():
            _ = np.asarray(fn(img))
            t0 = time.perf_counter()
            for _ in range(steps):
                out = fn(img)
            _ = np.asarray(out)
            times[label].append((time.perf_counter() - t0) / steps * 1e3)
    meds = {}
    for label, ts in times.items():
        med = float(np.median(ts))
        meds[label] = med
        print(f"{label:>9}: median {med:7.3f} ms/batch -> "
              f"{batch / med * 1e3:,.0f} img/s  "
              f"(rounds: {[round(t, 2) for t in ts]})", flush=True)
    return meds
