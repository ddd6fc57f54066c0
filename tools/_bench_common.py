"""Shared scaffold for the interleaved A/B tools (ab_s2 / ab_carry /
ab_dtype / ab_mxu_dw).

Cross-process comparisons through the TPU tunnel carry +-1 ms/batch of
run-to-run variance, so every A/B here compiles all variants in ONE process
and interleaves `rounds` timing rounds per variant, reporting medians.
Timing is fetch-fenced (np.asarray of the output) because
block_until_ready returns early through the tunnel (CLAUDE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def tunnel_health(print_stamp: bool = True):
    """Measure tunnel health and return a stamp dict for artifact rows.

    The 2026-08-20 03:13 attribution committed a phantom 7.5 ms int8 head +
    3x degraded host bandwidth that only a human re-run caught
    (benchmarks/roofline_v5e.md "methods" notes). Every on-chip artifact row
    must carry this stamp so tools/regress.py can reject rows recorded on a
    degraded tunnel. Healthy band recorded in
    benchmarks/health_band_v5e.json.

    Probes (all fetch-fenced — block_until_ready returns early through the
    tunnel, CLAUDE.md):
      rtt_ms          median dispatch+fetch round-trip of a tiny op
      h2d_gbps        host->device bandwidth, 64 MB device_put + fenced read
      device_ok       a 512x512 bf16 matmul returns finite values
    """
    dev = jax.devices()[0]
    stamp = {"device": str(dev.platform), "utc": time.strftime(
        "%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    # RTT: tiny dispatch + one-element fetch, median of 7
    x = jax.device_put(jnp.ones((8, 128), jnp.bfloat16))
    f = jax.jit(lambda a: jnp.sum(a).reshape(1))
    _ = np.asarray(f(x))  # compile+warm
    rtts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _ = np.asarray(f(x))
        rtts.append((time.perf_counter() - t0) * 1e3)
    stamp["rtt_ms"] = round(float(np.median(rtts)), 2)
    # H2D bandwidth: 64 MB transfers, fenced by a one-element fetch.
    # BEST of 3: single shots spread 0.02-0.05 GB/s on a healthy tunnel
    # (2026-08-20 stamps) — capacity is what degrades in the incident mode,
    # and the best transfer reflects capacity.
    arr = np.ones((64, 1024, 1024), np.uint8)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        xb = jax.device_put(arr)
        _ = np.asarray(xb[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
        del xb
    stamp["h2d_gbps"] = round(arr.nbytes / best / 1e9, 3)
    # Device sanity: matmul returns finite values
    m = jax.device_put(jnp.full((512, 512), 0.5, jnp.bfloat16))
    y = np.asarray(jnp.sum((m @ m).astype(jnp.float32)))
    stamp["device_ok"] = bool(np.isfinite(y))
    if print_stamp:
        print("HEALTH " + json.dumps(stamp), flush=True)
    return stamp


def load_health_band(path=None):
    """Recorded healthy band for tunnel stamps (band file committed next to
    the artifacts it guards). Returns None when no band is recorded yet."""
    import os

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "benchmarks", "health_band_v5e.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def check_health_band(stamp, band):
    """Compare a tunnel_health stamp against the recorded healthy band.

    Returns (ok, reasons). Only TPU stamps are banded — a CPU-backend run
    has no tunnel to degrade. A band of None (not yet recorded) passes with
    a note so first-session tooling isn't blocked.
    """
    if stamp.get("device") != "tpu":
        return True, ["non-tpu backend: band not applicable"]
    if band is None:
        return True, ["no recorded health band yet"]
    reasons = []
    if not stamp.get("device_ok", False):
        reasons.append("device sanity matmul failed")
    if stamp.get("rtt_ms", 0.0) > band["rtt_ms_max"]:
        reasons.append(f"rtt {stamp['rtt_ms']} ms > {band['rtt_ms_max']}")
    if stamp.get("h2d_gbps", 0.0) < band["h2d_gbps_min"]:
        reasons.append(
            f"h2d {stamp['h2d_gbps']} GB/s < {band['h2d_gbps_min']}")
    return not reasons, reasons or ["healthy"]


def h2d_class(stamp, band=None):
    """Host-transfer capacity class for HOST-COUPLED metrics (e2e img/s,
    serving p50): 'hi' / 'lo' / 'degraded', or 'na' off-tpu. Two rows are
    comparable only within a class — the round-4 close saw e2e swing 2.6x
    between stamps the single healthy band accepted equally (verdict weak
    #4), so e2e/serving artifacts carry this class and tools/regress.py
    flags cross-class comparisons."""
    if stamp.get("device") != "tpu":
        return "na"
    if band is None:
        band = load_health_band()
    if band is None:
        return "na"
    g = stamp.get("h2d_gbps", 0.0)
    if g >= band.get("h2d_class_hi_min", 0.04):
        return "hi"
    if g >= band.get("h2d_gbps_min", 0.02):
        return "lo"
    return "degraded"


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
