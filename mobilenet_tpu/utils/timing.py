"""Fetch-fenced throughput timing through the TPU tunnel.

Two measured facts shape this helper (docs/design.md §4-§5): on this
platform `block_until_ready` returns before execution finishes, so reliable
timing must fence by fetching output bytes; and that fence costs one fixed
network RTT (~30 ms) INSIDE the timed window, which understates throughput
by ~7% at the contract config and up to ~2× on small configs unless the
window is long enough to amortize it.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Tuple

import numpy as np


def fenced_window(
    run_step: Callable[[], object],
    sync: Callable[[object], object],
    steps: int,
    *,
    min_window_s: Optional[float] = None,
    max_steps: int = 4000,
) -> Tuple[float, int]:
    """Time `steps` async dispatches of run_step, fenced by sync(last_out).

    If the window comes out shorter than min_window_s (default 1.5 s on TPU,
    0 elsewhere — i.e. no extension), scale the step count so the fence's
    fixed RTT amortizes below ~2% and re-time. Returns (seconds, steps_run).
    """
    if min_window_s is None:
        import jax

        min_window_s = 1.5 if jax.default_backend() == "tpu" else 0.0
    steps = max(1, steps)  # steps=0 would leave the fence with nothing to sync
    t0 = time.perf_counter()
    for _ in range(steps):
        out = run_step()
    sync(out)
    dt = time.perf_counter() - t0
    if min_window_s and dt < min_window_s:
        steps = min(int(steps * np.ceil(min_window_s / max(dt, 1e-3))), max_steps)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = run_step()
        sync(out)
        dt = time.perf_counter() - t0
    return dt, steps


def differenced_chain_ms(make_chain, x, k: int, *, reps: int = 3,
                         long_factor: int = 4) -> float:
    """RTT-cancelled per-forward latency from two scan-chain lengths.

    `make_chain(length)` returns a jitted fn whose call runs `length`
    data-dependent forwards and whose fetched output is tiny. A single
    chain's dt/K still carries the fence RTT/K (0.56 ms at K=50 against a
    ~0.13 ms forward); timing chains of K and long_factor*K and differencing
    cancels the RTT exactly: ms = (dt_long - dt_short) / ((long_factor-1)*K).

    A non-positive difference means tunnel noise swamped the measurement
    (e.g. a transient stall inflated the SHORT chain's window); the pair is
    re-measured once with more reps, and if still non-positive the result is
    NaN — callers must treat it as a failed measurement, never record it as
    a real 0.0 ms latency.
    """
    import numpy as np  # noqa: PLC0415 — keep jax-free at module import

    def best_of(fn, n_reps):
        _ = np.asarray(fn(x)[1])  # compile + warm (fetch-fenced)
        best = float("inf")
        for _ in range(n_reps):
            t0 = time.perf_counter()
            _ = np.asarray(fn(x)[1])
            best = min(best, time.perf_counter() - t0)
        return best

    short_fn = make_chain(k)
    long_fn = make_chain(long_factor * k)
    diff = best_of(long_fn, reps) - best_of(short_fn, reps)
    if diff <= 0:  # noise-swamped window: one retry with doubled reps
        diff = best_of(long_fn, 2 * reps) - best_of(short_fn, 2 * reps)
    if diff <= 0:
        return float("nan")
    return diff / ((long_factor - 1) * k) * 1e3
