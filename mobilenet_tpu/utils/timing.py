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
