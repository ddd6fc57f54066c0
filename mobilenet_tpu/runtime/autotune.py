"""Measured backend routing: pick the fastest dw/pw execution backend.

The reference's analog of "routing" was compile-time: one FPGA bitstream per
configuration (SURVEY.md SS5 config system). On TPU the same network has
several legal executions per block (XLA grouped conv, standalone Pallas dw,
fused/packed Pallas blocks — models.mobilenet_v1.DW_BACKENDS), and the best
choice depends on batch size and hardware. The shipped "auto" routing encodes
the measured defaults for v5e; this module re-derives them empirically on
whatever device is present.

Measurement discipline (docs/design.md SS5): standalone micro-benches through
the tunneled TPU mislead by +-40%, so candidates are compared END-TO-END on
the full network with fetch-fenced timing, never per-kernel.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from ..config import ModelConfig


def autotune_backend(
    config: ModelConfig,
    batch_size: int = 256,
    steps: int = 10,
    candidates: Optional[Sequence[str]] = None,
    seed: int = 0,
    params=None,
) -> Tuple[str, Dict[str, float]]:
    """Measure e2e img/s for each candidate dw backend; return
    (best_backend, {backend: images_per_sec}).

    Candidates default to the backends worth racing on the current device:
    all of DW_BACKENDS on TPU, just "xla" on CPU (Pallas would run in
    interpret mode there — the sw_emu tier, not a performance candidate).
    """
    import jax
    import jax.numpy as jnp

    from ..models.mobilenet_v1 import DW_BACKENDS
    from .pipeline import InferencePipeline

    if candidates is None:
        candidates = DW_BACKENDS if jax.default_backend() == "tpu" else ("xla",)

    rng = np.random.default_rng(0)
    res = config.resolution
    img = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch_size, res, res, 3), dtype=np.uint8)))

    def sync(out):
        return np.asarray(out[0, :4])  # fetch-fenced (tunnel-safe)

    results: Dict[str, float] = {}
    for backend in candidates:
        pipe = InferencePipeline(config, seed=seed, dw_backend=backend,
                                 params=params)
        entry = pipe._entry("probs_u8")
        sync(entry(pipe.params, img))  # compile + warm
        for _ in range(2):
            out = entry(pipe.params, img)
        sync(out)
        # The fence is a constant additive RTT, so candidate ORDERING is
        # fence-proof — but extend short windows anyway so the reported
        # magnitudes match bench/sweep (fence amortized below ~2%).
        from ..utils.timing import fenced_window

        dt, n = fenced_window(lambda: entry(pipe.params, img), sync, steps)
        results[backend] = n * batch_size / dt
    best = max(results, key=results.get)
    return best, results
