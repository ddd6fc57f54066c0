"""Tracing / profiling subsystem.

Reference analog (SURVEY.md SS5): OpenCL event profiling
(CL_QUEUE_PROFILING_ENABLE + clGetEventProfilingInfo) and SDAccel profile
summaries around each enqueue. TPU-native equivalents:
  - `trace(path)` — jax.profiler context manager producing Perfetto/XProf
    traces of the compiled steps
  - `cost_analysis(fn, *args)` — XLA's per-executable FLOP/byte model
    (the static analog of the kernel-time report)
  - `CompileClock` — wall-clock of trace+compile per entry (the analog of
    bitstream load time, SURVEY.md SS3.1)
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in XProf/TensorBoard/Perfetto."""
    with jax.profiler.trace(log_dir):
        yield


def cost_analysis(fn, *args, **kwargs) -> Dict[str, float]:
    """Lower+compile `fn` and return XLA's cost model numbers.

    Keys of interest: 'flops', 'bytes accessed', plus per-memory-space
    breakdown. This quantifies the HBM-traffic claims of the fused kernels.
    """
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, (list, tuple)):
        costs = costs[0] if costs else {}
    return dict(costs or {})


class CompileClock:
    """Measure trace+compile wall time of a jitted entry (the 'bitstream
    load' of this stack)."""

    def __init__(self):
        self.seconds: Optional[float] = None

    def compile(self, fn, *args, **kwargs):
        t0 = time.perf_counter()
        compiled = jax.jit(fn).lower(*args, **kwargs).compile()
        self.seconds = time.perf_counter() - t0
        return compiled


def flops_per_image(config) -> float:
    """Analytic MAC model of the 28 layers (SURVEY.md SS2 table) — the
    roofline denominator. Returns MACs (multiply 2x for FLOPs)."""
    total = 0
    for _, kind, cin, cout, stride, hw in config.layer_shapes():
        out_hw = hw // stride
        if kind == "conv":
            total += out_hw * out_hw * 9 * cin * cout
        elif kind == "dw":
            total += out_hw * out_hw * 9 * cin
        else:
            total += out_hw * out_hw * cin * cout
    total += config.feature_channels * config.num_classes
    return float(total)
