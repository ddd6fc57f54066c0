"""Per-layer golden comparison harness.

Reference analog: the verify run (SURVEY.md SS3.2) — FPGA path with per-layer
readback compared elementwise against the C golden dumps. Here: the jitted JAX
pipeline with collect=True compared against the oracle (NumPy twin or C++
cpu_ref), reporting the first divergent layer.

Tolerance policy (SURVEY.md SS7 'Bit-matching float32 per layer'): XLA convs and
MXU matmuls reassociate float32 accumulation relative to the oracle's fixed tap
order, so the float32 gate is elementwise |diff| <= atol + rtol*|ref| with
tight constants (abs error stays ~1e-6 at activation scale O(1..6)); max-ULP is
reported alongside as a diagnostic. The INT8 path, where requantization is
deterministic, uses an EXACT gate (quant.py oracle == device output bit-for-bit).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

# (atol, rtol) per layer kind — float32 verify path. The comparison is
# full-path (both sides run all preceding layers), so per-layer reassociation
# noise compounds with depth: measured max_abs at alpha=1.0/224 is ~2.5e-5 by
# block 12 (~50 ULP at ReLU6 scale 6, i.e. rel ~4e-6). Real defects (wrong
# padding, stride, BN fold) produce O(1e-1..1) errors — far above this gate.
DW_TOL = (1e-4, 1e-4)  # 9-tap depthwise, fixed-order oracle
MM_TOL = (1e-4, 3e-4)  # K-deep conv/pointwise/fc reductions (K up to 1024)

# MobileNet-V2 gate: linear bottlenecks + residual chains carry reassociation
# noise UNCLIPPED (V1's ReLU6 re-bounds every layer; V2's projections don't),
# so full-path noise compounds ~4x deeper — measured worst max_abs 3.9e-4 at
# ReLU6 scale 6 by block 16 (alpha=1.0/96, both oracles). 1e-3 keeps 2.5x
# headroom over the worst observed while staying >=100x below real-defect
# scale (wrong pad/stride/fold produce O(1e-1..1)).
V2_TOL = (1e-3, 1e-3)

# MobileNet-V3 gate: V2's unclipped-linear story plus unbounded ReLU
# (unclipped activations grow past 6) and hard-swish (one extra multiply
# per activation, and the SE gate injects a pool-reduction product into
# every channel). Activation magnitudes reach O(30) on the seeded weight
# set, so the absolute term dominates when values are large; the V2-style
# relative term covers the rest. Measured worst full-path divergence on
# the seeded set (device fp32 vs both oracles, large/small 1.0/96-224):
# within V2's envelope scaled by the larger activations — 3e-3/1e-3 keeps
# >=2x headroom while staying >=30x below real-defect scale.
V3_TOL = (3e-3, 1e-3)

# Routing-equivalence gate (cli verify --routing ...), bf16: two VALID
# accumulation structures of the SAME program (fused Pallas in-kernel f32
# accumulate + bf16 inter-block stores vs XLA's fusion choices) diverge by
# bf16 rounding compounded over depth, PROPORTIONAL TO LOGITS SCALE — an
# absolute atol calibrated on one family cannot gate another. Measured at
# the deepest/noisiest member (V3-Large 1.0-224, seeded weights, logits
# absmax 41.5): fused-vs-xla max_abs = 1.5% of absmax in interpret mode,
# 2.1% on chip; and BOTH bf16 routes sit 2.9-4.2% of absmax from the fp32
# oracle — the fused route is the CLOSER of the two (its dw/SE/matmul
# chain accumulates in f32 in-kernel). V1 class: 2.3e-2 absolute at
# 0.25-64 interpret; 6e-2 passed 256/256 rows on chip at 1.0-224.
ROUTING_BF16_ATOL = 6e-2     # absolute floor (V1-calibrated, round 3)
ROUTING_BF16_REL = 4.5e-2    # x logits absmax: ~3x the measured V3 class
# Extreme-value headroom for the max-abs inter-route check: defectless
# reassociation noise has max ~ rms*sqrt(2 ln(N*K)) (measured dead-on at
# V2 1.0-224 batch 256: predicted 0.709, observed 0.699/0.762 across two
# image sets); 1.5x covers draw-to-draw spread. A localized defect blows
# the max/rms ratio far past this; a broad one moves the RMS anchor.
ROUTING_EV_FACTOR = 1.5


def routing_bf16_atol(scale: float, rms_fr: float, n_samples: int) -> float:
    """max-abs tolerance for the bf16 routing-equivalence gate: the
    batch-4-calibrated absolute/relative floors, lifted by the
    extreme-value bound of the MEASURED inter-route rms over n_samples
    (cli._verify_routing documents the round-5 V2 batch-256 calibration
    and the defect-detection argument)."""
    import numpy as _np

    ev = rms_fr * float(_np.sqrt(2.0 * _np.log(max(float(n_samples), 2.0))))
    return max(ROUTING_BF16_ATOL, ROUTING_BF16_REL * scale,
               ROUTING_EV_FACTOR * ev)
# Oracle anchor (bf16): the route under test must stay within this factor
# of the xla route's OWN RMS distance from the fp32 oracle — a route that
# adds real error (not reassociation noise) lands far outside it,
# independent of how deep/badly-conditioned the network is. RMS, not max:
# max-abs is an extreme-value statistic that flipped 1.5x in DIRECTION
# between interpret and chip runs of the same program (design.md §8); RMS
# of the same runs is stable, and a defect inflates RMS broadly.
ROUTING_ANCHOR_FACTOR = 1.5

# Measured bf16 top-1 flip class for `cli eval` tie-awareness: relative
# oracle-logit margins under which a device-bf16 top-1 flip is rounding,
# not defect. V1 1.0-224 on chip: 0 flips in 256 (class << 1e-3). V3-Large
# 1.0-224 on chip: flips at rel margin 1.3% (2026-08-18 campaign), i.e.
# within the 4.2% bf16-vs-fp32 logits class above. int8 is bit-exact by
# contract — its tie margin is forced to 0 in cmd_eval.
BF16_TIE_MARGIN = {"v1": 1e-3, "v2": 3e-2, "v3": 3e-2}


def max_ulp_diff(a: np.ndarray, b: np.ndarray) -> int:
    """Max distance in representable float32 steps between two arrays."""
    a32 = np.asarray(a, np.float32)
    b32 = np.asarray(b, np.float32)
    ai = a32.view(np.int32).astype(np.int64)
    bi = b32.view(np.int32).astype(np.int64)
    # Map the sign-magnitude float ordering onto a monotone integer line.
    ai = np.where(ai < 0, np.int64(-0x80000000) - ai, ai)
    bi = np.where(bi < 0, np.int64(-0x80000000) - bi, bi)
    return int(np.max(np.abs(ai - bi))) if a32.size else 0


@dataclasses.dataclass
class LayerReport:
    name: str
    max_abs: float
    max_rel: float
    max_ulp: int
    excess: float  # max(|diff| - (atol + rtol|ref|)); <= 0 means pass
    atol: float
    rtol: float

    @property
    def ok(self) -> bool:
        return self.excess <= 0.0

    def __str__(self) -> str:
        flag = "OK " if self.ok else "FAIL"
        return (
            f"[{flag}] {self.name:14s} max_abs={self.max_abs:.3e} "
            f"max_rel={self.max_rel:.3e} ulp={self.max_ulp} "
            f"(gate atol={self.atol:g} rtol={self.rtol:g})"
        )


def _tol_for(name: str) -> Tuple[float, float]:
    return DW_TOL if name.endswith("_dw") else MM_TOL


def compare_activations(
    got: Dict[str, np.ndarray],
    golden: Dict[str, np.ndarray],
    tols: Optional[Dict[str, Tuple[float, float]]] = None,
) -> List[LayerReport]:
    reports: List[LayerReport] = []
    for name, ref in golden.items():
        if name not in got:
            raise KeyError(f"pipeline did not produce layer {name!r}")
        test = np.asarray(got[name], np.float32)
        ref = np.asarray(ref, np.float32)
        if test.shape != ref.shape:
            raise AssertionError(f"{name}: shape {test.shape} vs golden {ref.shape}")
        diff = np.abs(test - ref)
        absref = np.abs(ref)
        atol, rtol = (tols or {}).get(name, _tol_for(name))
        reports.append(
            LayerReport(
                name=name,
                max_abs=float(diff.max()) if diff.size else 0.0,
                max_rel=float((diff / np.maximum(absref, 1e-6)).max()) if diff.size else 0.0,
                max_ulp=max_ulp_diff(test, ref),
                excess=float((diff - (atol + rtol * absref)).max()) if diff.size else 0.0,
                atol=atol,
                rtol=rtol,
            )
        )
    return reports


def first_divergence(reports: List[LayerReport]) -> Optional[LayerReport]:
    for r in reports:
        if not r.ok:
            return r
    return None


def assert_all_match(reports: List[LayerReport]) -> None:
    bad = first_divergence(reports)
    if bad is not None:
        lines = "\n".join(str(r) for r in reports)
        raise AssertionError(f"first divergence at {bad.name}:\n{lines}")
