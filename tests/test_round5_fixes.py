"""Round-5 fixes: host-capacity classes for host-coupled metrics (VERDICT r4
weak #4/#5) and the keras-3 wrong-family diagnostics (ADVICE r4 items 1-2)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

BAND = {"rtt_ms_max": 60.0, "h2d_gbps_min": 0.02, "h2d_class_hi_min": 0.04}


class TestH2dClass:
    def test_classes(self):
        from _bench_common import h2d_class

        mk = lambda g: {"device": "tpu", "h2d_gbps": g}
        assert h2d_class(mk(0.079), BAND) == "hi"
        assert h2d_class(mk(0.04), BAND) == "hi"
        assert h2d_class(mk(0.035), BAND) == "lo"
        assert h2d_class(mk(0.02), BAND) == "lo"
        assert h2d_class(mk(0.007), BAND) == "degraded"

    def test_non_tpu_is_na(self):
        from _bench_common import h2d_class

        assert h2d_class({"device": "cpu"}, BAND) == "na"

    def test_band_file_has_class_threshold(self):
        from _bench_common import load_health_band

        band = load_health_band()
        assert band is not None
        assert band["h2d_class_hi_min"] > band["h2d_gbps_min"]


class TestHostCoupledFlags:
    """VERDICT r4 #6 acceptance: a faked low-capacity stamp must flag the
    e2e/serving rows recorded at high capacity."""

    def _rows(self):
        return [
            ("bench_contract e2e",
             {"tunnel_health": {"h2d_class": "hi"},
              "e2e_images_per_sec_with_host_transfer": 249.5}),
            ("serving v1 bf16 tiered s64",
             {"h2d_class": "hi", "images_per_sec": 232.6}),
        ]

    def test_low_capacity_stamp_flags_hi_rows(self):
        from regress import host_coupled_flags

        flags = host_coupled_flags("lo", self._rows())
        assert len(flags) == 2
        assert all("NOT comparable" in f for f in flags)

    def test_same_class_passes(self):
        from regress import host_coupled_flags

        assert host_coupled_flags("hi", self._rows()) == []

    def test_unstamped_row_flagged(self):
        from regress import host_coupled_flags

        flags = host_coupled_flags(
            "hi", [("serving old", {"images_per_sec": 63.5})])
        assert len(flags) == 1 and "UNSTAMPED" in flags[0]

    def test_recorded_serving_rows_carry_arm(self):
        """Every v3small round-4 row must now be arm-labeled (weak #5)."""
        import json

        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "benchmarks", "serving_v5e.jsonl")
        rows = [json.loads(l) for l in open(path) if l.strip()]
        v3s = [r for r in rows
               if r.get("variant") == "mobilenet_v3_small_1_224"]
        assert len(v3s) >= 6
        assert all("arm" in r for r in v3s)
        assert all("round 3" not in r.get("note", "") for r in v3s)


class TestKeras3LayoutDiagnostics:
    """A wrong-family keras-3 store must raise the diagnostic ValueError,
    not a bare KeyError (ADVICE r4 items 1-2)."""

    def test_v2_importer_missing_dense(self):
        from mobilenet_tpu.checkpoints.v2 import _import_keras3_v2
        from mobilenet_tpu.models.mobilenet_v2 import V2Config

        store = {"conv2d": [], "depthwise_conv2d": [],
                 "batch_normalization": []}  # a V1-shaped store: no Dense
        with pytest.raises(ValueError, match="unrecognized keras-3 layout"):
            _import_keras3_v2(store, V2Config(alpha=1.0, resolution=224))

    def test_v1_importer_unrecognized_bases(self):
        from mobilenet_tpu import ModelConfig
        from mobilenet_tpu.checkpoints.io import _import_keras3_v1

        store = {"my_custom_conv": [[np.zeros((3, 3, 3, 32))]]}
        with pytest.raises(ValueError, match="found classes"):
            _import_keras3_v1(store, ModelConfig(alpha=1.0, resolution=224))

    def test_v3_importer_unrecognized_bases(self):
        from mobilenet_tpu.checkpoints.v3 import _import_keras3_v3
        from mobilenet_tpu.models.mobilenet_v3 import V3Config

        with pytest.raises(ValueError, match="unrecognized keras-3 layout"):
            _import_keras3_v3({"dense": []},
                              V3Config(variant="large", alpha=1.0,
                                       resolution=224))
