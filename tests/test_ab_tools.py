"""Numerics gates for the measurement tools' model reformulations.

The A/B tools monkeypatch or re-derive model math (tile policies, stem
space-to-depth weights); these tests pin the derivations on the CPU tier so
a broken reformulation can never masquerade as a perf result on chip.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


@pytest.mark.parametrize("res", [128, 224])
def test_stem_s2d_candidates_match_base(res):
    """ab_stem2's s2d9/s2d4 weight+patch derivations equal the shipped
    stem conv within bf16 tolerance (the tool's own --check gate, run at
    both the small and flagship resolutions)."""
    import ab_stem2
    from mobilenet_tpu import ModelConfig

    cfg = ModelConfig(alpha=0.25, resolution=res,
                      compute_dtype="bfloat16")
    cands = ab_stem2.build_candidates(cfg)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (2, res, res, 3), dtype=np.uint8)
    ref = np.asarray(cands.pop("base")(img), np.float32)
    assert ref.shape == (2, res // 2, res // 2, cfg.stem_channels)
    for name, fn in cands.items():
        out = np.asarray(fn(img), np.float32)
        assert np.abs(out - ref).max() < 6e-2, name


def test_seg_backend_tuples_cover_all_blocks():
    """ab_seg_backend's segment bounds tile the 13 blocks exactly."""
    import ab_seg_backend

    spans = sorted(ab_seg_backend.SEGMENTS.values())
    assert spans[0][0] == 0 and spans[-1][1] == 13
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi == lo


def test_tile_policies_return_valid_tiles():
    """Every ab_tiles policy yields tiles that divide the layer shape (an
    invalid tile would be a silent wrong-measurement, not a crash)."""
    import ab_tiles
    from mobilenet_tpu.ops import pallas_block

    shapes = [  # (n, h_out, wdim, cin, cout, stride) for the dense blocks
        (256, 56, 56, 128, 128, 1), (256, 28, 56, 128, 256, 2),
        (256, 28, 28, 256, 256, 1), (256, 14, 28, 256, 512, 2),
        (256, 14, 14, 512, 512, 1), (256, 7, 14, 512, 1024, 2),
        (256, 7, 7, 1024, 1024, 1),
    ]
    for pol in ["base", "th8", "th28", "th14", "th7", "bn2x", "bnhalf"]:
        fn = ab_tiles.make_policy(pol, pallas_block.pick_tiles)
        for (n, h, w, ci, co, s) in shapes:
            bn, th = fn(n, h, w, ci, co, s, 2)
            assert n % bn == 0, (pol, n, bn)
            assert h % th == 0, (pol, h, th)


def test_health_band_check_flags_degraded_stamps():
    """check_health_band rejects the 03:13-style degraded stamps (slow h2d,
    hung RTT, failed device sanity) and passes healthy / non-tpu / no-band
    cases — the guard that keeps poisoned rows out of the artifacts."""
    from _bench_common import check_health_band

    band = {"rtt_ms_max": 60.0, "h2d_gbps_min": 0.025}
    healthy = {"device": "tpu", "rtt_ms": 30.1, "h2d_gbps": 0.05,
               "device_ok": True}
    assert check_health_band(healthy, band) == (True, ["healthy"])
    # the recorded incident: ~3x degraded host bandwidth
    degraded = dict(healthy, h2d_gbps=0.016)
    ok, reasons = check_health_band(degraded, band)
    assert not ok and any("h2d" in r for r in reasons)
    hung = dict(healthy, rtt_ms=220.0)
    ok, reasons = check_health_band(hung, band)
    assert not ok and any("rtt" in r for r in reasons)
    broken = dict(healthy, device_ok=False)
    ok, reasons = check_health_band(broken, band)
    assert not ok and any("sanity" in r for r in reasons)
    # non-tpu runs and missing bands pass with a note
    cpu = dict(healthy, device="cpu")
    assert check_health_band(cpu, band)[0]
    assert check_health_band(healthy, None)[0]


def test_health_band_file_parses():
    """The committed band file loads and has the fields the check reads."""
    from _bench_common import load_health_band

    band = load_health_band()
    assert band is not None
    assert band["rtt_ms_max"] >= 30.0  # the fixed tunnel RTT is ~30 ms
    assert 0.0 < band["h2d_gbps_min"] < 0.05


def test_abx_assignment_parser_keeps_container_literals():
    """abx flag values may be container literals (PACKED_SE={4,5}); the
    parser must split assignment lists on TOP-LEVEL commas only."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from abx import _split_top, parse_assignments

    assert parse_assignments("m:A={4,5},m:B=(1,2),m:C=True") == [
        ("m", "A", {4, 5}), ("m", "B", (1, 2)), ("m", "C", True)]
    assert _split_top("v1,{4,5},True") == ["v1", "{4,5}", "True"]
