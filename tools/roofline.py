"""Per-segment roofline accounting: analytic floors vs measured time.

docs/design.md SS5 claims "no segment holds >1 ms of exploitable headroom";
this tool proves or refutes it (round-3 VERDICT item 5). For every network
segment it computes three analytic floors and reports measured time as a
percentage of the BINDING (max) floor:

  - MXU: pointwise/conv MACs x2 over the bf16 peak (int8 runs its matmuls
    in bf16-equivalent form on this stack, docs/design.md SS3.4)
  - VPU: depthwise 9-tap FMAs + epilogue over the vector unit's FMA rate
  - HBM: activation bytes in + out over HBM bandwidth (fused blocks never
    spill the dw intermediate, so a block reads its input once and writes
    its pw output once; weights are negligible at 4.2M params)

A fused dw+pw Pallas block pipelines VPU stencil work against MXU matmuls
and DMA across grid steps, so per-block floor = max(mxu, vpu, hbm), and a
segment's floor sums its (sequential) blocks.

Hardware model (TPU v5e, public numbers from the JAX scaling book):
  MXU peak 197e12 bf16 FLOP/s; HBM 8.1e11 B/s; VPU (8,128) lanes x 4 ALUs
  at ~0.94 GHz = 3.85e12 FMA/s (counting an FMA as one op).

Usage:
  python tools/roofline.py                     # analytic table only
  python tools/roofline.py --measure           # + prefix-differenced measure
                                               #   on the real chip (compiles)
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MXU_FLOPS = 197e12
HBM_BPS = 8.1e11
VPU_FMAS = 8 * 128 * 4 * 0.94e9

# Measured achievable rates (--achievable): replaces the paper numbers with
# what THIS stack sustains through the same Pallas grid machinery
# (tools/microbench_floors.py -> benchmarks/achievable_v5e.json). HBM is
# strongly shape-dependent — 162 GB/s at 112²x64 (half-empty lanes +
# per-step overhead) vs 549 at 56²x128 — so achievable mode keys the rate
# by channel width.
HBM_RATES = None  # {channels: bytes/s}, set by apply_achievable()


def _hbm_bps(c):
    if HBM_RATES is None:
        return HBM_BPS
    key = min(HBM_RATES, key=lambda k: abs(k - c))
    return HBM_RATES[key]


def apply_achievable():
    """Load benchmarks/achievable_v5e.json into the rate globals."""
    global MXU_FLOPS, VPU_FMAS, HBM_RATES
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "achievable_v5e.json")
    with open(path) as f:
        data = json.load(f)
    MXU_FLOPS = data["mxu_tflops"] * 1e12
    VPU_FMAS = data["vpu_stencil_tfmas"] * 1e12
    HBM_RATES = {int(label.split("x")[1]): gbps * 1e9
                 for label, gbps in data["hbm_copy_gbps"].items()}
    return data

# Segment boundaries as prefix block counts (prefix_attr.py convention):
# 0 = pre+conv1, then deltas between consecutive prefixes.
PREFIXES = [0, 1, 2, 6, 13, "full"]


def block_floor(n, hi, cin, cout, stride, esz):
    """(mxu_s, vpu_s, hbm_s) floors for one fused dw+pw block."""
    ho = hi // stride
    mxu = n * ho * ho * cin * cout * 2 / MXU_FLOPS
    # dw: 9 FMA taps per output element + ~2 epilogue ops (bias+relu) on VPU
    vpu = n * ho * ho * cin * (9 + 2) / VPU_FMAS
    hbm = (n * hi * hi * cin * esz / _hbm_bps(cin)
           + n * ho * ho * cout * esz / _hbm_bps(cout))
    return mxu, vpu, hbm


def segment_floors(cfg, batch, esz):
    """{segment_label: (floor_s, binding, mxu, vpu, hbm)} per PREFIXES delta."""
    n = batch
    res = cfg.resolution
    # pre+conv1: read u8 image, im2col-free conv as 27xC1 matmul, write bf16
    c1 = cfg.stem_channels
    ho = res // 2
    mxu = n * ho * ho * 27 * c1 * 2 / MXU_FLOPS
    hbm = (n * res * res * 3 * 1 / _hbm_bps(64)
           + n * ho * ho * c1 * esz / _hbm_bps(c1))
    segs = {"conv1+pre": (mxu, 0.0, hbm)}

    per_block = []
    hw = ho
    cin = c1
    for i, (stride, cout) in enumerate(
            zip(cfg.block_strides, cfg.block_channels)):
        per_block.append(block_floor(n, hw, cin, cout, stride, esz))
        hw //= stride
        cin = cout
    bounds = [(0, 1, "B0"), (1, 2, "B1"), (2, 6, "B2-B5"), (6, 13, "B6-B12")]
    for lo, hi_, label in bounds:
        segs[label] = tuple(sum(v) for v in zip(*per_block[lo:hi_]))
    # head: pool reads the 7x7 map; fc is a 1024x1000 matmul
    segs["head"] = (
        n * cfg.feature_channels * cfg.num_classes * 2 / MXU_FLOPS,
        0.0,
        (n * hw * hw * cin * esz) / _hbm_bps(cin),
    )

    out = {}
    for label, (mxu, vpu, hbm) in segs.items():
        floor = max(mxu, vpu, hbm)
        binding = ("mxu", "vpu", "hbm")[int(np.argmax([mxu, vpu, hbm]))]
        out[label] = dict(floor_ms=floor * 1e3, binding=binding,
                          mxu_ms=mxu * 1e3, vpu_ms=vpu * 1e3, hbm_ms=hbm * 1e3)
    return out


def ir_block_floor(n, hi, cin, e, cout, k, stride, se_mid, esz):
    """(mxu_s, vpu_s, hbm_s) floors for one fused V2/V3 bottleneck: the
    expanded tensor stays in VMEM (pallas_ir_block/pallas_ir_v3), so HBM
    traffic is read(Cin) + write(Cout) only; MXU work is expand + project
    (+ the tiny SE matmuls); VPU work is the kxk stencil + epilogues on
    the EXPANDED channels (+ the hard-swish multiply where it applies)."""
    ho = hi // stride
    mxu = (n * (hi * hi * cin * e + ho * ho * e * cout)
           + (n * 2 * e * se_mid if se_mid else 0)) * 2 / MXU_FLOPS
    vpu = n * ho * ho * e * (k * k + 3) / VPU_FMAS
    hbm = (n * hi * hi * cin * esz / _hbm_bps(cin)
           + n * ho * ho * cout * esz / _hbm_bps(cout))
    return mxu, vpu, hbm


def family_block_composition(cfg, batch):
    """Per-block SERIAL-PHASE composition under the achievable anchors —
    the model that closed b1 (roofline_v5e.md 2026-08-20): a fused kernel's
    phases (expand matmul, activation pass on the EXPANDED f32 at the
    lane-padded width, k² dw taps, SE, projection, epilogue) execute
    serially within a grid step, so their SUM (not max) is the credible
    bound a redesign must beat. Floors answer "is this segment worth
    attacking"; compositions answer "is the shipped kernel done". Uses the
    V3 kernel's layout constants: ep = roundup(e, 128), stride-2 dw at
    2x w_out width (the A[p]-everywhere full-width trick)."""
    n = batch
    is_v3 = hasattr(cfg, "variant")
    out = {}
    hw = cfg.resolution // 2
    cin = cfg.stem_channels
    for i, bd in enumerate(cfg.block_defs):
        if is_v3:
            e, cout, k, stride, se = (bd.cexp, bd.cout, bd.kernel,
                                      bd.stride, bd.se_mid)
            has_exp = bd.has_expand
        else:
            t, _cin, cout, stride = bd
            e, k, se = int(round(t * cin)), 3, 0
            has_exp = t != 1
        ep = -(-e // 128) * 128
        ho = hw // stride
        mxu_exp = (n * hw * hw * cin * ep * 2 / MXU_FLOPS) if has_exp else 0.0
        vpu_act = n * hw * hw * ep * 3 / VPU_FMAS  # act on expanded f32
        acc_w = ho if stride == 1 else 2 * ho
        vpu_dw = n * ho * acc_w * ep * k * k / VPU_FMAS
        vpu_ep = n * ho * ho * ep * 3 / VPU_FMAS  # dw bias+act+cast
        vpu_se = (n * ho * ho * ep * 2 / VPU_FMAS) if se else 0.0  # gate mul
        mxu_prj = n * ho * ho * ep * cout * 2 / MXU_FLOPS
        total = mxu_exp + vpu_act + vpu_dw + vpu_ep + vpu_se + mxu_prj
        # dense bound: a lane-PACKED route pads nothing (every lane busy at
        # the true e) and an even-only s2 kernel skips the discarded pixel
        # half — the best any known formulation reaches on this stack
        dense = ((n * hw * hw * cin * e * 2 / MXU_FLOPS if has_exp else 0.0)
                 + n * hw * hw * e * 3 / VPU_FMAS
                 + n * ho * ho * e * k * k / VPU_FMAS
                 + n * ho * ho * e * 5 / VPU_FMAS
                 + n * ho * ho * e * cout * 2 / MXU_FLOPS)
        out[f"B{i:02d}"] = dict(total_ms=total * 1e3, dense_ms=dense * 1e3,
                                mxu_exp=mxu_exp * 1e3, vpu_act=vpu_act * 1e3,
                                vpu_dw=vpu_dw * 1e3, vpu_ep=vpu_ep * 1e3,
                                vpu_se=vpu_se * 1e3, mxu_prj=mxu_prj * 1e3)
        hw = ho
        cin = cout
    return out


def family_block_floors(cfg, batch, esz):
    """Per-block analytic floors for a V2Config/V3Config (one row per
    bottleneck + stem + head), same shape as segment_floors' output."""
    n = batch
    res = cfg.resolution
    c1 = cfg.stem_channels
    ho = res // 2
    mxu = n * ho * ho * 27 * c1 * 2 / MXU_FLOPS
    hbm = (n * res * res * 3 * 1 / _hbm_bps(64)
           + n * ho * ho * c1 * esz / _hbm_bps(c1))
    segs = {"conv1+pre": (mxu, 0.0, hbm)}
    hw = ho
    is_v3 = hasattr(cfg, "variant")
    cin = c1
    for i, bd in enumerate(cfg.block_defs):
        if is_v3:
            e, cout, k, stride, se = (bd.cexp, bd.cout, bd.kernel,
                                      bd.stride, bd.se_mid)
            has_exp = bd.has_expand
        else:
            t, _cin, cout, stride = bd
            e, k, se = int(round(t * cin)), 3, 0
            has_exp = t != 1  # t=1 block 0 has NO expand conv
        mxu_b, vpu_b, hbm_b = ir_block_floor(n, hw, cin, e, cout, k,
                                             stride, se, esz)
        if not has_exp:  # subtract the phantom expand MACs (floor = bound)
            mxu_b -= n * hw * hw * cin * e * 2 / MXU_FLOPS
        segs[f"B{i:02d}"] = (mxu_b, vpu_b, hbm_b)
        hw //= stride
        cin = cout
    cl = cfg.last_conv_channels if is_v3 else cfg.last_channels
    head_mac = hw * hw * cin * cl
    if is_v3:
        head_mac += cl * cfg.last_point_channels
        head_mac += cfg.last_point_channels * cfg.num_classes
    else:
        head_mac += cl * cfg.num_classes
    segs["head"] = (n * head_mac * 2 / MXU_FLOPS, 0.0,
                    (n * hw * hw * cin * esz) / _hbm_bps(cin))
    out = {}
    for label, (mxu_, vpu_, hbm_) in segs.items():
        floor = max(mxu_, vpu_, hbm_)
        binding = ("mxu", "vpu", "hbm")[int(np.argmax([mxu_, vpu_, hbm_]))]
        out[label] = dict(floor_ms=floor * 1e3, binding=binding,
                          mxu_ms=mxu_ * 1e3, vpu_ms=vpu_ * 1e3,
                          hbm_ms=hbm_ * 1e3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--model", default="v1",
                    choices=["v1", "v2", "v3", "v3small"])
    ap.add_argument("--minimalistic", action="store_true")
    ap.add_argument("--measure", action="store_true",
                    help="run the prefix-differenced measurement on the chip")
    ap.add_argument("--composition", action="store_true",
                    help="also print the per-block serial-phase composition "
                         "(the kernel-done bound; pair with --achievable)")
    ap.add_argument("--achievable", action="store_true",
                    help="use the MEASURED achievable rates "
                         "(benchmarks/achievable_v5e.json) instead of the "
                         "paper numbers")
    args = ap.parse_args()
    if args.achievable:
        data = apply_achievable()
        print(f"achievable rates (measured {data['health']['utc']}): "
              f"mxu {data['mxu_tflops']} TFLOP/s, "
              f"vpu {data['vpu_stencil_tfmas']} T-FMA/s, "
              f"hbm {data['hbm_copy_gbps']} GB/s")

    from mobilenet_tpu import ModelConfig

    esz = 1 if args.int8 else 2  # inter-block activation byte size
    if args.model == "v2":
        from mobilenet_tpu.models.mobilenet_v2 import V2Config

        cfg = V2Config(alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        floors = family_block_floors(cfg, args.batch, esz)
        if args.measure:
            sys.exit("--measure is V1-segment-mode only; use "
                     "tools/prefix_attr.py --model v2 for measured prefixes")
    elif args.model in ("v3", "v3small"):
        from mobilenet_tpu.models.mobilenet_v3 import V3Config

        cfg = V3Config(variant="large" if args.model == "v3" else "small",
                       alpha=args.alpha, resolution=args.res,
                       minimalistic=args.minimalistic,
                       compute_dtype="bfloat16")
        floors = family_block_floors(cfg, args.batch, esz)
        if args.measure:
            sys.exit("--measure is V1-segment-mode only; use "
                     "tools/prefix_attr.py for measured prefixes")
    else:
        cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                          compute_dtype="bfloat16")
        floors = segment_floors(cfg, args.batch, esz)

    measured = {}
    if args.measure:
        measured = measure_segments(args)

    total_floor = sum(f["floor_ms"] for f in floors.values())
    print(f"\n{cfg.variant_name()} batch={args.batch} "
          f"{'int8' if args.int8 else 'bf16'}  (floors in ms/batch)")
    hdr = f"{'segment':>10} | {'mxu':>7} | {'vpu':>7} | {'hbm':>7} | {'floor':>7} | bind"
    if measured:
        hdr += f" | {'meas':>7} | %floor"
    print(hdr)
    for label, f in floors.items():
        line = (f"{label:>10} | {f['mxu_ms']:7.3f} | {f['vpu_ms']:7.3f} | "
                f"{f['hbm_ms']:7.3f} | {f['floor_ms']:7.3f} | {f['binding']:>4}")
        if measured and label in measured:
            m = measured[label]
            line += f" | {m:7.3f} | {f['floor_ms']/m*100 if m else 0:5.0f}%"
        print(line)
    total_line = f"{'TOTAL':>10} | {'':>7} | {'':>7} | {'':>7} | {total_floor:7.3f} |"
    if measured:
        mt = sum(measured.values())
        total_line += f"      | {mt:7.3f} | {total_floor/mt*100 if mt else 0:5.0f}%"
    print(total_line)
    print(json.dumps({"variant": cfg.variant_name(), "batch": args.batch,
                      "dtype": "int8" if args.int8 else "bf16",
                      "floors_ms": {k: round(v["floor_ms"], 3)
                                    for k, v in floors.items()},
                      "binding": {k: v["binding"] for k, v in floors.items()},
                      "measured_ms": {k: round(v, 3)
                                      for k, v in measured.items()}}))

    if getattr(args, "composition", False):
        if args.model == "v1":
            sys.exit("--composition models the fused V2/V3 bottleneck "
                     "kernels; use --model v2|v3|v3small")
        comp = family_block_composition(cfg, args.batch)
        print(f"\nserial-phase composition (achievable anchors"
              f"{' ON' if HBM_RATES is not None else ' OFF — pass --achievable'}"
              "; ms/batch):")
        print(f"{'block':>6} | {'exp':>6} | {'act':>6} | {'dw':>6} | "
              f"{'epil':>6} | {'se':>6} | {'prj':>6} | {'padded':>7} | "
              f"{'dense':>7}")
        for label, c in comp.items():
            print(f"{label:>6} | {c['mxu_exp']:6.3f} | {c['vpu_act']:6.3f} | "
                  f"{c['vpu_dw']:6.3f} | {c['vpu_ep']:6.3f} | "
                  f"{c['vpu_se']:6.3f} | {c['mxu_prj']:6.3f} | "
                  f"{c['total_ms']:7.3f} | {c['dense_ms']:7.3f}")
        print(f"{'TOTAL':>6} | {'':>6} | {'':>6} | {'':>6} | {'':>6} | "
              f"{'':>6} | {'':>6} | "
              f"{sum(c['total_ms'] for c in comp.values()):7.3f} | "
              f"{sum(c['dense_ms'] for c in comp.values()):7.3f}")


SEGMENT_LABELS = ["conv1+pre", "B0", "B1", "B2-B5", "B6-B12", "head"]


def measure_segments(args):
    """Prefix-differenced segment times (prefix_attr.py method): interleaved
    rounds, medians, one process."""
    import jax
    import numpy as np

    from prefix_attr import build_entries

    assert jax.default_backend() == "tpu", "segment measurement needs the chip"
    import jax.numpy as jnp

    cfg, entries = build_entries(args, PREFIXES)
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.integers(
        0, 256, (args.batch, args.res, args.res, 3), dtype=np.uint8)))

    for k, fn in entries.items():
        t0 = time.perf_counter()
        _ = np.asarray(fn(img))
        print(f"compile prefix {k!s:>5}: {time.perf_counter()-t0:5.1f}s",
              flush=True)

    # fenced_window auto-extends to >=1.5 s so the ~30 ms fetch-fence RTT
    # amortizes below ~2% — without it the whole fence lands on the FIRST
    # prefix's time and the differencing attributes ~1.4 ms of pure RTT to
    # conv1+pre (which is how an early round-3 run read 2.08 ms for a
    # segment that measures 0.66 ms fenced; see tools/ab_stem2.py)
    from mobilenet_tpu.utils.timing import fenced_window

    def sync(o):
        return np.asarray(o[0, :4] if o.ndim > 1 else o[:4])

    times = {k: [] for k in entries}
    for _ in range(args.rounds):
        for k, fn in entries.items():
            sync(fn(img))
            dt, nst = fenced_window(lambda fn=fn: fn(img), sync, args.steps)
            times[k].append(dt / nst * 1e3)

    med = {k: float(np.median(v)) for k, v in times.items()}
    out, prev = {}, 0.0
    for label, k in zip(SEGMENT_LABELS, PREFIXES):
        out[label] = med[k] - prev
        prev = med[k]
    return out


if __name__ == "__main__":
    main()
