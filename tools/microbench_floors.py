"""Achievable-rate microbenchmarks for the roofline floor model.

Round-3 verdict: every measured segment stalls at 32-75% of the paper-number
floors (HBM 810 GB/s, VPU 3.85 T-FMA/s) with the attack space exhausted —
so either real headroom remains or the floors are unachievable on this
stack. This tool measures what the SAME machinery (Pallas grid kernels,
fenced >=1.5 s windows through the tunnel) can actually sustain:

  - hbm_copy: pure streaming copy kernels at the audit's activation
    geometries (bytes moved = read + write; no compute) -> achievable GB/s
  - vpu_stencil: the 9-tap dw stencil applied REPS times to a VMEM-resident
    tile (HBM traffic amortized away) -> achievable FMA/s
  - mxu_matmul: one big XLA bf16 matmul -> achievable FLOP/s

Writes benchmarks/achievable_v5e.json (with a tunnel-health stamp);
tools/roofline.py --achievable restates the floor tables against these
rates. Run on the real chip only.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _window(fn, x):
    """fn must return a TINY array (slice in-graph): the fence fetches the
    whole return value through the tunnel, and a full-tensor fetch at the
    tunnel's ~0.05-0.08 GB/s once measured as 5.7 s/call 'HBM bandwidth'
    (2026-08-20 first run of this tool)."""
    from mobilenet_tpu.utils.timing import fenced_window

    _ = np.asarray(fn(x)).ravel()[:1]  # compile + warm, fetch-fenced
    sec, steps = fenced_window(lambda: fn(x),
                               lambda out: np.asarray(out).ravel()[:1], 10)
    return sec / steps


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def hbm_copy_rate(n, h, w, c, dtype=jnp.bfloat16):
    """Streaming copy at one audit geometry -> (GB/s, s_per_call)."""
    esz = jnp.dtype(dtype).itemsize
    x = jax.device_put(jnp.ones((n, h, w, c), dtype))
    grid = (n,)
    fn = jax.jit(lambda a: pl.pallas_call(
        _copy_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, h, w, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dtype),
    )(a)[0, 0, 0, :1])  # tiny fetch; the custom call still writes it all
    s = _window(fn, x)
    gbps = 2 * n * h * w * c * esz / s / 1e9  # read + write
    return gbps, s


def _stencil_kernel(x_ref, w_ref, o_ref, *, reps, h, w, variant="chain"):
    """REPS rounds of 9 full-tile FMAs + a bounded epilogue — the floor
    model's per-element op count (9 taps + 2 epilogue), without tap-shift
    data movement: this anchors the pure VPU FMA rate the floors divide
    by. (Shift/relayout overheads are real but belong to the measured
    side, not the floor.)

    The round-4 verdict flagged the single-formulation anchor as not
    credibly tight (shipped kernels beat the composite built on it by
    31%), so `variant` selects independent formulations that attack the
    suspected limiters of the original:
      chain  original: s = s + acc*w serially over 9 taps (dep chain of 9)
      ilp3   3 independent partial sums (one per stencil row), summed last
      const  tap weights as literals — no w_ref broadcast in the loop
      bf16   accumulate in bf16 instead of f32
      noepi  chain without the min/+1 epilogue (pure-FMA ceiling probe)
    """
    acc = x_ref[...].astype(jnp.bfloat16 if variant == "bf16"
                            else jnp.float32)
    for r in range(reps):
        if variant == "ilp3":
            rows = []
            for dy in range(3):
                s = acc * w_ref[dy, 0, :].astype(acc.dtype)
                for dx in range(1, 3):
                    s = s + acc * w_ref[dy, dx, :].astype(acc.dtype)
                rows.append(s)
            s = (rows[0] + rows[1]) + rows[2]
        elif variant == "const":
            s = jnp.zeros_like(acc)
            for t in range(9):
                s = s + acc * acc.dtype.type(1.0 + 0.001 * t)
        else:  # chain / bf16 / noepi
            s = jnp.zeros_like(acc)
            for dy in range(3):
                for dx in range(3):
                    s = s + acc * w_ref[dy, dx, :].astype(acc.dtype)
        if variant == "noepi":
            acc = s
        else:
            acc = jnp.minimum(s + acc.dtype.type(1.0),
                              acc.dtype.type(127.0))
    o_ref[...] = acc.astype(x_ref.dtype)


def vpu_stencil_rate(h=56, w=56, c=128, reps=256, variant="chain",
                     grid_tiles=1, debug=False):
    """9 full-tile FMAs x REPS on a VMEM tile -> (T-FMA/s, s_per_call).

    grid_tiles > 1 runs the same per-tile work over a multi-step grid
    (cross-step pipelining engaged, the regime real kernels run in)."""
    n = grid_tiles
    x = jax.device_put(jnp.ones((n, h, w, c), jnp.bfloat16))
    wts = jax.device_put(jnp.ones((3, 3, c), jnp.bfloat16))
    kern = functools.partial(_stencil_kernel, reps=reps, h=h, w=w,
                             variant=variant)
    fn = jax.jit(lambda a, b: pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, 3, c), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.bfloat16),
        debug=debug,
    )(a, b)[0, 0, 0, :1])
    s = _window(lambda a: fn(a, wts), x)
    fmas = n * reps * 9 * h * w * c
    return fmas / s / 1e12, s


def hbm_copy_rate_flat(n, h, w, c, dtype=jnp.bfloat16, rows_per_block=None):
    """Streaming copy of the same bytes with a LANE-FULL 3D layout
    ((n, h*w*c/128, 128) blocks) — kernels are free to choose layout, so
    the floor should use the best rate at which these bytes can move, not
    the rate of one half-empty-lane 4D framing (round-4 weak #1)."""
    esz = jnp.dtype(dtype).itemsize
    lanes = 128
    rows = h * w * c // lanes
    assert h * w * c % lanes == 0
    x = jax.device_put(jnp.ones((n, rows, lanes), dtype))
    rb = rows_per_block or rows
    assert rows % rb == 0
    grid = (n, rows // rb)
    fn = jax.jit(lambda a: pl.pallas_call(
        _copy_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, rb, lanes), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, rb, lanes), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, rows, lanes), dtype),
    )(a)[0, 0, :1])
    s = _window(fn, x)
    gbps = 2 * n * rows * lanes * esz / s / 1e9
    return gbps, s


def implied_dw_rates():
    """Second anchor family (round-5 VERDICT #1): the implied VPU FMA rate
    of the best SHIPPED dw kernel at audit geometries. The standalone
    kernel pays HBM in/out and the bias+relu epilogue INSIDE the timed
    window, so 9*elements/time UNDER-counts the pure-tap rate — an implied
    rate ABOVE the stencil anchor proves the anchor loose; one below it is
    consistent (HBM/epilogue-bound). Returns {label: implied_tfmas}."""
    from mobilenet_tpu.ops.pallas_dw import depthwise_conv_pallas

    out = {}
    for label, (n, h, c) in [("dw_14x512", (256, 14, 512)),
                             ("dw_28x256", (256, 28, 256))]:
        x = jax.device_put(jnp.ones((n, h, h, c), jnp.bfloat16))
        w = jax.device_put(jnp.ones((3, 3, 1, c), jnp.bfloat16))
        b = jax.device_put(jnp.ones((c,), jnp.bfloat16))
        fn = jax.jit(lambda a: depthwise_conv_pallas(
            a, w, 1, b, relu6=True)[0, 0, 0, :1])
        s = _window(fn, x)
        tfma = 9 * n * h * h * c / s / 1e12
        out[label] = round(tfma, 3)
        print(f"implied [{label}] shipped-kernel rate: {tfma:.3f} T-FMA/s "
              f"({s * 1e3:.3f} ms/call)", flush=True)
    return out


def mxu_rate(m=8192, k=8192, n=8192):
    a = jax.device_put(jnp.ones((m, k), jnp.bfloat16))
    b = jax.device_put(jnp.ones((k, n), jnp.bfloat16))
    fn = jax.jit(lambda x: (x @ b).astype(jnp.float32).sum().reshape(1))
    s = _window(fn, a)
    return 2 * m * k * n / s / 1e12, s


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import argparse

    from _bench_common import tunnel_health

    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="original single-formulation run (no sweep)")
    args = ap.parse_args()

    stamp = tunnel_health()
    out = {"health": stamp, "hbm_copy_gbps": {}, "hbm_formulations": {},
           "vpu_formulations": {},
           "method": ("anchors = BEST independent formulation per unit "
                      "(round-5: the floor bounds what bytes/FMAs CAN cost, "
                      "so one slow framing must not set it); spread recorded "
                      "per formulation below")}
    # the audit's activation geometries (V1 1.0-224 segments + V2/V3 reps)
    for label, shape in [
        ("112x64", (256, 112, 112, 64)),
        ("56x128", (256, 56, 56, 128)),
        ("28x256", (256, 28, 28, 256)),
        ("14x512", (256, 14, 14, 512)),
        ("7x1024", (256, 7, 7, 1024)),
    ]:
        forms = {}
        gbps, s = hbm_copy_rate(*shape)
        forms["4d_tile"] = round(gbps, 1)
        print(f"hbm copy {label} 4d: {gbps:8.1f} GB/s ({s*1e3:.3f} ms)",
              flush=True)
        if not args.quick:
            n, h, w, c = shape
            gbps, s = hbm_copy_rate_flat(n, h, w, c)
            forms["flat_lanes"] = round(gbps, 1)
            print(f"hbm copy {label} flat: {gbps:8.1f} GB/s ({s*1e3:.3f} ms)",
                  flush=True)
            rows = h * w * c // 128
            if rows % 8 == 0 and rows // 8 >= 256:
                gbps, s = hbm_copy_rate_flat(n, h, w, c,
                                             rows_per_block=rows // 8)
                forms["flat_8blk"] = round(gbps, 1)
                print(f"hbm copy {label} flat/8: {gbps:8.1f} GB/s "
                      f"({s*1e3:.3f} ms)", flush=True)
        out["hbm_formulations"][label] = forms
        out["hbm_copy_gbps"][label] = max(forms.values())
    vpu_forms = {}
    for vlabel, kw in ([("chain", {})] if args.quick else [
        ("chain", {}),
        ("ilp3", {"variant": "ilp3"}),
        ("const", {"variant": "const"}),
        ("bf16", {"variant": "bf16"}),
        ("noepi", {"variant": "noepi"}),
        ("chain_g8", {"grid_tiles": 8, "reps": 64}),
        ("ilp3_g8", {"variant": "ilp3", "grid_tiles": 8, "reps": 64}),
        ("const_c512", {"variant": "const", "h": 14, "w": 14, "c": 512}),
    ]):
        tfma, s = vpu_stencil_rate(**kw)
        vpu_forms[vlabel] = round(tfma, 3)
        print(f"vpu 9-tap stencil [{vlabel}]: {tfma:.3f} T-FMA/s "
              f"({s * 1e3:.3f} ms/call)", flush=True)
    out["vpu_formulations"] = vpu_forms
    out["vpu_stencil_tfmas"] = max(vpu_forms.values())
    if not args.quick:
        out["implied_shipped_tfmas"] = implied_dw_rates()
    tflops, s = mxu_rate()
    out["mxu_tflops"] = round(tflops, 1)
    print(f"mxu bf16 matmul: {tflops:.1f} TFLOP/s  ({s * 1e3:.3f} ms/call)")
    out["paper"] = {"hbm_gbps": 810.0, "vpu_tfmas": 3.85, "mxu_tflops": 197.0}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "achievable_v5e.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
