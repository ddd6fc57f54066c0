"""A/B dense-block tile sizes e2e on the chip.

The fused block's (BN, TH) tiles come from pallas_block.pick_tiles, tuned in
round 1 against the 112-squared layers; the roofline audit (tools/roofline.py)
shows the 56/28-squared (B2-B5) and 14-squared (B6-B12) segments running at
~40% of their HBM/MXU floors, so this tool races alternative tile policies
END-TO-END (full network, fetch-fenced windows, interleaved rounds, one
process — docs/design.md SS5 measurement discipline).

A "policy" remaps pick_tiles' result for matching block shapes. Because
_separable_block_impl is an inner jit whose cache would mask a monkeypatched
pick_tiles, each candidate clears the impl cache before building a fresh
entry — every candidate recompiles, so chunk runs if the compile budget is
tight.

  python tools/ab_tiles.py --policies base,th8,th28,bn2x
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def make_policy(name, base_fn):
    """Return a pick_tiles replacement implementing the named policy."""

    def wrapped(n, h_out, wdim, cin, cout, stride, itemsize=2, **kw):
        bn, th = base_fn(n, h_out, wdim, cin, cout, stride, itemsize, **kw)
        if name == "base":
            return bn, th
        if name == "th8" and h_out in (28, 56) and h_out % 8 == 0:
            return bn, 8  # halve row tiles on the mid-spatial blocks
        if name == "th28" and h_out == 28:
            return bn, 28  # whole-image tiles at 28^2 (more batch overlap)
        if name == "th14" and h_out == 14:
            return bn, 14
        if name == "th7" and h_out in (7, 14):
            return bn, 7  # halve row tiles on the 14^2 stretch
        if name == "bn2x":
            # double the batch tile when it still divides N (bigger MXU M)
            if n % (bn * 2) == 0:
                return bn * 2, th
        if name == "bnhalf" and bn > 1:
            return bn // 2, th
        return bn, th

    return wrapped


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--policies", default="base,th8,th28,bn2x,bnhalf")
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.models import mobilenet_v1
    from mobilenet_tpu.ops import pallas_block
    from mobilenet_tpu.ops import preprocess as prep
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    params = to_device(fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps),
                       dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.integers(
        0, 256, (args.batch, args.res, args.res, 3), dtype=np.uint8)))

    def sync(o):
        return np.asarray(o[0, :4])

    base_fn = pallas_block.pick_tiles
    policies = args.policies.split(",")
    entries = {}
    ref_out = None
    for pol in policies:
        pallas_block.pick_tiles = make_policy(pol, base_fn)
        pallas_block._separable_block_impl.clear_cache()

        def fn(u8):
            x = prep.preprocess(u8, cfg.resolution, jnp.bfloat16)
            return mobilenet_v1.forward(params, x, cfg, dw_backend="fused")

        e = jax.jit(fn)
        t0 = time.perf_counter()
        try:
            out = np.asarray(e(img)[:2], np.float32)
        except Exception as err:  # compile-time VMEM OOM etc.: policy is
            # infeasible on this hardware — record and keep racing the rest
            # (an AOT failure doesn't touch the device, unlike a runtime
            # out-of-bounds window)
            msg = str(err).splitlines()[0][:160]
            print(f"compile {pol}: INFEASIBLE ({msg})", flush=True)
            continue
        print(f"compile {pol}: {time.perf_counter()-t0:5.1f}s", flush=True)
        if ref_out is None:
            ref_out = out
        else:  # same logits to bf16 tolerance regardless of tiling
            assert np.allclose(out, ref_out, atol=5e-2), pol
        entries[pol] = e
    pallas_block.pick_tiles = base_fn

    meas = {p: [] for p in entries}
    for _ in range(args.rounds):
        for p, e in entries.items():
            sync(e(img))
            dt, n = fenced_window(lambda e=e: e(img), sync, args.steps)
            meas[p].append(n * args.batch / dt)
    for p in meas:
        med = float(np.median(meas[p]))
        print(json.dumps({"policy": p, "images_per_sec": round(med, 1),
                          "runs": [round(v, 1) for v in meas[p]]}),
              flush=True)


if __name__ == "__main__":
    main()
