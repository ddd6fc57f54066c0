"""Race the even/odd split expansion (pallas_expand_s2.EO_EXPAND) against
the per-tap 3-matmul route — standalone at the V3-Large block-1 geometry
AND e2e, one process, interleaved.

eo=True replaces 3 expand matmuls + 3 act passes + 2 input lane rolls
with ONE (128, 2*EE) matmul + 1 act pass + 1 roll on the expanded even
half. Bit-identical (tests/test_pallas_expand_s2.py); the question for
the chip is whether the saved MXU/VPU passes beat the wider live z and
the 256-lane roll's lowering.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_common import interleave_bench, make_batch


def standalone(args):
    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.ops.pallas_block_packed import pack
    from mobilenet_tpu.ops.pallas_expand_s2 import expand_block_packed_s2
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = V3Config(variant="large", alpha=1.0, resolution=224)
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    blk1 = jax.device_put(params["blocks"][1])
    pw = jnp.pad(blk1["prj"]["w"], ((0, 0), (0, 32 - 24)))
    pb = jnp.pad(blk1["prj"]["b"], (0, 32 - 24))

    rng = np.random.default_rng(0)
    n = args.batch
    xp = jax.device_put(pack(jnp.asarray(
        rng.uniform(-1, 1, (n, 112, 112, 16)), jnp.bfloat16), 16))

    fns = {}
    for label, eo in (("per_tap", False), ("eo", True)):
        def fn(x, eo=eo):
            y = expand_block_packed_s2(
                x, blk1["exp"]["w"], blk1["exp"]["b"], blk1["dw"]["w"],
                blk1["dw"]["b"], pw, pb, 16, eo=eo)
            return jnp.sum(y.astype(jnp.float32) * 1e-6)

        fns[label] = jax.jit(fn)

    outs = {k: np.asarray(f(xp)) for k, f in fns.items()}
    print(f"scalarized outputs: {outs} (must match)", flush=True)
    for _ in range(3):
        for k, f in fns.items():
            dt, steps = fenced_window(lambda f=f: f(xp), np.asarray, 20)
            print(f"standalone {k}: {dt / steps * 1e3:8.3f} ms/batch-{n}",
                  flush=True)


def e2e(args):
    from mobilenet_tpu.ops import pallas_expand_s2 as pes
    from mobilenet_tpu.ops import preprocess as prep

    if args.model == "v2":
        from mobilenet_tpu.checkpoints.padding import pad_block0_v2
        from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
        from mobilenet_tpu.models.mobilenet_v2 import V2Config, forward_v2

        cfg = V2Config(alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        folded = pad_block0_v2(
            fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps))
        fwd = forward_v2
    else:
        from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
        from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3

        cfg = V3Config(variant="large" if args.model == "v3" else "small",
                       alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
        fwd = forward_v3
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)

    entries = {}
    for label, eo in (("per_tap", False), ("eo", True)):
        def fn(images_u8, eo=eo):
            x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
            old = pes.EO_EXPAND
            pes.EO_EXPAND = eo  # trace-time knob
            try:
                return fwd(params, x, cfg, dw_backend="fused")
            finally:
                pes.EO_EXPAND = old

        entries[label] = jax.jit(fn)

    img = make_batch(args.batch, args.res)
    ys = {k: np.asarray(f(img)).astype(np.float64)
          for k, f in entries.items()}
    d = np.abs(ys["eo"] - ys["per_tap"])
    agree = (ys["eo"].argmax(1) == ys["per_tap"].argmax(1)).mean()
    print(f"e2e logits max_abs diff = {d.max():.4e} (bit-identical "
          f"contract), top-1 agreement {agree:.4f}", flush=True)
    assert d.max() == 0.0
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--mode", default="both",
                    choices=["standalone", "e2e", "both"])
    ap.add_argument("--model", default="v3", choices=["v3", "v3small", "v2"])
    args = ap.parse_args()
    if args.mode in ("standalone", "both"):
        standalone(args)
    if args.mode in ("e2e", "both"):
        e2e(args)


if __name__ == "__main__":
    main()
