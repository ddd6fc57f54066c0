"""IN-NETWORK row-tile race for V2's stride-2 112sq block (block 1).

The standalone-kernel race (tools/ab_ir_rows.py --block 1) said th=4 wins
(8.22 vs 8.42/8.91 ms), but shipping th=4 made the in-network segment
WORSE (9.21 ms vs 6.04 at the previously shipped th=14 —
tools/prefix_attr.py --model v2 before/after). Standalone kernels and
in-network kernels pipeline differently; this tool races th at the FULL
MODEL level, where the answer actually matters.

Usage: python tools/ab_v2_th_net.py [--batch 256] [--ths 4,8,14,28,56]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--ths", default="4,8,14,28,56")
    args = ap.parse_args()

    import mobilenet_tpu.ops.pallas_ir_block as irb
    from mobilenet_tpu.checkpoints.padding import pad_block0_v2
    from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
    from mobilenet_tpu.models.mobilenet_v2 import V2Config, forward_v2
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = V2Config(alpha=args.alpha, resolution=args.res,
                   compute_dtype="bfloat16")
    params = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a, jnp.bfloat16)),
        pad_block0_v2(fold_bn_v2(init_params_v2(cfg, seed=0),
                                 eps=cfg.bn_eps)))
    rng = np.random.default_rng(0)
    x = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (args.batch, args.res, args.res, 3)),
        jnp.bfloat16))

    orig_pick = irb._pick_th

    def entry(th_s2):
        def patched(h, w, cin, ep, cout, stride, itemsize,
                    _orig=orig_pick, _th=th_s2):
            th = _orig(h, w, cin, ep, cout, stride, itemsize)
            if stride == 2 and th and (h // stride) % _th == 0:
                return _th
            return th

        def fn(v):
            irb._pick_th = patched
            try:
                return forward_v2(params, v, cfg, dw_backend="fused")
            finally:
                irb._pick_th = orig_pick
        return jax.jit(fn)

    entries = {f"th{t}": entry(int(t)) for t in args.ths.split(",")}

    def sync(o):
        return np.asarray(o[0, :4])

    lg = {}
    for name, fn in entries.items():
        out = fn(x)
        sync(out)
        lg[name] = np.asarray(out[:4], np.float32)
    base = next(iter(lg.values()))
    for name, v in lg.items():
        print(f"numerics {name}: max_abs={np.abs(v - base).max():.3e}",
              flush=True)

    results = {n: [] for n in entries}
    for r in range(args.rounds):
        for name, fn in entries.items():
            for _ in range(3):
                out = fn(x)
            sync(out)
            dt, steps = fenced_window(lambda: fn(x), sync, args.steps)
            ips = steps * args.batch / dt
            results[name].append(ips)
            print(f"round {r} {name:>5}: {ips:,.0f} img/s", flush=True)
    meds = {k: float(np.median(v)) for k, v in results.items()}
    print(f"medians: { {k: round(v, 1) for k, v in meds.items()} }  "
          f"winner={max(meds, key=meds.get)}", flush=True)


if __name__ == "__main__":
    main()
