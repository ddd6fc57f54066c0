"""Race (block_h, block_n) tilings of the fused expand-s2 kernel.

The auto-tiler picks whole-image rows (th=56, bn=1) at the V3-Large
block-1 geometry; this races the feasible alternatives standalone on a
device-resident input (fenced windows, interleaved rounds) to check the
heuristic — the kernel measured 3.23 ms against a ~1.1 ms analytic
floor, so tiling overhead is a suspect.
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
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.ops.pallas_block_packed import pack
    from mobilenet_tpu.ops.pallas_expand_s2 import expand_block_packed_s2
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = V3Config(variant="large", alpha=1.0, resolution=224)
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    blk1 = jax.device_put(params["blocks"][1])

    rng = np.random.default_rng(0)
    n = args.batch
    y16 = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (n, 112, 112, 16)), jnp.bfloat16))
    pw = jnp.pad(blk1["prj"]["w"], ((0, 0), (0, 32 - 24)))
    pb = jnp.pad(blk1["prj"]["b"], (0, 32 - 24))

    def make(th, bn):
        def f(t):
            out = expand_block_packed_s2(
                pack(t, 16), blk1["exp"]["w"], blk1["exp"]["b"],
                blk1["dw"]["w"], blk1["dw"]["b"], pw, pb, 16, False,
                block_h=th, block_n=bn)
            return jnp.sum(out.astype(jnp.float32) * 1e-6)
        return jax.jit(f)

    cands = [("auto(th56,bn1)", None, None), ("th28,bn1", 28, 1),
             ("th28,bn2", 28, 2), ("th14,bn4", 14, 4),
             ("th14,bn1", 14, 1), ("th8,bn4", 8, 4), ("th56... n/a", 56, 1)]
    fns = []
    for name, th, bn in cands:
        try:
            f = make(th, bn)
            np.asarray(f(y16))
            fns.append((name, f))
            print(f"compiled {name}", flush=True)
        except Exception as e:  # infeasible tiling: record and skip
            print(f"{name}: INFEASIBLE ({type(e).__name__})", flush=True)
    for _ in range(args.rounds):
        for name, f in fns:
            dt, k = fenced_window(lambda: f(y16), np.asarray, 20)
            print(f"{name:18s} {dt / k * 1e3:8.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
