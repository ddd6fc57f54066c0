"""Isolate V3 block-1's packed-s2 kernel cost from the expand that feeds it.

stage_probe_v3 measured the expand->s2 jit pair at ~3.4 ms while V1's
identical-geometry packed s2 kernel (411 MB in, Cin=64 -> 128 at 112²->56²)
measures ~1.0 — this probe times: (a) the s2 kernel standalone on a
device-resident packed input, (b) the expand standalone emitting bf16,
(c) the fused expand+s2 jit, (d) V1-style s2 with pw_epilogue=True, to find
where the extra milliseconds live (suspect: an XLA layout copy between the
matmul reshape and the pallas call's required layout).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
    from mobilenet_tpu.models.mobilenet_v3 import V3Config
    from mobilenet_tpu.ops.pallas_block_packed import (
        pack, packed_expand, separable_block_packed_s2)
    from mobilenet_tpu.ops.pallas_expand_s2 import expand_block_packed_s2
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = V3Config(variant="large", alpha=1.0, resolution=224)
    params = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    # Cast to bf16 AS THE PIPELINE SHIPS IT (runtime.pipeline to_device):
    # the first run of this probe left weights f32, which flips the packed
    # kernel's pw matmul to f32 HIGHEST precision — measured +~1 ms/stage.
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), params)
    blk1 = jax.device_put(params["blocks"][1])

    rng = np.random.default_rng(0)
    n = 256
    y16 = jax.device_put(jnp.asarray(
        rng.uniform(-1, 1, (n, 112, 112, 16)), jnp.bfloat16))
    ye_host = rng.uniform(0, 2, (n, 112, 112, 64)).astype(np.float32)
    ye = jax.device_put(jnp.asarray(ye_host, jnp.bfloat16))

    pw = jnp.pad(blk1["prj"]["w"], ((0, 0), (0, 128 - 24)))
    pb = jnp.pad(blk1["prj"]["b"], (0, 128 - 24))

    def scalarize(y):
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    def f_s2_only(t):
        return scalarize(separable_block_packed_s2(
            pack(t, 64), blk1["dw"]["w"], blk1["dw"]["b"], pw, pb,
            64, 128, False, pw_epilogue=False))

    def f_s2_epi(t):
        return scalarize(separable_block_packed_s2(
            pack(t, 64), blk1["dw"]["w"], blk1["dw"]["b"], pw, pb,
            64, 128, False, pw_epilogue=True))

    def f_expand_only(t):
        return scalarize(packed_expand(t, blk1["exp"]["w"],
                                       blk1["exp"]["b"], "relu"))

    def f_pair(t):
        yexp = packed_expand(t, blk1["exp"]["w"], blk1["exp"]["b"], "relu")
        return scalarize(separable_block_packed_s2(
            pack(yexp, 64), blk1["dw"]["w"], blk1["dw"]["b"], pw, pb,
            64, 128, False, pw_epilogue=False))

    # Fully-fused single-kernel route (ops.pallas_expand_s2): expand in
    # VMEM (even pixels only), dw s2, projection — no HBM round-trip.
    pw32 = jnp.pad(blk1["prj"]["w"], ((0, 0), (0, 32 - 24)))
    pb32 = jnp.pad(blk1["prj"]["b"], (0, 32 - 24))

    def f_fused(t):
        return scalarize(expand_block_packed_s2(
            pack(t, 16), blk1["exp"]["w"], blk1["exp"]["b"],
            blk1["dw"]["w"], blk1["dw"]["b"], pw32, pb32, 16, False))

    # Correctness cross-check on-chip (vs the two-stage route's logits-level
    # values): both compute the same math, fused keeps f32 between stages.
    def f_fused_raw(t):
        return expand_block_packed_s2(
            pack(t, 16), blk1["exp"]["w"], blk1["exp"]["b"],
            blk1["dw"]["w"], blk1["dw"]["b"], pw32, pb32, 16, False)

    def f_pair_raw(t):
        yexp = packed_expand(t, blk1["exp"]["w"], blk1["exp"]["b"], "relu")
        return separable_block_packed_s2(
            pack(yexp, 64), blk1["dw"]["w"], blk1["dw"]["b"], pw, pb,
            64, 128, False, pw_epilogue=False)

    a = np.asarray(jax.jit(f_fused_raw)(y16[:8])).reshape(8, 56, 56, 32)
    b = np.asarray(jax.jit(f_pair_raw)(y16[:8])).reshape(8, 56, 56, 128)
    d = np.max(np.abs(a[..., :24].astype(np.float32)
                      - b[..., :24].astype(np.float32)))
    print(f"fused vs two-stage max_abs diff = {d:.4e} (bf16 class)",
          flush=True)

    cases = [
        ("s2 standalone (ye resident)", f_s2_only, ye),
        ("s2 standalone, pw_epilogue", f_s2_epi, ye),
        ("expand standalone", f_expand_only, y16),
        ("expand+s2 one jit", f_pair, y16),
        ("FUSED expand_s2 one kernel", f_fused, y16),
    ]
    fns = [(name, jax.jit(f), x) for name, f, x in cases]
    for name, f, x in fns:
        np.asarray(f(x))
        print(f"compiled {name}", flush=True)
    for _ in range(3):
        for name, f, x in fns:
            dt, k = fenced_window(lambda: f(x), np.asarray, 20)
            print(f"{name:32s} {dt / k * 1e3:8.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
