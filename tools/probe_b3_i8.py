"""Isolate V3-Large block 3 (k5 s2 SE at 56²): int8 kernel vs bf16 kernel.

The 2026-08-19 paired attribution puts b3 at 3.35 ms int8 vs 1.73 bf16 —
the one segment where int8 is ~2x, while its siblings b4/b5 (same k5+SE
class at 28²) sit near parity. This probe times both kernels standalone
on device-resident inputs at b3's exact geometry (cin widened to 32 by
the b1 packed producer), plus block_n variants of the int8 kernel.
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
    from mobilenet_tpu.ops.pallas_ir_v3 import v3_block_pallas
    from mobilenet_tpu.quant.pallas_ir_v3_i8 import v3_block_pallas_i8
    from mobilenet_tpu.quant.v3 import _as_device_tree_v3, quantize_v3
    from mobilenet_tpu.utils.timing import fenced_window

    cfg = V3Config(variant="large", alpha=1.0, resolution=224)
    folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
    dev = _as_device_tree_v3(quantize_v3(folded, cfg, n_calib=4))
    fparams = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)
    bd = cfg.block_defs[3]
    qblk, fblk = dev["blocks"][3], fparams["blocks"][3]
    print(f"b3: k={bd.kernel} stride={bd.stride} se={bd.se_mid} "
          f"act={bd.act}", flush=True)

    n, h, cin = 256, 56, 24
    rng = np.random.default_rng(0)
    ints = rng.integers(-128, 128, (n, h, h, cin)).astype(np.int8)
    x_carry = jax.device_put(jnp.asarray(ints, jnp.bfloat16))
    x_f = jax.device_put(jnp.asarray(
        rng.uniform(-4, 4, (n, h, h, cin)), jnp.bfloat16))

    def scalarize(y):
        return jnp.sum(y.astype(jnp.float32) * 1e-6)

    se_kw_f = dict(se_w1=fblk["se"]["w1"], se_b1=fblk["se"]["b1"],
                   se_w2=fblk["se"]["w2"], se_b2=fblk["se"]["b2"])

    def f_bf16(t):
        return scalarize(v3_block_pallas(
            t, fblk["exp"]["w"], fblk["exp"]["b"], fblk["dw"]["w"],
            fblk["dw"]["b"], fblk["prj"]["w"], fblk["prj"]["b"],
            k=bd.kernel, stride=bd.stride, act=bd.act, residual=False,
            **se_kw_f))

    def mk_i8(block_n):
        def f(t):
            return scalarize(v3_block_pallas_i8(
                t, qblk.get("exp"), qblk["dw"], qblk["prj"], k=bd.kernel,
                stride=bd.stride, act=bd.act, se1=qblk.get("se1"),
                se2=qblk.get("se2"), residual=False,
                out_dtype=jnp.bfloat16, block_n=block_n))
        return f

    cases = [("bf16 kernel", f_bf16, x_f), ("int8 kernel", mk_i8(None),
                                            x_carry)]
    for bn in (1, 2, 4, 8):
        cases.append((f"int8 bn={bn}", mk_i8(bn), x_carry))
    fns = []
    for name, f, x in cases:
        try:
            jf = jax.jit(f)
            np.asarray(jf(x))
            fns.append((name, jf, x))
            print(f"compiled {name}", flush=True)
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: {e})", flush=True)
    for _ in range(3):
        for name, f, x in fns:
            dt, k = fenced_window(lambda: f(x), np.asarray, 20)
            print(f"{name:14s} {dt / k * 1e3:8.3f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
