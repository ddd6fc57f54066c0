"""Row-tile race for the V2 IR kernel's big-spatial blocks (block0/block1).

After the row-tiled mode landed, prefix attribution still put 16.8 of
28.3 ms/batch in the two 112-squared blocks (block0 10.8, block1 6.0 —
/tmp/v2_attr2 round 3). This races the cheap knob first: the row-tile
height th, plus the non-IR alternatives (xla ops; standalone pallas dw +
xla matmul for block0). One process, numerics-gated, interleaved fenced
windows, medians over --rounds.

Usage: python tools/ab_ir_rows.py [--batch 256] [--block 0|1] [--rounds 3]
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
    ap.add_argument("--block", type=int, default=0, choices=[0, 1])
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from mobilenet_tpu.ops import conv as ops
    from mobilenet_tpu.ops.pallas_dw import depthwise_conv_pallas
    from mobilenet_tpu.ops.pallas_ir_block import inverted_residual_pallas
    from mobilenet_tpu.utils.timing import fenced_window

    rng = np.random.default_rng(0)
    n = args.batch
    if args.block == 0:
        # 1.0-224 block0: t=1 (identity expand), 112sq, 32 -> 16, s1
        h, cin, e, cout, s, res = 112, 32, 32, 16, 1, False
        identity = True
    else:
        # 1.0-224 block1: 112sq, 16 -> e96 -> 24, s2
        h, cin, e, cout, s, res = 112, 16, 96, 24, 2, False
        identity = False

    x = jax.device_put(jnp.asarray(
        np.clip(rng.uniform(0, 6, (n, h, h, cin)), 0, 6), jnp.bfloat16))
    if identity:
        ew = jnp.eye(cin, dtype=jnp.bfloat16)
        eb = jnp.zeros((cin,), jnp.bfloat16)
    else:
        ew = jnp.asarray(rng.normal(0, cin ** -0.5, (cin, e)), jnp.bfloat16)
        eb = jnp.asarray(rng.normal(0, 0.1, (e,)), jnp.bfloat16)
    dww = jnp.asarray(rng.normal(0, 0.3, (3, 3, 1, e)), jnp.bfloat16)
    dwb = jnp.asarray(rng.normal(0, 0.1, (e,)), jnp.bfloat16)
    pw = jnp.asarray(rng.normal(0, e ** -0.5, (e, cout)), jnp.bfloat16)
    pb = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.bfloat16)

    def xla_fn(x):
        z = x if identity else ops.pointwise_conv(x, ew, bias=eb, relu6=True)
        zd = ops.depthwise_conv_xla(z, dww, s, bias=dwb, relu6=True)
        return ops.pointwise_conv(zd, pw, bias=pb, relu6=None)

    def pdw_fn(x):  # block0 only: standalone pallas dw + xla matmul
        zd = depthwise_conv_pallas(x, dww, s, bias=dwb, relu6=True)
        return ops.pointwise_conv(zd, pw, bias=pb, relu6=None)

    h_out = h // s
    entries = {"xla": jax.jit(xla_fn)}
    if identity:
        entries["pallas_dw"] = jax.jit(pdw_fn)
        # lane-packed route with the Cout lane-divisor padding the pipeline
        # ships (checkpoints.padding.pad_block0_v2): R=128/Cin pixel packing
        # restores full VPU occupancy for the 112-squared dw.
        from mobilenet_tpu.ops.pallas_block_packed import (
            pack, separable_block_packed, unpack)

        coutp = -(-cout // cin) * cin
        pw_p = jnp.pad(pw, ((0, 0), (0, coutp - cout)))
        pb_p = jnp.pad(pb, (0, coutp - cout))

        def packed_fn(x):
            yp = separable_block_packed(pack(x, cin), dww, dwb, pw_p, pb_p,
                                        cin, coutp, True, pw_epilogue=False)
            return unpack(yp, coutp)[..., :cout]  # slice only for numerics

        entries["packed"] = jax.jit(packed_fn)
    for th in (4, 8, 14, 16, 28, 56):
        if h_out % th or h_out // th < 2:
            continue
        entries[f"ir_th{th}"] = jax.jit(
            lambda x, th=th: inverted_residual_pallas(
                x, ew, eb, dww, dwb, pw, pb, s, res, block_th=th))

    def sync(o):
        return np.asarray(o[0, :1, :1, :4])

    outs = {}
    for label, fn in list(entries.items()):
        try:
            out = fn(x)
            sync(out)
            outs[label] = np.asarray(out[:2], np.float32)
        except Exception as ex:  # AOT-safe compile failure -> drop the arm
            print(f"{label}: compile FAIL ({str(ex)[:120]})", flush=True)
            del entries[label]
    base = outs["xla"]
    for label, o in outs.items():
        print(f"numerics {label}: max_abs={np.abs(o - base).max():.3e}",
              flush=True)

    results = {l: [] for l in entries}
    for r in range(args.rounds):
        for label, fn in entries.items():
            for _ in range(3):
                out = fn(x)
            sync(out)
            dt, steps = fenced_window(lambda: fn(x), sync, args.steps)
            ms = dt / steps * 1e3
            results[label].append(ms)
            print(f"round {r} {label:>10}: {ms:7.3f} ms/batch", flush=True)
    meds = {l: float(np.median(v)) for l, v in results.items()}
    print(f"block{args.block} medians: "
          f"{ {l: round(v, 3) for l, v in meds.items()} } "
          f"winner={min(meds, key=meds.get)}", flush=True)


if __name__ == "__main__":
    main()
