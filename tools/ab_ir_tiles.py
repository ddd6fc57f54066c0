"""IR-kernel tiling-mode race on the real chip (MobileNet-V2 blocks).

Two open mode choices the VMEM-cap heuristic can't settle by itself:
  - blk02 (56sq, e144, residual): rows mode at the 12MB cap vs whole-image
    at a raised cap (both compile on hw — the whole tile was probed OK at
    15MB, /tmp round-3 probe; est 12.0MB misses the default cap by 9KB).
  - blk13 (14->7 s2, e576): whole-image is forced to bn=8 by the sublane
    rule (est 14.0MB, compiles at a 15MB cap) vs the xla fallback it ships
    with at the 12MB cap.

Method: one process, numerics gate, interleaved fenced windows
(utils/timing.fenced_window), medians over --rounds.

Usage: python tools/ab_ir_tiles.py [--batch 256] [--rounds 3]
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
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    import mobilenet_tpu.ops.pallas_ir_block as irb
    from mobilenet_tpu.ops import conv as ops
    from mobilenet_tpu.utils.timing import fenced_window

    rng = np.random.default_rng(0)

    def xla_ref(x, ew, eb, dww, dwb, pw, pb, s, res):
        z = ops.pointwise_conv(x, ew, bias=eb, relu6=True)
        zd = ops.depthwise_conv_xla(z, dww, s, bias=dwb, relu6=True)
        out = ops.pointwise_conv(zd, pw, bias=pb, relu6=None)
        return out + x if res else out

    def build(n, h, cin, e, cout, s, res):
        x = jax.device_put(jnp.asarray(
            rng.uniform(-1, 1, (n, h, h, cin)), jnp.bfloat16))
        ws = [jnp.asarray(a, jnp.bfloat16) for a in (
            rng.normal(0, cin ** -0.5, (cin, e)),
            rng.normal(0, 0.1, (e,)),
            rng.normal(0, 0.3, (3, 3, 1, e)),
            rng.normal(0, 0.1, (e,)),
            rng.normal(0, e ** -0.5, (e, cout)),
            rng.normal(0, 0.1, (cout,)))]
        return x, ws

    def race(name, entries, x):
        def sync(o):
            return np.asarray(o[0, :1, :1, :4])

        outs = {}
        for label, fn in entries.items():
            out = fn(x)
            sync(out)
            outs[label] = np.asarray(out[:2], np.float32)
        labels = list(entries)
        d = max(np.abs(outs[labels[0]] - outs[l]).max() for l in labels[1:])
        print(f"{name} numerics: max_abs_diff={d:.3e}", flush=True)
        results = {l: [] for l in entries}
        for r in range(args.rounds):
            for label, fn in entries.items():
                for _ in range(3):
                    out = fn(x)
                sync(out)
                dt, steps = fenced_window(lambda: fn(x), sync, args.steps)
                ms = dt / steps * 1e3
                results[label].append(ms)
                print(f"  round {r} {name}/{label:>6}: {ms:7.3f} ms", flush=True)
        meds = {l: float(np.median(v)) for l, v in results.items()}
        print(f"{name} medians: { {l: round(v, 3) for l, v in meds.items()} } "
              f"winner={min(meds, key=meds.get)}", flush=True)

    def ir_entry(ws, stride, res, cap):
        # mode resolves at trace time under the given cap; one jit per cap
        def fn(x):
            old = irb._VMEM_CAP
            irb._VMEM_CAP = cap
            try:
                return irb.inverted_residual_pallas(x, *ws, stride, res)
            finally:
                irb._VMEM_CAP = old
        return jax.jit(fn)

    # --- blk02: rows (default cap) vs whole (raised cap) -------------------
    n = args.batch
    x, ws = build(n, 56, 24, 144, 24, 1, True)
    assert irb._mode(n, 56, 56, 24, 144, 24, 1, 2)[0] == "rows"
    race("blk02", {"rows": ir_entry(ws, 1, True, irb._VMEM_CAP),
                   "whole": ir_entry(ws, 1, True, 15 * 1024 * 1024)}, x)

    # --- blk13: xla (shipping fallback) vs whole at the raised cap ---------
    x, ws = build(n, 14, 96, 576, 160, 2, False)
    race("blk13", {"xla": jax.jit(lambda x: xla_ref(x, *ws, 2, False)),
                   "whole": ir_entry(ws, 2, False, 15 * 1024 * 1024)}, x)


if __name__ == "__main__":
    main()
