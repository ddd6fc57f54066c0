"""Race the single-kernel fused expand-s2 route (ops/pallas_expand_s2)
against the two-stage packed-expand route — one process, interleaved, e2e.

Standalone, the fused kernel measured 3.23 vs 6.29 ms/batch-256 at the
V3-Large block-1 geometry (tools/probe_b1_s2.py, 2026-08-19): it removes
the expanded tensor's HBM round-trip and halves the dw FMA width by
expanding only even pixels. This tool confirms the e2e delta and gates
the two routes' logits against each other (bf16 reassociation class).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _bench_common import interleave_bench, make_batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--model", default="v3", choices=["v3", "v3small", "v2"])
    ap.add_argument("--int8", action="store_true",
                    help="race the int8 twin (quant/v3.FUSED_EXPAND_S2_I8)")
    args = ap.parse_args()

    from mobilenet_tpu.ops import preprocess as prep

    if args.int8:
        from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

        if args.model == "v2":
            from mobilenet_tpu.checkpoints.v2 import (fold_bn_v2,
                                                      init_params_v2)
            from mobilenet_tpu.models.mobilenet_v2 import V2Config
            from mobilenet_tpu.quant import v2 as qmod
            from mobilenet_tpu.quant.v2 import (_as_device_tree_v2,
                                                forward_v2_i8, quantize_v2)

            cfg = V2Config(alpha=args.alpha, resolution=args.res)
            folded = fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps)
            dev = _as_device_tree_v2(quantize_v2(folded, cfg))
            fwd_i8 = forward_v2_i8
        else:
            from mobilenet_tpu.checkpoints.v3 import (fold_bn_v3,
                                                      init_params_v3)
            from mobilenet_tpu.models.mobilenet_v3 import V3Config
            from mobilenet_tpu.quant import v3 as qmod
            from mobilenet_tpu.quant.v3 import (_as_device_tree_v3,
                                                forward_v3_i8, quantize_v3)

            cfg = V3Config(variant="large" if args.model == "v3" else "small",
                           alpha=args.alpha, resolution=args.res)
            folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
            dev = _as_device_tree_v3(quantize_v3(folded, cfg))
            fwd_i8 = forward_v3_i8

        arms = [("two_stage", False, None), ("fused_b1", True, frozenset({1}))]
        if args.model == "v2":
            # b3's fused route pads cout 32->128 (4x ripple into b4..b12's
            # residual chain) — race it separately from b1.
            arms.append(("fused_b1b3", True, None))
        entries = {}
        for label, flag, blocks in arms:
            def fn(images_u8, flag=flag, blocks=blocks):
                from mobilenet_tpu.quant.ops import quantize_input_dev

                x = prep.preprocess(images_u8, cfg.resolution, jnp.float32)
                x_q = quantize_input_dev(x, ACT_IN_SCALE,
                                         out_dtype=jnp.bfloat16)
                old = qmod.FUSED_EXPAND_S2_I8
                old_b = getattr(qmod, "FUSED_EXPAND_S2_I8_BLOCKS", None)
                old_h = getattr(qmod, "FUSED_EXPAND_S2_I8_MIN_H", None)
                qmod.FUSED_EXPAND_S2_I8 = flag
                if hasattr(qmod, "FUSED_EXPAND_S2_I8_BLOCKS"):
                    qmod.FUSED_EXPAND_S2_I8_BLOCKS = blocks
                if flag and old_h is not None:
                    # The arm's block set must decide eligibility, not the
                    # shipped resolution crossover — without this, every
                    # arm below MIN_H traces the SAME program and the race
                    # measures noise (this tool produced the crossover
                    # numbers the MIN_H default encodes).
                    qmod.FUSED_EXPAND_S2_I8_MIN_H = 0
                try:
                    return fwd_i8(dev, x_q, cfg, use_fused=True)
                finally:
                    qmod.FUSED_EXPAND_S2_I8 = old
                    if hasattr(qmod, "FUSED_EXPAND_S2_I8_BLOCKS"):
                        qmod.FUSED_EXPAND_S2_I8_BLOCKS = old_b
                    if old_h is not None:
                        qmod.FUSED_EXPAND_S2_I8_MIN_H = old_h

            entries[label] = jax.jit(fn)

        img = make_batch(args.batch, args.res)
        ys = {k: np.asarray(f(img)).astype(np.float64)
              for k, f in entries.items()}
        for k in entries:
            if k == "two_stage":
                continue
            d = np.abs(ys[k] - ys["two_stage"])
            print(f"{k}: int8 logits max_abs diff = {d.max():.4e} "
                  f"(EXACT contract: must be 0)", flush=True)
            assert d.max() == 0.0
        interleave_bench(entries, img, args.batch, args.steps, args.rounds)
        return

    if args.model == "v2":
        from mobilenet_tpu.checkpoints.padding import pad_block0_v2
        from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
        from mobilenet_tpu.models import mobilenet_v2 as mod
        from mobilenet_tpu.models.mobilenet_v2 import V2Config, forward_v2

        cfg = V2Config(alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        folded = pad_block0_v2(
            fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps))
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)
        fwd = forward_v2
    else:
        from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
        from mobilenet_tpu.models import mobilenet_v3 as mod
        from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3

        cfg = V3Config(variant="large" if args.model == "v3" else "small",
                       alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
        params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)
        fwd = forward_v3

    arms = [("two_stage", False, None, None),
            ("fused_min", True, None, None),
            ("fused_wide", True, 128, None)]
    if args.model == "v2":
        arms.append(("fused_b1_only", True, None, frozenset({1})))
    entries = {}
    for label, flag, pad, blocks in arms:
        def fn(images_u8, flag=flag, pad=pad, blocks=blocks):
            x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
            old = mod.FUSED_EXPAND_S2
            old_pad = mod.FUSED_EXPAND_S2_PAD
            old_b = getattr(mod, "FUSED_EXPAND_S2_BLOCKS", None)
            old_h = getattr(mod, "FUSED_EXPAND_S2_MIN_H", None)
            mod.FUSED_EXPAND_S2 = flag  # trace-time knobs
            mod.FUSED_EXPAND_S2_PAD = pad
            if hasattr(mod, "FUSED_EXPAND_S2_BLOCKS"):
                mod.FUSED_EXPAND_S2_BLOCKS = blocks
            if flag and old_h is not None:
                # Let the arm's block set decide, not the shipped MIN_H
                # crossover — below it every arm would trace the SAME
                # program (this tool measured that crossover; it must be
                # able to re-measure it at any res).
                mod.FUSED_EXPAND_S2_MIN_H = 0
            try:
                return fwd(params, x, cfg, dw_backend="fused")
            finally:
                mod.FUSED_EXPAND_S2 = old
                mod.FUSED_EXPAND_S2_PAD = old_pad
                if hasattr(mod, "FUSED_EXPAND_S2_BLOCKS"):
                    mod.FUSED_EXPAND_S2_BLOCKS = old_b
                if old_h is not None:
                    mod.FUSED_EXPAND_S2_MIN_H = old_h

        entries[label] = jax.jit(fn)

    img = make_batch(args.batch, args.res)
    ys = {k: np.asarray(f(img)).astype(np.float64)
          for k, f in entries.items()}
    scale = np.abs(ys["two_stage"]).max()
    top_a = ys["two_stage"].argmax(1)
    for k in (k for k in entries if k != "two_stage"):
        d = np.abs(ys[k] - ys["two_stage"])
        agree = (top_a == ys[k].argmax(1)).mean()
        print(f"{k}: logits max_abs diff = {d.max():.4e}  (absmax "
              f"{scale:.2f}, rel {d.max() / scale:.2%}), top-1 agreement "
              f"{agree:.4f}", flush=True)
    interleave_bench(entries, img, args.batch, args.steps, args.rounds)


if __name__ == "__main__":
    main()
