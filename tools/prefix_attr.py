"""Prefix-differenced segment attribution on the real chip.

Standalone jits of single layers mislead through the tunnel (~1.5-2.5 ms fixed
per-call overhead, docs/design.md SS5), so per-segment time is measured by
compiling PREFIXES of the network (preprocess+conv1+blocks[0:k]) and
differencing consecutive prefixes. Each prefix reduces its output to one
scalar in-graph (forces all compute; keeps the fetch fence tiny through the
tunnel).

Usage (one process holds the TPU; each prefix costs a remote compile):
  python tools/prefix_attr.py --prefixes 0,1,2,6,13,full          # bf16
  python tools/prefix_attr.py --int8 --prefixes 0,1,2,6,13,full   # int8
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

HEALTH = None  # tunnel-health stamp, set once in main()


def _head_guard(fn, active):
    """Run fn with FUSED_HEAD=False on every model module, restored after:
    the flag is read at TRACE time, so guarding each call covers the first
    (tracing) call and costs ~1us of Python on cached ones."""
    if not active:
        return fn

    def wrapped(*a, **k):
        from mobilenet_tpu.models import (mobilenet_v1, mobilenet_v2,
                                          mobilenet_v3)

        mods = (mobilenet_v1, mobilenet_v2, mobilenet_v3)
        old = [m.FUSED_HEAD for m in mods]
        for m in mods:
            m.FUSED_HEAD = False
        try:
            return fn(*a, **k)
        finally:
            for m, o in zip(mods, old):
                m.FUSED_HEAD = o
    return wrapped


def build_entries(args, prefixes, int8=None):
    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.ops import preprocess as prep

    if int8 is None:
        int8 = args.int8
    # With stage prefixes (cl/pool) present, the 'cl'/'pool' entries append
    # the UNFUSED head ops while 'full' would take the fused-head Pallas
    # kernel — the differenced final segment would then compare fused vs
    # unfused and can come out negative (ADVICE round 3). Force the unfused
    # head for EVERY entry so deltas are like-for-like; the fused-vs-unfused
    # head delta itself is measured separately by tools/ab_head.py. Applied
    # around each CALL (the knob matters at trace time) via _head_guard —
    # not as a sticky module mutation, so in-process callers that build
    # other entries later (lower_check imports build_entries) see the
    # shipping head (round-4 review finding).
    unfused_head = any(k in ("cl", "pool") for k in prefixes)
    if unfused_head:
        print("note: stage prefixes present -> UNFUSED head for all entries "
              "(incl. full); fused-head delta is ab_head.py's job", flush=True)
    if getattr(args, "model", "v1") == "v2":
        from mobilenet_tpu.checkpoints.padding import pad_block0_v2
        from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
        from mobilenet_tpu.models.mobilenet_v2 import V2Config, forward_v2

        if int8:
            from mobilenet_tpu.quant import ops as qops
            from mobilenet_tpu.quant.quantize import ACT_IN_SCALE
            from mobilenet_tpu.quant.v2 import (_as_device_tree_v2,
                                                forward_v2_i8, quantize_v2)

            cfg = V2Config(alpha=args.alpha, resolution=args.res,
                           compute_dtype="bfloat16")
            folded = fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps)
            dev = _as_device_tree_v2(quantize_v2(folded, cfg))
            fused = args.routing != "xla"
            n_blk = len(cfg.block_defs)
            entries = {}
            for k in prefixes:
                # Head-stage prefixes split the final "head" delta:
                #   n_blk ("17") = all blocks, no head; "cl" = + conv_last;
                #   "pool" = + avgpool; "full" = + fc logits.
                stage = k if k in ("cl", "pool") else None
                nb = (None if k == "full"
                      else n_blk if stage else int(k))

                def fni(images_u8, nb=nb, stage=stage):
                    x = prep.preprocess(images_u8, cfg.resolution,
                                        jnp.float32)
                    x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                                  out_dtype=jnp.bfloat16)
                    y = forward_v2_i8(dev, x_q, cfg, use_fused=fused,
                                      num_blocks=nb)
                    if stage is not None:  # same ops the full head runs
                        cl = dev["conv_last"]
                        y = qops.pointwise_i8(y, cl["w"], cl["b"], cl["m"],
                                              cl["six_q"], cfg.relu6)
                        if stage == "pool":
                            y = qops.avgpool_i8(y)
                    return jnp.sum(y.astype(jnp.float32)).reshape(1)

                entries[k] = jax.jit(fni)
            return cfg, {k: _head_guard(f, unfused_head)
                 for k, f in entries.items()}

        from mobilenet_tpu.ops import conv as ops

        cfg = V2Config(alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        n_blk = len(cfg.block_defs)
        folded = fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps)
        if args.routing != "xla":  # build as production ships it
            folded = pad_block0_v2(folded)
        params = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.bfloat16), folded)
        entries = {}
        for k in prefixes:
            # Stage prefixes, bf16 twin of the int8 branch above:
            #   "cl" = all blocks + conv_last; "pool" = + avgpool.
            stage = k if k in ("cl", "pool") else None
            nb = None if k == "full" else n_blk if stage else int(k)

            def fn(images_u8, nb=nb, stage=stage):
                x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
                y = forward_v2(params, x, cfg, dw_backend=args.routing,
                               num_blocks=nb)
                if stage is not None:  # same ops the full head runs
                    y = ops.pointwise_conv(y, params["conv_last"]["w"],
                                           bias=params["conv_last"]["b"],
                                           relu6=True)
                    if stage == "pool":
                        y = ops.global_avg_pool(y)
                return jnp.sum(y.astype(jnp.float32)).reshape(1)

            entries[k] = jax.jit(fn)
        return cfg, {k: _head_guard(f, unfused_head)
                 for k, f in entries.items()}
    if getattr(args, "model", "v1") in ("v3", "v3small"):
        from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
        from mobilenet_tpu.models.mobilenet_v3 import V3Config, forward_v3

        cfg = V3Config(variant="large" if args.model == "v3" else "small",
                       alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
        entries = {}
        if int8:
            from mobilenet_tpu.quant import ops as qops
            from mobilenet_tpu.quant.quantize import ACT_IN_SCALE
            from mobilenet_tpu.quant.v3 import (_as_device_tree_v3,
                                                forward_v3_i8, quantize_v3)

            dev = _as_device_tree_v3(quantize_v3(folded, cfg))
            fused = args.routing != "xla"  # the shipping throughput route
            for k in prefixes:
                if k in ("cl", "pool"):
                    raise SystemExit(
                        "stage prefixes cl/pool are not implemented for "
                        "--model v3 --int8 (the calibrated named-activation "
                        "head ops live inside forward_v3_i8); use block "
                        f"indices 0..{len(cfg.block_defs)} or 'full'")
                nb = None if k == "full" else int(k)

                def fni(images_u8, nb=nb):
                    x = prep.preprocess(images_u8, cfg.resolution,
                                        jnp.float32)
                    x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                                  out_dtype=jnp.bfloat16)
                    y = forward_v3_i8(dev, x_q, cfg, use_fused=fused,
                                      num_blocks=nb)
                    return jnp.sum(y.astype(jnp.float32)).reshape(1)

                entries[k] = jax.jit(fni)
            return cfg, {k: _head_guard(f, unfused_head)
                 for k, f in entries.items()}
        from mobilenet_tpu.ops import conv as v3ops

        params = jax.tree.map(
            lambda a: jnp.asarray(a, jnp.bfloat16), folded)
        n_blk = len(cfg.block_defs)
        for k in prefixes:
            # Stage prefixes (bf16): "cl" = all blocks + conv_last;
            # "pool" = + avgpool (the head 1x1 + fc remain in "full").
            stage = k if k in ("cl", "pool") else None
            nb = None if k == "full" else n_blk if stage else int(k)

            def fn(images_u8, nb=nb, stage=stage):
                x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
                y = forward_v3(params, x, cfg, dw_backend=args.routing,
                               num_blocks=nb)
                if stage is not None:  # same ops the unfused head runs
                    y = v3ops.pointwise_conv(y, params["conv_last"]["w"],
                                             bias=params["conv_last"]["b"],
                                             act=cfg.head_act)
                    if stage == "pool":
                        y = v3ops.global_avg_pool(y)
                return jnp.sum(y.astype(jnp.float32)).reshape(1)

            entries[k] = jax.jit(fn)
        return cfg, {k: _head_guard(f, unfused_head)
                 for k, f in entries.items()}
    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    entries = {}
    if int8:
        from mobilenet_tpu.quant import ops as qops
        from mobilenet_tpu.quant.model import (_as_device_tree, forward_i8,
                                               quantize_for_device)
        from mobilenet_tpu.quant.quantize import ACT_IN_SCALE

        dev = _as_device_tree(quantize_for_device(folded, cfg))
        for k in prefixes:
            _check_v1_stage(k, cfg)
            stage = k if k == "pool" else None
            nb = (None if k == "full"
                  else len(cfg.block_channels) if stage else int(k))

            def fn(images_u8, nb=nb, stage=stage):
                x = prep.preprocess(images_u8, cfg.resolution, jnp.float32)
                x_q = qops.quantize_input_dev(x, ACT_IN_SCALE,
                                              out_dtype=jnp.bfloat16)
                y = forward_i8(dev, x_q, cfg, use_fused=True, num_blocks=nb)
                if stage == "pool":  # blocks + avgpool, fc left to "full"
                    y = qops.avgpool_i8(y)
                return jnp.sum(y.astype(jnp.float32)).reshape(1)

            entries[k] = jax.jit(fn)
    else:
        from mobilenet_tpu.checkpoints.padding import needs_padding, pad_channels
        from mobilenet_tpu.models import mobilenet_v1

        from mobilenet_tpu.ops import conv as v1ops

        if needs_padding(folded):
            folded = pad_channels(folded)
        params = to_device(folded, dtype=jnp.bfloat16)
        for k in prefixes:
            _check_v1_stage(k, cfg)
            stage = k if k == "pool" else None
            nb = (None if k == "full"
                  else len(cfg.block_channels) if stage else int(k))

            def fn(images_u8, nb=nb, stage=stage):
                x = prep.preprocess(images_u8, cfg.resolution, jnp.bfloat16)
                y = mobilenet_v1.forward(params, x, cfg, dw_backend="fused",
                                         num_blocks=nb)
                if stage == "pool":  # blocks + avgpool, fc left to "full"
                    y = v1ops.global_avg_pool(y)
                return jnp.sum(y.astype(jnp.float32)).reshape(1)

            entries[k] = jax.jit(fn)
    return cfg, {k: _head_guard(f, unfused_head)
                 for k, f in entries.items()}


def _check_v1_stage(k, cfg):
    """V1 has no conv_last: 'cl' is a V2/V3 stage prefix. Fail with a clear
    message instead of int('cl')."""
    if k == "cl":
        raise SystemExit(
            "stage prefix 'cl' (conv_last) does not exist on MobileNet-V1; "
            f"use block indices 0..{len(cfg.block_channels)}, 'pool', or "
            "'full'")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--model", default="v1", choices=["v1", "v2", "v3", "v3small"])
    ap.add_argument("--routing", default="fused",
                    help="dw_backend for the --model v2/v3 prefixes")
    ap.add_argument("--compare", action="store_true",
                    help="measure bf16 AND int8 prefixes interleaved in one "
                         "process; report the per-segment int8-bf16 gap")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--prefixes", default="0,1,2,6,13,full",
                    help="comma list of block counts (0 = conv1 only) + 'full'")
    args = ap.parse_args()

    prefixes = [p if not p.isdigit() else int(p)
                for p in args.prefixes.split(",")]
    global HEALTH
    from _bench_common import tunnel_health
    HEALTH = tunnel_health()
    if args.compare:
        return compare(args, prefixes)
    cfg, entries = build_entries(args, prefixes)

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.integers(
        0, 256, (args.batch, args.res, args.res, 3), dtype=np.uint8)))

    results = {}
    for k, fn in entries.items():
        t_c = time.perf_counter()
        _ = np.asarray(fn(img))  # compile + warm (fetch-fenced)
        compile_s = time.perf_counter() - t_c
        _ = np.asarray(fn(img))
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(img)
        _ = np.asarray(out)
        ms = (time.perf_counter() - t0) / args.steps * 1e3
        results[k] = ms
        print(f"prefix {k!s:>5}: {ms:8.3f} ms/batch   (compile+warm {compile_s:.1f}s)",
              flush=True)

    keys = list(results)
    print("\nsegment deltas (ms/batch):")
    prev = 0.0
    for i, k in enumerate(keys):
        label = _segment_label(keys, i, k, args.model)
        print(f"  {label:>22}: {results[k] - prev:8.3f}")
        prev = results[k]
    full = results.get("full")
    if full is not None:
        ips = args.batch / (full / 1e3)
        print(f"\nfull: {full:.3f} ms/batch -> {ips:,.0f} img/s "
              f"({'int8' if args.int8 else 'bf16'}, batch {args.batch})")
    print(json.dumps({"dtype": "int8" if args.int8 else "bf16",
                      "batch": args.batch, "ms": results,
                      "health": HEALTH}))


def _segment_label(keys, i, k, model="v1"):
    """Delta label for prefix k differenced against the PREVIOUS key. The
    first delta always includes the stem (prefixes are cumulative), so when
    the list doesn't start at 0 the label says so."""
    v3 = model in ("v3", "v3small")
    if k == 0:
        return "conv1+pre"
    if k == "cl":
        return "conv_last"
    if k == "pool":
        return "avgpool"
    if k == "full":
        prev = keys[i - 1] if i else None
        if prev == "pool":
            # V3 runs a post-pool head matmul before the fc (keras :345-356)
            return "head+fc" if v3 else "fc"
        if prev == "cl":
            return "pool+head+fc" if v3 else "pool+fc"
        return "head(pool/fc/softmax)"
    if i == 0:
        return f"pre+conv1+blocks[0:{k})"
    return f"blocks[{keys[i-1]}:{k})"


def compare(args, prefixes):
    """Interleaved bf16-vs-int8 per-prefix measurement (one process — the
    tunnel adds +-1 ms/batch BETWEEN processes, which swamps segment gaps)."""
    _, e_bf = build_entries(args, prefixes, int8=False)
    _, e_i8 = build_entries(args, prefixes, int8=True)

    rng = np.random.default_rng(0)
    img = jax.device_put(jnp.asarray(rng.integers(
        0, 256, (args.batch, args.res, args.res, 3), dtype=np.uint8)))

    pairs = [(k, d, fns[k]) for k in prefixes
             for d, fns in (("bf16", e_bf), ("int8", e_i8))]
    for k, d, fn in pairs:
        t0 = time.perf_counter()
        _ = np.asarray(fn(img))
        print(f"compile {d} prefix {k!s:>5}: {time.perf_counter()-t0:5.1f}s",
              flush=True)

    times = {(k, d): [] for k, d, _ in pairs}
    for r in range(args.rounds):
        for k, d, fn in pairs:
            _ = np.asarray(fn(img))
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fn(img)
            _ = np.asarray(out)
            times[(k, d)].append(
                (time.perf_counter() - t0) / args.steps * 1e3)

    med = {kd: float(np.median(ts)) for kd, ts in times.items()}
    print(f"\n{'segment':>22} | {'bf16':>8} | {'int8':>8} | {'gap':>7}")
    prev_bf = prev_i8 = 0.0
    for i, k in enumerate(prefixes):
        label = _segment_label(prefixes, i, k, args.model)
        d_bf = med[(k, "bf16")] - prev_bf
        d_i8 = med[(k, "int8")] - prev_i8
        print(f"{label:>22} | {d_bf:8.3f} | {d_i8:8.3f} | {d_i8-d_bf:+7.3f}")
        prev_bf, prev_i8 = med[(k, "bf16")], med[(k, "int8")]
    if "full" in prefixes:
        fb, fi = med[("full", "bf16")], med[("full", "int8")]
        print(f"\nfull: bf16 {fb:.3f} ms ({args.batch/fb*1e3:,.0f} img/s)  "
              f"int8 {fi:.3f} ms ({args.batch/fi*1e3:,.0f} img/s)  "
              f"gap {fi-fb:+.3f} ms")
    print(json.dumps({"batch": args.batch,
                      "ms": {f"{k}/{d}": v for (k, d), v in med.items()},
                      "health": HEALTH}))


if __name__ == "__main__":
    main()
