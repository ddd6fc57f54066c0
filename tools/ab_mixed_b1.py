"""Batch-1 MIXED per-block routing race for the V2/V3 families.

V1's batch-1 "auto" ships a measured MIXED tuple (XLA for the two 112-sq
blocks whose packed kernels lose their grid pipelining at one whole-image
tile, fused Pallas from block 2 on): 0.117 ms vs all-xla 0.135 / all-fused
0.166 (BASELINE.md). The V2/V3 batch-1 crossovers were only ever raced
all-xla vs all-fused (xla won: 0.176 / 0.164 ms) — the per-block mixed
middle ground this tool races was never measured. Same method as
tools/latency_probe.py: data-dependent scan chains of K and 4K forwards,
DIFFERENCED so the tunnel fence RTT cancels exactly.

An extra V3 arm races the chain megakernel at batch 1 on top of the best
mixed tuple (V1's CHAIN_AT_BATCH1 won 9/11 interleaved rounds at batch 1
— one launch replaces five in the launch-gap-dominated regime — while the
batch-256 chain race LOST; the V3 chain was only ever raced at 256).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def candidates(model: str, n: int):
    """Routing-tuple candidates keyed by label. Block index -> resolution
    tier: the first two blocks of every family run at 112-sq (the regime
    where V1's packed kernels lose batch-1 pipelining), the last 2-3 at
    7-sq (launch-gap dominated)."""
    f, x = "fused", "xla"
    cand = {
        "all_xla": (x,) * n,
        "all_fused": (f,) * n,
        "mix2": (x, x) + (f,) * (n - 2),
        "mix4": (x, x, x, x) + (f,) * (n - 4),
    }
    if model == "v2":
        # tail 7-sq blocks: b14..b16
        cand["mix2_tail"] = (x, x) + (f,) * (n - 5) + (x,) * 3
    elif model == "v3":
        # tail 7-sq blocks: b13, b14
        cand["mix2_tail"] = (x, x) + (f,) * (n - 4) + (x,) * 2
    else:  # v3small: b0 at 56-sq already (stem s2 from 224 -> 112 -> b0 s2)
        cand["mix1"] = (x,) + (f,) * (n - 1)
    return cand


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="v3", choices=["v2", "v3", "v3small"])
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--k", type=int, default=50)
    ap.add_argument("--rounds", type=int, default=3,
                    help="interleaved measurement rounds per candidate")
    ap.add_argument("--chain", action="store_true",
                    help="add a V3 chain-megakernel arm on the mixed tuples")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU smoke (interpret tier): numerics gate only")
    ap.add_argument("--arms", default=None,
                    help="comma list restricting the raced arms")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mobilenet_tpu.ops import preprocess as prep  # noqa: F401
    from mobilenet_tpu.utils.timing import differenced_chain_ms

    if args.model == "v2":
        from mobilenet_tpu.checkpoints.padding import pad_block0_v2
        from mobilenet_tpu.checkpoints.v2 import fold_bn_v2, init_params_v2
        from mobilenet_tpu.models import mobilenet_v2 as mod
        from mobilenet_tpu.models.mobilenet_v2 import (V2Config,
                                                       predict_probs_v2)

        cfg = V2Config(alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        folded = pad_block0_v2(
            fold_bn_v2(init_params_v2(cfg, seed=0), eps=cfg.bn_eps))
        predict = predict_probs_v2
    else:
        from mobilenet_tpu.checkpoints.v3 import fold_bn_v3, init_params_v3
        from mobilenet_tpu.models import mobilenet_v3 as mod
        from mobilenet_tpu.models.mobilenet_v3 import (V3Config,
                                                       predict_probs_v3)

        cfg = V3Config(variant="large" if args.model == "v3" else "small",
                       alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
        folded = fold_bn_v3(init_params_v3(cfg, seed=0), eps=cfg.bn_eps)
        predict = predict_probs_v3

    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded)
    n = len(cfg.block_defs)
    cand = candidates(args.model, n)

    def make_chain_factory(routing, chain_knob=False):
        def make(length):
            def chain(x):
                def body(carry, _):
                    # Both per-variant knobs toggle (CHAIN is variant-keyed
                    # since 2026-08-20); the non-chain arms force OFF so
                    # the baselines are chain-free regardless of the
                    # shipping defaults — review finding round 4.
                    has = hasattr(mod, "CHAIN_V3")
                    old = ((mod.CHAIN_V3, mod.CHAIN_V3_SMALL)
                           if has else None)
                    if has:
                        mod.CHAIN_V3 = mod.CHAIN_V3_SMALL = chain_knob
                    try:
                        probs = predict(params, carry, cfg,
                                        dw_backend=routing)
                    finally:
                        if has:
                            mod.CHAIN_V3, mod.CHAIN_V3_SMALL = old
                    nxt = carry * (1.0 + 1e-6 * jnp.sum(probs).astype(
                        carry.dtype))
                    return nxt, jnp.argmax(probs)
                return jax.lax.scan(body, x, None, length=length)
            return jax.jit(chain)
        return make

    arms = {name: make_chain_factory(r) for name, r in cand.items()}
    if args.chain and args.model in ("v3", "v3small"):
        arms["mix2_chain"] = make_chain_factory(cand["mix2"],
                                                chain_knob=True)
        arms["fused_chain"] = make_chain_factory(cand["all_fused"],
                                                 chain_knob=True)

    if args.arms:
        keep = set(args.arms.split(","))
        unknown = keep - set(arms)
        assert not unknown, f"unknown arms: {unknown} (have {set(arms)})"
        arms = {k: v for k, v in arms.items() if k in keep}

    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, args.res, args.res, 3)), jnp.bfloat16)

    # Numerics pre-gate: every arm's top-1 on the probe image must agree
    # with all_xla (they compose the same two gated routes).
    cls = {}
    for name, make in arms.items():
        cls[name] = int(np.asarray(make(1)(x)[1])[0])
    ref = cls["all_xla"]
    for name, c in cls.items():
        flag = "" if c == ref else "  <-- TOP-1 MISMATCH vs all_xla"
        print(f"top1[{name}] = {c}{flag}", flush=True)

    results = {name: [] for name in arms}
    for r in range(args.rounds):
        for name, make in arms.items():
            # One retry on transient tunnel faults (remote_compile resets);
            # a second failure records NaN and moves on.
            try:
                ms = differenced_chain_ms(make, x, args.k)
            except Exception as e:  # noqa: BLE001 — tunnel transport layer
                print(f"round {r}: {name} transient: {e}", flush=True)
                try:
                    ms = differenced_chain_ms(make, x, args.k)
                except Exception as e2:  # noqa: BLE001
                    print(f"round {r}: {name} failed twice: {e2}",
                          flush=True)
                    ms = float("nan")
            results[name].append(ms)
            print(f"round {r}: {name:12s} {ms:.4f} ms", flush=True)

    print()
    med = {name: float(np.nanmedian(v)) for name, v in results.items()}
    for name, m in sorted(med.items(), key=lambda kv: kv[1]):
        print(f"{name:12s} median {m:.4f} ms  runs "
              f"{[f'{v:.4f}' for v in results[name]]}", flush=True)


if __name__ == "__main__":
    main()
