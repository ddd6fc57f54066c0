"""Batch-1 race: does the systolic chain kernel win at batch 1?

At batch 256 the chain kernel measured a WASH (tools/ab_chain.py,
docs/design.md SS5): the per-block pipeline already overlaps the 14^2
stretch's HBM traffic fully. Batch 1 has a different cost structure — the
0.117 ms forward is dominated by per-kernel launch gaps, not bandwidth
(tools/latency_attr.py), and at batch 1 the chain collapses the 5-block
14^2 stretch into ONE launch (t_tiles=1: no pipelining to lose, 4 launches
saved, intermediates VMEM-only). This tool races the shipping batch-1
"mixed" routing against mixed+chain with RTT-cancelled differenced scan
chains (utils/timing.differenced_chain_ms — single chains overstate by
RTT/K, CLAUDE.md timing rules).

Usage: python tools/ab_chain_b1.py [--alpha 1.0] [--res 224] [--k 50]
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
    ap.add_argument("--k", type=int, default=50, help="short chain length")
    ap.add_argument("--rounds", type=int, default=3,
                    help="interleaved A/B rounds (medians reported)")
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.checkpoints.padding import needs_padding, pad_channels
    from mobilenet_tpu.models import mobilenet_v1
    from mobilenet_tpu.ops import pallas_chain_systolic as pcs
    from mobilenet_tpu.utils.timing import differenced_chain_ms

    # This tool's A/B is driven purely by CHAIN_SYSTOLIC_F; the shipping
    # batch-1 default (enabled from this tool's own measurement) must not
    # leak into the baseline arm.
    mobilenet_v1.CHAIN_AT_BATCH1 = False

    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    folded = pad_channels(folded) if needs_padding(folded) else folded
    params = to_device(folded, dtype=jnp.bfloat16)

    def make_chain(length, chain_flag):
        def fn(x):
            pcs.CHAIN_SYSTOLIC_F = chain_flag  # resolved at trace time
            def body(carry, _):
                probs = mobilenet_v1.predict_probs(params, carry, cfg,
                                                   dw_backend="auto")
                nxt = carry * (1.0 + 1e-6 * jnp.sum(probs).astype(carry.dtype))
                return nxt, jnp.argmax(probs)
            return jax.lax.scan(body, x, None, length=length)
        return jax.jit(fn)

    x = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, args.res, args.res, 3)), jnp.bfloat16)

    # numerics gate first: the reformulated path must agree before timing
    pcs.CHAIN_SYSTOLIC_F = False
    base = np.asarray(jax.jit(lambda x: mobilenet_v1.predict_probs(
        params, x, cfg, dw_backend="auto"))(x), np.float32)
    pcs.CHAIN_SYSTOLIC_F = True
    alt = np.asarray(jax.jit(lambda x: mobilenet_v1.predict_probs(
        params, x, cfg, dw_backend="auto"))(x), np.float32)
    pcs.CHAIN_SYSTOLIC_F = False
    agree = bool(np.argmax(base) == np.argmax(alt))
    print(f"top-1 agree={agree} max_abs_prob_diff={np.abs(base - alt).max():.2e}",
          flush=True)

    results = {"mixed": [], "mixed+chain": []}
    for r in range(args.rounds):  # interleaved: tunnel drift hits both arms
        for name, flag in (("mixed", False), ("mixed+chain", True)):
            ms = differenced_chain_ms(
                lambda length, f=flag: make_chain(length, f), x, args.k)
            results[name].append(ms)
            print(f"round {r} {name:12s}: {ms:.4f} ms", flush=True)
    meds = {k: float(np.median(v)) for k, v in results.items()}
    print(f"medians: {meds}  "
          f"delta={meds['mixed'] - meds['mixed+chain']:+.4f} ms "
          f"(positive = chain wins)", flush=True)


if __name__ == "__main__":
    main()
