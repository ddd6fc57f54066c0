"""Batch-1 device-latency attribution by prefix-differenced scan chains.

Where do the ~0.65 ms of single-image latency go? The dispatch-loop method
(tools/prefix_attr.py) is fence-noise-bound at batch 1 (a 0.1 ms prefix x20
steps is 2 ms of signal under a ~30 ms fence RTT), so each prefix here runs
as a chain of K data-dependent forwards inside ONE jit (the
tools/latency_probe.py method): per-chain overhead divides by K and the
fence cancels in the prefix differences.

  python tools/latency_attr.py --prefixes 0,1,2,6,13,full --k 200
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--k", type=int, default=200, help="chain length")
    ap.add_argument("--dw-backend", default="xla",
                    help="routing for the batch-1 entry (xla is the measured default)")
    ap.add_argument("--prefixes", default="0,1,2,6,13,full",
                    help="comma list: number of blocks to run, or 'full' "
                         "(full = all blocks + head)")
    args = ap.parse_args()

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.checkpoints import fold_bn, init_params, to_device
    from mobilenet_tpu.models import mobilenet_v1 as m

    cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                      compute_dtype="bfloat16")
    folded = fold_bn(init_params(cfg, seed=0), eps=cfg.bn_eps)
    params = to_device(folded, dtype=jnp.bfloat16)
    K = args.k

    def prefix_fn(x, nb):
        """conv1 + blocks[0:nb] (or the full network + head for 'full')."""
        if nb == "full":
            return jnp.sum(m.predict_probs(params, x, cfg,
                                           dw_backend=args.dw_backend))
        y = m.forward(params, x, cfg, dw_backend=args.dw_backend,
                      num_blocks=nb)
        return jnp.sum(y.astype(jnp.float32))

    results = {}
    for tok in args.prefixes.split(","):
        nb = tok if tok == "full" else int(tok)

        def chain(x, nb=nb):
            def body(carry, _):
                s = prefix_fn(carry, nb)
                nxt = carry * (1.0 + 1e-6 * s.astype(carry.dtype))
                return nxt, s
            return jax.lax.scan(body, x, None, length=K)

        fn = jax.jit(chain)
        x = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (1, cfg.resolution, cfg.resolution, 3)), jnp.bfloat16)
        t0 = time.perf_counter()
        _ = np.asarray(fn(x)[1])  # compile + warm, fetch-fenced
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(fn(x)[1])
            best = min(best, time.perf_counter() - t0)
        ms = best / K * 1e3
        results[str(nb)] = ms
        print(f"prefix {tok:>5}: {ms:7.4f} ms/forward  (compile {compile_s:.1f}s)",
              flush=True)

    keys = list(results)
    print(f"\n(absolute prefix numbers include the fence RTT / {K} "
          "(~0.14 ms at K=200 here); the DELTAS below are RTT-free — "
          "use tools/latency_probe.py for RTT-cancelled absolutes)")
    print("segment deltas (ms):")
    for a, b in zip(keys, keys[1:]):
        print(f"  {a:>5} -> {b:>5}: {results[b] - results[a]:+7.4f}")


if __name__ == "__main__":
    main()
