#!/usr/bin/env python
"""Driver benchmark contract: ONE JSON line with the headline metric.

Metric (BASELINE.json:2): MobileNet-V1 1.0-224 images/sec/chip at batch 256,
with p50 single-image latency reported alongside. vs_baseline is measured
against the north-star target of 5,000 img/s/chip on v5e (BASELINE.json:5) —
the reference itself published no numbers (BASELINE.md).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    from mobilenet_tpu import ModelConfig
    from mobilenet_tpu.runtime.pipeline import InferencePipeline

    on_tpu = jax.default_backend() == "tpu"
    # bf16 activations/weights on the MXU is the TPU-native throughput config;
    # the fp32 verify path (bit-match gate) is exercised by tests/ and
    # `python -m mobilenet_tpu.cli verify`.
    cfg = ModelConfig(alpha=1.0, resolution=224, compute_dtype="bfloat16")
    batch = 256
    steps = 40 if on_tpu else 2

    # "auto" routing (measured fastest on v5e): fused dw+pw Pallas blocks at
    # throughput batches (13.9k vs 6.2k img/s all-XLA), XLA ops for the
    # batch-1 latency entry (0.66 ms vs 0.87 ms device time). CPU uses XLA.
    dw_backend = "auto" if on_tpu else "xla"
    pipe = InferencePipeline(cfg, seed=0, dw_backend=dw_backend)
    stats = pipe.benchmark(batch_size=batch, steps=steps)

    target = 5000.0
    result = {
        "metric": "mobilenet_v1_1.0_224_images_per_sec_per_chip_batch256",
        "value": round(stats["images_per_sec"], 1),
        "unit": "images/sec",
        "vs_baseline": round(stats["images_per_sec"] / target, 3),
        "e2e_images_per_sec_with_host_transfer": round(stats["e2e_images_per_sec"], 1),
        "p50_latency_ms": round(stats["p50_latency_ms"], 3),
        "p99_latency_ms": round(stats["p99_latency_ms"], 3),
        "backend": jax.default_backend(),
        "dtype": "bfloat16",
        "dw_backend": dw_backend,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
