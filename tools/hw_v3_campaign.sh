#!/bin/bash
# On-chip validation + measurement campaign for the V3 family additions
# (fused bottleneck kernel, int8 scheme) — run when the TPU is reachable.
# Each step is bounded; raw output accumulates in benchmarks/v3_campaign_raw.log
# for transcription into benchmarks/hw_gates_v5e.md / v3_v5e.md.
#
# ORDER MATTERS: the kernel smoke runs FIRST (validates the new Pallas
# geometry on Mosaic before any routed model entry compiles it at scale).
# One process at a time holds the chip (CLAUDE.md); run this alone.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/v3_campaign_raw.log
step() { echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"; }
run() { step "$*"; timeout 3000 "$@" 2>&1 | tee -a "$LOG" | tail -5; }

step "1. fused V3 kernel smoke (Mosaic validation of k5/SE/rows geometry)"
run python tools/tpu_smoke.py --only v3_block

step "2. int8 V3 EXACT gate on chip (XLA route; flagship V3-Large 224)"
run python -m mobilenet_tpu.cli verify --model v3 --alpha 1.0 --res 224 --int8 --batch 1

step "3. routing equivalence at the flagship: fused vs xla logits (bf16)"
run python -m mobilenet_tpu.cli verify --model v3 --alpha 1.0 --res 224 --routing fused --dtype bfloat16 --batch 4

step "4. end-to-end eval gates (bf16 + int8), n=64"
run python -m mobilenet_tpu.cli eval --model v3 --res 224 --dtype bfloat16 --n 64 --batch 32
run python -m mobilenet_tpu.cli eval --model v3 --res 224 --int8 --n 64 --batch 32

step "5. throughput race xla vs fused at batch 256 (V3-Large 224)"
run python -m mobilenet_tpu.cli autotune --model v3 --res 224 --batch 256 --steps 10

step "6. batch-1 latency race (differenced chains)"
run python -m mobilenet_tpu.cli autotune --model v3 --res 224 --batch 1

step "7. int8 throughput + V3-Small rows"
run python -m mobilenet_tpu.cli bench --model v3 --res 224 --int8 --batch 256 --steps 10
run python -m mobilenet_tpu.cli autotune --model v3small --res 224 --batch 256 --steps 10

step "8. fused INT8 kernels: Mosaic exactness smokes + route races"
run python tools/tpu_smoke.py --only ir_i8
run python tools/tpu_smoke.py --only ir_v3_i8
run python -m mobilenet_tpu.cli autotune --model v2 --res 224 --int8 --batch 256 --steps 10
run python -m mobilenet_tpu.cli autotune --model v3 --res 224 --int8 --batch 256 --steps 10

step "campaign done — transcribe into benchmarks/ and update BASELINE.md"
