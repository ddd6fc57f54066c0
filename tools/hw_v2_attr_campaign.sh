#!/bin/bash
# On-chip campaign: fresh contract record + the FIRST per-block attribution
# of MobileNet-V2 (bf16 + int8) — run when the TPU tunnel is reachable
# (gate with tools/tunnel_wait.sh). V2 is the one family with no committed
# segment map: 1.0-224 batch-256 bf16 measures ~22 ms/batch vs a 2.30 ms
# analytic floor (tools/roofline.py --model v2), and no evidence says which
# blocks hold the gap. Raw output accumulates in
# benchmarks/v2_attr_raw.log for transcription into roofline_v5e.md.
#
# One process at a time holds the chip (CLAUDE.md); run this alone.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/v2_attr_raw.log
step() { echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"; }
run() { step "$*"; timeout 4000 "$@" 2>&1 | tee -a "$LOG" | tail -6; }

step "0. contract benchmark fresh (updates BENCH evidence; copy the JSON line into benchmarks/bench_contract_v5e.json with fresh recorded date)"
run python bench.py

step "1. V2 bf16 per-block attribution (prefix-differenced, shipping fused routes)"
run python tools/prefix_attr.py --model v2 --prefixes 0,1,2,3,4,6,7,10,13,16,full

step "2. V2 int8 per-block attribution (fused int8 routes; b13 is the XLA fallback)"
run python tools/prefix_attr.py --model v2 --int8 --prefixes 0,1,2,3,4,6,7,10,13,16,full

step "3. contract-row regression guard (V1 + families flagship rows)"
run python tools/regress.py
run python tools/regress.py --model v2
run python tools/regress.py --model v3

step "campaign done — transcribe the V2 segment map into benchmarks/roofline_v5e.md; attack the top segment"
