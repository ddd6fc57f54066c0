#!/bin/bash
# On-chip campaign: int8 V2 attack session (2026-08-20).
#   1. head split — the 7.46 ms "B16+head" int8 segment (v2_attr_raw.log)
#      divided into b16 / conv_last / avgpool / fc via the new head-stage
#      prefixes (tools/prefix_attr.py "17,cl,pool").
#   2. e2e race of the new int8 fused expand-s2 route for b1/b3
#      (quant.v2.FUSED_EXPAND_S2_I8; exactness-gated in the tool).
# One process at a time holds the chip (CLAUDE.md); run this alone.
set -u
cd "$(dirname "$0")/.."
LOG=benchmarks/v2_i8_attack_raw.log
step() { echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"; }
run() { step "$*"; timeout 4000 "$@" 2>&1 | tee -a "$LOG" | tail -8; }

step "1. int8 head split (prefixes 13,16,17,cl,pool,full; fused routes incl. the new b1/b3 kernel)"
run python tools/prefix_attr.py --model v2 --int8 --prefixes 13,16,17,cl,pool,full

step "2. e2e race: int8 two_stage vs fused b1-only vs fused b1+b3 (exactness-gated)"
run python tools/ab_b1_fused.py --model v2 --int8

step "3. e2e race: bf16 two_stage vs fused_min vs fused_wide vs fused b1-only (the b3 padding-ripple question)"
run python tools/ab_b1_fused.py --model v2

step "campaign done — transcribe into benchmarks/roofline_v5e.md"
