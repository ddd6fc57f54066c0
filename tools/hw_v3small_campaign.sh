#!/bin/bash
# On-chip campaign: the FIRST per-block attribution of MobileNet-V3-Small
# (bf16 + int8) — run when the TPU tunnel is reachable (gate with
# tools/tunnel_wait.sh). Small is the one family member with no committed
# segment map: 1.0-224 batch-256 bf16 measures ~8.2 ms/batch (31k img/s)
# vs a sub-1-ms analytic floor (tools/roofline.py --model v3small), and no
# evidence says which of the 11 bottlenecks holds the gap. Small's shipped
# routes: e-padded eo fused expand-s2 at b1, lane-packed b0, whole-image
# v3 kernels elsewhere, fused head. Raw output accumulates in
# benchmarks/v3small_attr_raw.log for transcription into roofline_v5e.md.
#
# One process at a time holds the chip (CLAUDE.md); run this alone.
set -u
cd "$(dirname "$0")/.."
# Fail fast if the tunnel hangs (>220 s init, session-5 note) instead of
# burning each step's 4000 s timeout.
tools/tunnel_wait.sh 300 60 || { echo "tunnel down — aborting campaign"; exit 1; }
LOG=benchmarks/v3small_attr_raw.log
step() { echo "=== $(date -u +%H:%M:%S) $* ===" | tee -a "$LOG"; }
run() { step "$*"; timeout 4000 "$@" 2>&1 | tee -a "$LOG" | tail -6; }

step "0. contract benchmark fresh (keeps bench_contract_v5e.json current)"
run python bench.py

step "1. V3-Small bf16 per-block attribution (shipping fused routes; 11 blocks + cl/pool head split)"
run python tools/prefix_attr.py --model v3small --prefixes 0,1,2,3,5,8,11,cl,pool,full

step "2. V3-Small int8 per-block attribution (stage prefixes unsupported for v3 int8 — block indices only)"
run python tools/prefix_attr.py --model v3small --int8 --prefixes 0,1,2,3,5,8,11,full

step "3. paired bf16-vs-int8 gap per segment (one process, interleaved)"
run python tools/prefix_attr.py --model v3small --compare --prefixes 0,1,3,5,8,11,full

step "4. contract-row regression guard"
run python tools/regress.py
run python tools/regress.py --model v3small

step "campaign done — transcribe the Small segment map into benchmarks/roofline_v5e.md; attack the top segment with the existing knobs (PACKED_SE per-block, expand-s2 tiles, chain ranges) before building anything new"
