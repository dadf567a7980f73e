#!/bin/bash
# Round-5 HTTP batcher A/B (VERDICT r4 order #4): settle whether the
# pipelined dispatcher beats serial-plus-overlap PER TRANSPORT REGIME,
# with a same-session paired design instead of the round-4
# this-session-vs-historical comparison.
#
#   usage: benchmarks/r5_http_ab.sh <artifact_dir> [out_prefix]
#
# Cells (each one serve_http_bench invocation, identical load 32x8):
#   * chip (ambient platform, high-RTT tunnel): depth 1 vs 4, ALTERNATED
#     d1,d4,d1,d4 so both depths sample the same ambient drift.
#   * localhost CPU lowering (low-RTT device): depth 1 vs 4 — the regime
#     where dispatch/encode overlap should actually win.
set -u
cd "$(dirname "$0")/.."
ART="${1:?artifact dir}"
OUT="${2:-docs/data/r5_http_ab}"
LOAD="--concurrency 32 --requests 10 --rows 8 --max_wait_ms 25 --format raw_b64"

run_cell() {  # run_cell <tag> <depth> <env...>
  local tag="$1" depth="$2"; shift 2
  echo "[r5_http_ab] cell $tag depth=$depth"
  env "$@" timeout 1200 python benchmarks/serve_http_bench.py \
    --artifact "$ART" $LOAD --pipeline_depth "$depth" \
    2>&1 | grep -viE "WARNING|xla_bridge" | tail -1 \
    | tee "${OUT}_${tag}.json"
}

# Chip regime, paired: two reps per depth, alternating.
run_cell chip_d1_r1 1
run_cell chip_d4_r1 4
run_cell chip_d1_r2 1
run_cell chip_d4_r2 4

# Low-RTT regime: same artifact through the CPU lowering on localhost.
run_cell cpu_d1 1 GEA_PLATFORM=cpu
run_cell cpu_d4 4 GEA_PLATFORM=cpu

echo "[r5_http_ab] done -> ${OUT}_*.json"
