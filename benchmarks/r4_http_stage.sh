#!/bin/bash
# Round-4 chip pipeline stage 2: measure the pipelined DynamicBatcher on
# hardware (VERDICT r3 weak #5 / order #4). Compares:
#   * serve_http_bench at the same 32x8/25ms load that measured 391 img/s
#     on the round-3 SERIAL batcher (docs/RESULTS.md HTTP table), and
#   * serve_bench --batch 64 on the same artifact (the pipelined
#     ServingModel.stream number the batcher should now approach).
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[http-stage] waiting for pid $WAIT_PID (pipeline) to exit..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
ART=exports/r4_flag80
echo "[http-stage] === serve_bench batch 64 (stream target) ==="
timeout 1800 python benchmarks/serve_bench.py --artifact "$ART" --batch 64 \
  2>&1 | grep -viE "WARNING|xla_bridge" | tail -3 | tee docs/data/r4_serve_bench64.txt
echo "[http-stage] === serve_http_bench 32x8, 25ms (pipelined batcher) ==="
timeout 1800 python benchmarks/serve_http_bench.py --artifact "$ART" \
  --concurrency 32 --requests 10 --rows 8 --max_wait_ms 25 \
  2>&1 | grep -viE "WARNING|xla_bridge" | tail -3 | tee docs/data/r4_serve_http_32x8.txt
echo "[http-stage] === serve_http_bench 16x4, 10ms (light load) ==="
timeout 1800 python benchmarks/serve_http_bench.py --artifact "$ART" \
  --concurrency 16 --requests 10 --rows 4 --max_wait_ms 10 \
  2>&1 | grep -viE "WARNING|xla_bridge" | tail -3 | tee docs/data/r4_serve_http_16x4.txt
echo "[http-stage] done"
