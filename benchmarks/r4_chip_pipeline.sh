#!/bin/bash
# Round-4 chip pipeline: runs after the quality campaign releases the TPU.
#   1. benchmarks/r_probe.py — step-only img/s + MFU for the R trainers
#      (VERDICT r3 missing #4 / order #7).
#   2. The 256x256 re-run on the diverse 10k/320px dataset (order #2 tail:
#      does the mode collapse survive the removal of the data excuse?).
#      Same recipe as the round-3 Run A (batch 128, lr 2e-4, 4000 steps,
#      --remat --host_resize --data_cache, crop 288 -> 256).
#   3. Per-stage + second-opinion scoring of the 256 run's pinned best.
set -u
cd "$(dirname "$0")/.."
WAIT_PID="${1:-}"
if [ -n "$WAIT_PID" ]; then
  echo "[pipeline] waiting for pid $WAIT_PID (campaign) to exit..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "[pipeline] campaign done"
fi

echo "[pipeline] === r_probe ==="
timeout 1800 python benchmarks/r_probe.py --batch 256 --steps 20 --reps 5 \
  2>&1 | grep -viE "WARNING|xla_bridge" | tee docs/data/r4_r_probe.txt

DIR=runs/r4_res256
if [ ! -f "$DIR/.done" ]; then
  echo "[pipeline] === 256x256 re-run ==="
  rm -rf "$DIR"
  timeout 7200 python -m gea.cli.train_glis \
    --dataset folder --dataroot data/demo10k_320 --crop_size 288 \
    --image_size 256 --code_size 256 --r_iterations 3 \
    --num_features 64 --max_features 512 --batch_size 128 --lr 2e-4 \
    --niter 4000 --remat --host_resize true --data_cache true \
    --fid_interval 250 --vis_interval 1000 --save_interval 2000 \
    --log_interval 200 --seed 42 --save_path "$DIR" \
    2>&1 | grep -viE "WARNING|xla_bridge" | tail -30
  touch "$DIR/.done"
fi

echo "[pipeline] === 256 eval ==="
timeout 2400 python -m gea.cli.eval_stages --load_path "$DIR" \
  --num_samples 512 --batch_size 64 --step -1 \
  --out docs/data/r4_stages_res256.json \
  2>&1 | grep -viE "WARNING|xla_bridge" | tail -2
timeout 2400 python -m gea.cli.compute_fid --load_path "$DIR" \
  --dataset folder --dataroot data/demo10k_320 --num_samples 512 \
  --batch_size 64 --step -1 --second_opinion \
  --out docs/data/r4_so_res256_best.json \
  2>&1 | grep -viE "WARNING|xla_bridge" | tail -2
echo "[pipeline] done"
