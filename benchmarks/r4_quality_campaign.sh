#!/bin/bash
# Round-4 quality-science campaign on the diverse 20k dataset
# (VERDICT r3 missing #3 / next-round #2 and #8):
#   * WGAN-GP vs BCE at 3 seeds x 2 configs (64x64 G-LIS-2, 80x80 G-LIS-3)
#   * second-opinion scoring (proxy-FID, proxy-FID-b, KID, precision/recall)
#     of every run's pinned best snapshot
# Runs sequentially on the single tunneled chip. Each trainer invocation is
# bounded; a wedged relay fails fast via the shared device watchdog.
set -u
cd "$(dirname "$0")/.."
DATA=data/demo20k
OUT=docs/data
mkdir -p "$OUT"

run_one () {  # run_one <tag> <objective> <seed> <image_size> <code> <lis>
  local tag=$1 obj=$2 seed=$3 img=$4 code=$5 lis=$6
  local dir="runs/r4_${tag}_${obj}_s${seed}"
  # Completion marker (touched after scoring) — best.json alone is not
  # enough: a run interrupted mid-training already has one.
  if [ -f "$dir/.campaign_done" ]; then echo "[campaign] $dir done, skip"; return; fi
  rm -rf "$dir"
  echo "[campaign] === $dir ==="
  timeout 3000 python -m gea.cli.train_glis \
    --dataset folder --dataroot "$DATA" --crop_size 160 \
    --image_size "$img" --code_size "$code" --norm weight \
    --r_iterations "$lis" --batch_size 128 --niter 3000 \
    --gan_loss "$obj" --seed "$seed" \
    --data_cache true --host_resize true \
    --fid_interval 300 --vis_interval 3000 --save_interval 3000 \
    --log_interval 500 --save_path "$dir" \
    2>&1 | grep -viE "WARNING|xla_bridge" | tail -4
  timeout 1200 python -m gea.cli.compute_fid \
    --load_path "$dir" --dataset folder --dataroot "$DATA" \
    --num_samples 1024 --batch_size 128 --step -1 --second_opinion \
    --out "$OUT/r4_so_${tag}_${obj}_s${seed}.json" \
    2>&1 | grep -viE "WARNING|xla_bridge" | tail -3
  [ -f "$OUT/r4_so_${tag}_${obj}_s${seed}.json" ] && touch "$dir/.campaign_done"
}

for seed in 1 2 3; do
  for obj in bce wgan-gp; do
    run_one c64 "$obj" "$seed" 64 128 2
  done
done
for seed in 1 2 3; do
  for obj in bce wgan-gp; do
    run_one c80 "$obj" "$seed" 80 256 3
  done
done
echo "[campaign] done"
