#!/bin/bash
# Round-5 chip pipeline — serializes every hardware job VERDICT r4 ordered
# onto the single tunneled v5e chip, with per-stage done markers so a
# timeout or session cut resumes at the right stage (trainers auto-resume
# from their save_path checkpoints).
#
#   S0  fused-seed Pallas A/B                      (order #7)
#   S1  diversity convergence run: 30k-step 80x80 flagship, wgan-gp +
#       cosine decay on demo20k, scored best+last with --repeats 3
#       (orders #2a and the c80 eval-noise draw for #6)
#   S3  256x256 diverse re-run to the FULL 4000-step budget + eval
#       (order #1 — the dangling round-4 deliverable; r4 recipe verbatim)
#   S4  fresh 10k-step bce flagship (seed 7) as the R-separate frozen G
#   S5  R-separate re-base on diverse: corrected (adv 0.3 + mine 0.5) vs
#       MSE-only R, scored plain / d_filter / corrected 0.3 / 1.0 on the
#       frozen mid-training (step 6000) G              (order #3a)
#   S6  R-iterative re-base: lambda_r in {0.1, 0.9, 5.0} on demo20k,
#       per-link eval_chain with extrapolation probe   (order #3b)
#   S2  capacity/batch probe: nf 96 + batch 256 wgan-gp 10k steps
#       (order #2b; ordered late — droppable if wall-clock runs out)
#   S7  eval-noise floors -> campaign report with CIs  (order #6)
#   S8  export S1 best + same-session HTTP A/B         (order #4)
#
# Ops notes from the first launch of this script: (a) markers must see
# the TRAINER's exit status, so `run` does its own tail and the `&&
# touch` chains on the function's return (the first version piped the
# call through `tail`, which made every stage "succeed" — including one
# killed mid-wedge); (b) the tunneled chip can wedge a client mid-
# compile with the watchdog already passed (CPU time frozen, futex
# wait) — the remedy is kill-by-pid + retry, so every trainer stage
# retries once and relies on checkpoint auto-resume.
set -u
cd "$(dirname "$0")/.."
OUT=docs/data
DATA=data/demo20k
mkdir -p "$OUT" runs exports
echo $$ > runs/r5_pipeline.pid

run () {  # run <timeout_s> <tail_n> <cmd...> — returns the cmd's status
  local t=$1 n=$2; shift 2
  timeout "$t" "$@" 2>&1 | grep -viE "WARNING|xla_bridge" | tail -n "$n"
  return "${PIPESTATUS[0]}"
}
train () {  # train <timeout_s> <tail_n> <cmd...> — one wedge retry
  run "$@" && return 0
  echo "[r5] trainer stage failed once (wedge?) — retrying with resume"
  run "$@"
}
stage () { echo; echo "[r5 $(date +%H:%M:%S)] === $* ==="; }

# Shared data/flag tail for the 80x80-family trainers.
COMMON80="--dataset folder --dataroot $DATA --crop_size 160 --norm weight
  --data_cache true --host_resize true --steps_per_dispatch 16"

# ---------- S0: fused-seed A/B (order #7) ----------
if [ ! -f runs/.r5_s0_done ]; then
  stage "S0 fused-seed Pallas A/B"
  {
    run 1500 999 python benchmarks/ab_step.py --b fused_seed --forward_only \
      --pairs 8 --steps 20 --batch 256 --image_size 80
    run 1500 999 python benchmarks/ab_step.py --b fused_seed \
      --pairs 6 --steps 20 --batch 256 --image_size 80
  } | tee "$OUT/r5_fused_seed.txt"
  touch runs/.r5_s0_done
fi

# ---------- S1: diversity convergence run (order #2a) ----------
if [ ! -f runs/.r5_s1_done ]; then
  stage "S1 diversity 30k-step wgan-gp + cosine flagship"
  train 10800 40 python -m gea.cli.train_glis $COMMON80 \
    --image_size 80 --code_size 256 --r_iterations 3 --batch_size 128 \
    --niter 30000 --gan_loss wgan-gp --lr_schedule cosine --lr_final 0.1 \
    --seed 42 --fid_interval 1000 --fid_samples 1024 --vis_interval 5000 \
    --save_interval 2500 --log_interval 1000 --save_path runs/r5_div30k \
    && touch runs/.r5_s1_done
fi
if [ -f runs/.r5_s1_done ] && [ ! -f runs/.r5_s1e_done ]; then
  stage "S1 eval (best w/ 3 independent draws, last, stages)"
  run 3600 3 python -m gea.cli.compute_fid --load_path runs/r5_div30k \
    --dataset folder --dataroot $DATA --num_samples 1024 --batch_size 128 \
    --step -1 --second_opinion --repeats 3 \
    --out "$OUT/r5_so_div30k_best.json"
  run 2400 3 python -m gea.cli.compute_fid --load_path runs/r5_div30k \
    --dataset folder --dataroot $DATA --num_samples 1024 --batch_size 128 \
    --step 0 --second_opinion --out "$OUT/r5_so_div30k_last.json"
  run 2400 2 python -m gea.cli.eval_stages --load_path runs/r5_div30k \
    --num_samples 1024 --batch_size 128 --step -1 \
    --out "$OUT/r5_stages_div30k.json"
  [ -f "$OUT/r5_so_div30k_best.json" ] && touch runs/.r5_s1e_done
fi

# ---------- S3: 256x256 to the full budget (order #1) ----------
if [ ! -f runs/.r5_s3_done ]; then
  stage "S3 256x256 diverse re-run (4000 steps, r4 recipe)"
  train 9000 30 python -m gea.cli.train_glis \
    --dataset folder --dataroot data/demo10k_320 --crop_size 288 \
    --image_size 256 --code_size 256 --r_iterations 3 \
    --num_features 64 --max_features 512 --batch_size 128 --lr 2e-4 \
    --niter 4000 --remat --host_resize true --data_cache true \
    --fid_interval 250 --fid_samples 1024 --vis_interval 1000 \
    --save_interval 1000 --log_interval 200 --seed 42 \
    --save_path runs/r5_res256 \
    && touch runs/.r5_s3_done
fi
if [ -f runs/.r5_s3_done ] && [ ! -f runs/.r5_s3e_done ]; then
  stage "S3 eval"
  run 2400 2 python -m gea.cli.eval_stages --load_path runs/r5_res256 \
    --num_samples 512 --batch_size 64 --step -1 \
    --out "$OUT/r5_stages_res256.json"
  run 2400 3 python -m gea.cli.compute_fid --load_path runs/r5_res256 \
    --dataset folder --dataroot data/demo10k_320 --num_samples 512 \
    --batch_size 64 --step -1 --second_opinion \
    --out "$OUT/r5_so_res256_best.json"
  run 2400 3 python -m gea.cli.compute_fid --load_path runs/r5_res256 \
    --dataset folder --dataroot data/demo10k_320 --num_samples 512 \
    --batch_size 64 --step 0 --second_opinion \
    --out "$OUT/r5_so_res256_last.json"
  [ -f "$OUT/r5_so_res256_best.json" ] && touch runs/.r5_s3e_done
fi

# ---------- S4: frozen-G host run for the R-separate re-base ----------
if [ ! -f runs/.r5_s4_done ]; then
  stage "S4 10k-step bce flagship (R-separate frozen G, seed 7)"
  train 5400 20 python -m gea.cli.train_glis $COMMON80 \
    --image_size 80 --code_size 256 --r_iterations 3 --batch_size 128 \
    --niter 10000 --gan_loss bce --seed 7 \
    --fid_interval 1000 --fid_samples 1024 --vis_interval 5000 \
    --save_interval 2000 --log_interval 1000 --save_path runs/r5_rbase \
    && touch runs/.r5_s4_done
fi

# ---------- S5: R-separate re-base (order #3a) ----------
if [ -f runs/.r5_s4_done ] && [ ! -f runs/.r5_s5_done ]; then
  stage "S5a R-separate corrected (adv 0.3 + mine 0.5) vs MSE-only"
  train 3600 8 python -m gea.cli.train_r_separate $COMMON80 \
    --g_path runs/r5_rbase --g_step 6000 \
    --image_size 80 --code_size 256 --r_iterations 3 --batch_size 128 \
    --niter 3000 --r_adv_weight 0.3 --r_mine_weight 0.5 --seed 42 \
    --fid_interval 500 --fid_samples 1024 --save_interval 1500 \
    --vis_interval 3000 --log_interval 500 --save_path runs/r5_rsep_corr
  train 3600 8 python -m gea.cli.train_r_separate $COMMON80 \
    --g_path runs/r5_rbase --g_step 6000 \
    --image_size 80 --code_size 256 --r_iterations 3 --batch_size 128 \
    --niter 3000 --r_adv_weight 0 --r_mine_weight 0 --seed 42 \
    --fid_interval 500 --fid_samples 1024 --save_interval 1500 \
    --vis_interval 3000 --log_interval 500 --save_path runs/r5_rsep_mse
  stage "S5b scoring on the frozen step-6000 G (1,024 samples each)"
  FIDC="python -m gea.cli.compute_fid --load_path runs/r5_rbase --step 6000
    --dataset folder --dataroot $DATA --num_samples 1024 --batch_size 128
    --second_opinion"
  run 2400 2 $FIDC --out "$OUT/r5_so_rplain6k.json"
  run 2400 2 $FIDC --d_filter --oversample 4 \
    --out "$OUT/r5_so_rdfilter6k.json"
  run 2400 2 $FIDC --r_path runs/r5_rsep_corr --r_step -1 \
    --correction_strength 0.3 --out "$OUT/r5_so_rcorr03.json"
  run 2400 2 $FIDC --r_path runs/r5_rsep_corr --r_step -1 \
    --correction_strength 1.0 --out "$OUT/r5_so_rcorr10.json"
  run 2400 2 $FIDC --r_path runs/r5_rsep_mse --r_step -1 \
    --correction_strength 0.3 --out "$OUT/r5_so_rmse03.json"
  [ -f "$OUT/r5_so_rcorr03.json" ] && touch runs/.r5_s5_done
fi

# ---------- S6: R-iterative re-base (order #3b) ----------
if [ ! -f runs/.r5_s6_done ]; then
  for L in 0.1 0.9 5.0; do
    stage "S6 R-iterative lambda_r=$L on demo20k"
    train 3600 6 python -m gea.cli.train_r_iterative $COMMON80 \
      --image_size 64 --code_size 128 --r_iterations 2 --batch_size 64 \
      --niter 3000 --lambda_r "$L" --r_chain_length 2 --seed 42 \
      --fid_interval 0 --vis_interval 3000 --save_interval 3000 \
      --log_interval 500 --save_path "runs/r5_riter_l$L"
    run 2400 2 python -m gea.cli.eval_chain --load_path "runs/r5_riter_l$L" \
      --num_samples 1024 --chain_length 3 --second_opinion \
      --out "$OUT/r5_evalchain_l$L.json"
  done
  [ -f "$OUT/r5_evalchain_l5.0.json" ] && touch runs/.r5_s6_done
fi

# ---------- S2: capacity/batch probe (order #2b) ----------
if [ ! -f runs/.r5_s2_done ]; then
  stage "S2 capacity probe: nf 96 + batch 256, wgan-gp cosine, 10k steps"
  train 7200 20 python -m gea.cli.train_glis $COMMON80 \
    --image_size 80 --code_size 256 --r_iterations 3 \
    --num_features 96 --batch_size 256 \
    --niter 10000 --gan_loss wgan-gp --lr_schedule cosine --lr_final 0.1 \
    --seed 42 --fid_interval 1000 --fid_samples 1024 --vis_interval 5000 \
    --save_interval 2500 --log_interval 1000 --save_path runs/r5_cap96
  run 2400 3 python -m gea.cli.compute_fid --load_path runs/r5_cap96 \
    --dataset folder --dataroot $DATA --num_samples 1024 --batch_size 128 \
    --step -1 --second_opinion --out "$OUT/r5_so_cap96_best.json"
  [ -f "$OUT/r5_so_cap96_best.json" ] && touch runs/.r5_s2_done
fi

# ---------- S7: eval-noise floors -> campaign report CIs (order #6) ----------
if [ -f runs/.r5_s4_done ] && [ ! -f runs/.r5_s7_done ]; then
  stage "S7 second noise draw (c80 bce) + campaign report with CIs"
  run 3600 3 python -m gea.cli.compute_fid --load_path runs/r5_rbase \
    --dataset folder --dataroot $DATA --num_samples 1024 --batch_size 128 \
    --step -1 --second_opinion --repeats 3 \
    --out "$OUT/r5_noise_rbase.json"
  python benchmarks/r5_eval_noise.py --out "$OUT/r5_eval_noise.json" \
    "$OUT/r5_so_div30k_best.json" "$OUT/r5_noise_rbase.json" \
    && python benchmarks/r4_campaign_report.py \
      --noise "$OUT/r5_eval_noise.json" > "$OUT/r5_campaign_report.md" \
    && touch runs/.r5_s7_done
fi

# ---------- S8: export + same-session HTTP A/B (order #4) ----------
if [ -f runs/.r5_s1_done ] && [ ! -f runs/.r5_s8_done ]; then
  stage "S8 export S1 best + HTTP A/B"
  run 1800 3 python -m gea.cli.export_model --load_path runs/r5_div30k \
    --step -1 --out exports/r5_flag80 \
    && bash benchmarks/r5_http_ab.sh exports/r5_flag80 "$OUT/r5_http_ab" \
    && touch runs/.r5_s8_done
fi

stage "pipeline complete; markers: $(cd runs && ls .r5_* 2>/dev/null | tr '\n' ' ')"
