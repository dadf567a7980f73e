"""Benchmark: images/sec/chip of the flagship G+D alternating train step
(G-LIS, 3 LIS modules, weight norm, CelebA-shaped synthetic data at 80x80,
bfloat16 compute) — the BASELINE.json north-star metric.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Methodology (VERDICT r2 #1, r3 #3, r4 weak #6): the headline number is
the TRIMMED MEAN (min and max reps dropped, rest averaged — trimming a
median would be a no-op) of GEA_BENCH_REPS (default 9 — FIXED on the
driver path since round 5, so BENCH_rN strings are comparable across
rounds regardless of which reps the tunnel poisons) independent timing
repetitions of GEA_BENCH_STEPS (default 20) steps each, with per-rep
throughputs and the max-min spread reported alongside — a single
20-step pass on a tunneled runtime cannot distinguish ambient load from
a code regression. When the raw spread still exceeds
GEA_BENCH_SPREAD_TOL percent (default 3), the run extends to
GEA_BENCH_EXTENDED_REPS reps (default 13) before trimming. The benched
configuration IS the shipped default trainer config (use_pallas=False; the
XLA lowering measured faster, benchmarks/KERNELS.md). Two ablation variants
are also timed (skippable with GEA_BENCH_VARIANTS=""):

* ``pallas`` — the --use_pallas true path (fused Pallas LIS/TPReLU kernels)
* ``g_two_forward`` — the pre-r2 step structure that re-runs G's forward in
  the G step instead of reusing the saved vjp residuals (attribution probe
  for the r01->r02 throughput delta)
* ``remat`` — the --remat path (jax.checkpoint around G's forward): the
  throughput cost of the ~2x peak-memory drop, at the bench config

`vs_baseline` compares against the measured PyTorch reference throughput in
BASELINE_MEASURED.json (produced by benchmarks/torch_reference.py — the
torch-CPU build is the only PyTorch device available in this image; see
BASELINE.md: the reference publishes no numbers, so the build measures its
own baseline). Falls back to vs_baseline = 0.0 when no measurement exists.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import threading
import time

import gea  # noqa: F401  (applies the GEA_PLATFORM override before jax init)
import jax

REPO = os.path.dirname(os.path.abspath(__file__))

# Flagship config: benchmarks/common.py FLAGSHIP (BASELINE.json config 3
# shape; batch sized for MXU occupancy on a single chip).
BATCH = int(os.environ.get("GEA_BENCH_BATCH", "256"))
WARMUP = 3
STEPS = int(os.environ.get("GEA_BENCH_STEPS", "20"))
REPS = int(os.environ.get("GEA_BENCH_REPS", "9"))
SPREAD_TOL = float(os.environ.get("GEA_BENCH_SPREAD_TOL", "3.0"))
EXTENDED_REPS = int(os.environ.get("GEA_BENCH_EXTENDED_REPS", "13"))
VARIANTS = os.environ.get("GEA_BENCH_VARIANTS", "pallas,g_two_forward,remat")


def time_config(
    use_pallas: bool, share_g_forward, reps: int, **cfg_overrides
) -> dict:
    """Median/spread over `reps` timing repetitions of STEPS steps each.

    The workload definition is shared with ab_step.py/mfu_probe.py
    (benchmarks/common.py) so every probe measures the headline config.
    """
    from benchmarks.common import (
        build_flagship_step,
        flagship_config,
        flagship_real_batch,
    )

    cfg = flagship_config(BATCH, use_pallas=use_pallas, **cfg_overrides)
    state, step = build_flagship_step(cfg, share_g_forward=share_g_forward)
    real = flagship_real_batch(cfg)

    for _ in range(WARMUP):
        state, metrics = step(state, real)
    # Force full execution via a host transfer: on the tunneled axon
    # platform block_until_ready does not reliably synchronize, and the
    # step chain (state -> state) guarantees a final-metric read implies
    # every step ran.
    float(metrics["loss_d"])

    def run_reps(n: int) -> list:
        rates = []
        for _ in range(n):
            nonlocal state, metrics
            t0 = time.perf_counter()
            for _ in range(STEPS):
                state, metrics = step(state, real)
            float(metrics["loss_d"])  # sync: rep boundary
            dt = time.perf_counter() - t0
            rates.append(BATCH * STEPS / dt)
        return rates

    rates = run_reps(reps)

    def spread(rs: list) -> float:
        return 100.0 * (max(rs) - min(rs)) / statistics.median(rs)

    # Noise robustness (VERDICT r3 #3: one ambient-load dip inside a 5-rep
    # capture put 9.9% spread on the headline). When the spread exceeds
    # SPREAD_TOL, extend to EXTENDED_REPS total, and report the TRIMMED
    # MEAN (drop min and max, average the rest) so a single tunnel-noise
    # outlier cannot move the one number the driver records. (Trimming
    # before a MEDIAN would be a no-op — dropping the extremes never moves
    # the middle element — so the estimator is the midmean-style trimmed
    # mean; the plain median is kept in the JSON for comparison.)
    extra = 0
    if spread(rates) > SPREAD_TOL and reps >= 3:
        extra = max(0, EXTENDED_REPS - len(rates))
        rates = rates + run_reps(extra)
    trimmed = sorted(rates)[1:-1] if len(rates) >= 4 else rates
    value = statistics.mean(trimmed)
    return {
        "headline": round(value, 2),  # trimmed mean
        "plain_median": round(statistics.median(rates), 2),
        "best": round(max(rates), 2),
        "reps": [round(r, 2) for r in rates],
        "spread_pct": round(spread(rates), 2),
        "trimmed": len(rates) >= 4,
        "extended": extra > 0,
    }


def main() -> None:
    platform = jax.devices()[0].platform
    # Watchdog heartbeat: the tunneled runtime can wedge so that device
    # acquisition blocks forever (observed: jax.devices() never returns
    # while only the xla_bridge warning has printed). The parent process
    # watches for this marker.
    print("[bench] devices-ok " + platform, file=sys.stderr, flush=True)

    default = time_config(use_pallas=False, share_g_forward=None, reps=REPS)

    variants = {}
    for name in [v for v in VARIANTS.split(",") if v]:
        if name == "pallas":
            variants["pallas"] = time_config(
                use_pallas=True, share_g_forward=None, reps=max(3, REPS - 2)
            )
        elif name == "g_two_forward":
            variants["g_two_forward"] = time_config(
                use_pallas=False, share_g_forward=False, reps=max(3, REPS - 2)
            )
        elif name == "remat":
            variants["remat"] = time_config(
                use_pallas=False, share_g_forward=None,
                reps=max(3, REPS - 2), remat=True,
            )

    baseline = 0.0
    baseline_path = os.path.join(REPO, "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = float(
                json.load(f).get("torch_reference_images_per_sec", 0.0)
            )

    value = default["headline"]
    result = {
        "metric": (
            "images/sec/chip, G+D alternating step, G-LIS-3 80x80 bf16 "
            f"batch={BATCH} [{platform}], trimmed mean of "
            f"{len(default['reps'])}x{STEPS}-step reps"
            + (" (extended: spread>tol)" if default.get("extended") else "")
            + ", shipped default config"
        ),
        "value": value,
        "unit": "images/sec/chip",
        # vs_baseline compares against torch-CPU — the only PyTorch device
        # in this image — NOT the ≥5x-A100 north star (VERDICT r1 #8).
        "vs_baseline": round(value / baseline, 3) if baseline else 0.0,
        "reps": default["reps"],
        "best": default["best"],
        "spread_pct": default["spread_pct"],
        "variants": variants,
        "baseline": (
            f"torch-CPU reference workload, {baseline} img/s "
            "(BASELINE_MEASURED.json; no CUDA device exists in this image)"
        ),
        "north_star": (
            "BASELINE.md: >=5x A100-PyTorch img/s/chip — unmeasurable here; "
            "estimated A100-torch ~6-12k img/s (BASELINE.md 'Estimated A100 "
            "ratio'), so this v5e chip is ~parity per chip"
        ),
    }
    print(json.dumps(result))


def _watchdog() -> int:
    """Run main() in a child process; kill + retry if device init hangs.

    The tunneled TPU runtime sometimes wedges so that a fresh client
    blocks forever acquiring the device (no CPU use, only the xla_bridge
    warning printed). A driver calling bench.py would stall with it.
    The child must emit the "[bench] devices-ok" heartbeat within
    GEA_BENCH_INIT_TIMEOUT seconds (default 600) or it is killed (by
    exact pid) and retried after a quiet pause, GEA_BENCH_ATTEMPTS times.
    Once init succeeds there is no further timeout — long compiles and
    timing reps run to completion.
    """
    init_timeout = float(os.environ.get("GEA_BENCH_INIT_TIMEOUT", "600"))
    attempts = int(os.environ.get("GEA_BENCH_ATTEMPTS", "3"))
    for attempt in range(1, attempts + 1):
        env = dict(os.environ, GEA_BENCH_CHILD="1")
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stderr=subprocess.PIPE, env=env, text=True,
        )
        ok = threading.Event()

        def relay(pipe=child.stderr):
            for line in pipe:
                if "[bench] devices-ok" in line:
                    ok.set()
                sys.stderr.write(line)
                sys.stderr.flush()

        t = threading.Thread(target=relay, daemon=True)
        t.start()
        deadline = time.time() + init_timeout
        while time.time() < deadline and not ok.is_set():
            if child.poll() is not None:
                break
            time.sleep(2)
        if ok.is_set() or child.poll() is not None:
            return child.wait()
        print(
            f"[bench] watchdog: no device after {init_timeout:.0f}s "
            f"(attempt {attempt}/{attempts}) — killing pid {child.pid} "
            "and retrying",
            file=sys.stderr, flush=True,
        )
        child.kill()
        child.wait()
        time.sleep(60)
    print(
        json.dumps({
            "metric": "images/sec/chip, G+D alternating step (UNMEASURED: "
            "device init hung on every watchdog attempt)",
            "value": 0.0,
            "unit": "images/sec/chip",
            "vs_baseline": 0.0,
            "error": f"device acquisition hung {attempts}x{init_timeout:.0f}s",
        })
    )
    return 1


if __name__ == "__main__":
    if os.environ.get("GEA_BENCH_CHILD") or os.environ.get(
        "GEA_BENCH_WATCHDOG", "1"
    ) == "0":
        main()
    else:
        raise SystemExit(_watchdog())
