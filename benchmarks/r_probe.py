"""Step-only throughput + counted-FLOPs MFU for the two reverser trainers
(VERDICT r3 missing #4: only the G-LIS flagship step had an MFU story;
R-separate showed an unexplained 8.5k-32k img/s/chip spread across
RESULTS.md mentions and R-iterative only an e2e number).

Workloads, at flagship-ish shapes (80x80, code 256, nf 64 / mf 512,
weight norm, bf16):

* ``r_separate`` — one reverter-training step against a frozen G-LIS-3
  and frozen D (the D-feedback + mining objective the production CLI
  uses; upstream hot loop `r_separate/train_r.py`, SURVEY.md §3.4).
* ``r_iterative`` — one joint G/D/R step with chain length 2 (3 rendered
  links; upstream `r_iterative/train.py`, SURVEY.md §3.3).

FLOPs come from the compiled executable's own cost analysis
(`compiled.cost_analysis()['flops']`) rather than a hand model, so the
MFU column is XLA-counted like benchmarks/KERNELS.md's flagship rows.
Methodology matches bench.py/mfu_probe.py: warmup, chain the donated
state, synchronize via a host metric read, median of --reps timing reps.

Usage: python benchmarks/r_probe.py [--batch 256] [--steps 10] [--reps 5]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gea  # noqa: F401,E402  (GEA_PLATFORM override before backend init)
import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def _mk_glis(cfg):
    from gea.models import Discriminator, GeneratorLIS
    from gea.train.state import create_glis_state, make_optimizer

    g = GeneratorLIS.from_config(cfg)
    d = Discriminator.from_config(cfg)
    tx = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    state = create_glis_state(cfg, g, d, tx, tx, 0)
    return g, d, tx, state


def build_r_separate(batch: int):
    """(state, jitted step(state, dummy)) for the frozen-G reverter step."""
    from gea.cli.train_r_separate import create_r_state
    from gea.config import TrainRSeparateConfig
    from gea.models import Reverter
    from gea.train.steps_r import build_r_separate_step

    cfg = TrainRSeparateConfig(
        image_size=80, code_size=256, r_iterations=3, norm="weight",
        num_features=64, max_features=512, dtype="bfloat16",
        dataset="synthetic", batch_size=batch, g_path="<probe>",
    )
    g, d, tx, gd_state = _mk_glis(cfg)
    frozen_g = {"params": gd_state.params_g, **gd_state.extras_g}
    frozen_d = {"params": gd_state.params_d, **gd_state.extras_d}
    reverter = Reverter.from_config(cfg)
    state = create_r_state(cfg, reverter, tx, 0)
    step = build_r_separate_step(
        cfg, g, reverter, frozen_g, tx,
        discriminator=d, frozen_d_variables=frozen_d,
    )
    return state, step, cfg


def build_r_iterative(batch: int, chain: int = 2):
    """(state, jitted step(state, real)) for the joint G/D/R chain step."""
    from gea.config import TrainRIterativeConfig
    from gea.models import Discriminator, GeneratorLIS, Reverter
    from gea.train.state import (
        add_reverter,
        create_glis_state,
        make_optimizer,
    )
    from gea.train.steps_r import build_r_iterative_step

    cfg = TrainRIterativeConfig(
        image_size=80, code_size=256, norm="weight",
        num_features=64, max_features=512, dtype="bfloat16",
        dataset="synthetic", batch_size=batch, r_chain_length=chain,
    )
    g = GeneratorLIS.from_config(cfg, r_iterations=0)
    d = Discriminator.from_config(cfg)
    r = Reverter.from_config(cfg)
    tx_g = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    tx_d = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    tx_r = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    state = create_glis_state(cfg, g, d, tx_g, tx_d, 0)
    state = add_reverter(state, cfg, r, tx_r, 0)
    step = build_r_iterative_step(cfg, g, d, r, tx_g, tx_d, tx_r)
    return state, step, cfg


def time_step(name, state, step, batch, steps, warmup, reps, needs_real):
    compiled_flops = None
    real = (
        jnp.asarray(
            np.random.default_rng(0)
            .uniform(-1, 1, (batch, 80, 80, 3))
            .astype(np.float32)
        )
        if needs_real
        else jnp.zeros((batch,), jnp.float32)
    )
    jitted = jax.jit(step, donate_argnums=0)
    runner = jitted
    try:
        # AOT-compile once and time the executable itself — going back
        # through `jitted(...)` would trace+compile a second time (the
        # jit dispatch cache is separate from the AOT path; the
        # persistent GEA_COMPILE_CACHE softens but does not remove it).
        compiled = jitted.lower(state, real).compile()
        runner = compiled
        try:
            ca = compiled.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            compiled_flops = float(ca.get("flops", 0.0)) or None
        except Exception as e:  # cost analysis is best-effort on some runtimes
            print(f"[r_probe] cost_analysis unavailable for {name}: {e}")
    except Exception as e:
        print(f"[r_probe] AOT lowering unavailable for {name}: {e}")

    # >= 1 warmup call establishes `metrics` for the host-side sync read.
    # The first call guards the (hardware-untested on axon) AOT-execution
    # path: a dispatch-time rejection raises before launch, so `state` is
    # still valid and the probe falls back to the ordinary jit path.
    warmup = max(warmup, 1)
    try:
        state, metrics = runner(state, real)
    except Exception as e:
        if runner is jitted:
            raise
        print(f"[r_probe] AOT execution failed for {name}, "
              f"falling back to jit dispatch: {e}")
        runner = jitted
        state, metrics = runner(state, real)
    for _ in range(warmup - 1):
        state, metrics = runner(state, real)
    key = sorted(metrics)[0]
    float(metrics[key])  # sync (block_until_ready unreliable on axon)

    rates, ms = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = runner(state, real)
        float(metrics[key])
        dt = time.perf_counter() - t0
        rates.append(batch * steps / dt)
        ms.append(dt / steps * 1e3)
    img_s = statistics.median(rates)
    ms_step = statistics.median(ms)
    line = f"{name:12s} {ms_step:7.2f} ms/step  {img_s:9.0f} img/s"
    if compiled_flops:
        tflops = compiled_flops / (ms_step / 1e3) / 1e12
        line += (
            f"  {compiled_flops / 1e9:8.1f} GFLOP/step"
            f"  ~{tflops:6.1f} TFLOPS  ~{tflops / PEAK_TFLOPS * 100:4.1f}% MFU"
        )
    print(line, flush=True)
    return {"name": name, "ms": ms_step, "img_s": img_s, "flops": compiled_flops}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument(
        "--workloads", nargs="*", default=["r_separate", "r_iterative"]
    )
    args = p.parse_args()
    from gea.utils.devices import acquire_devices

    acquire_devices("r_probe device acquisition")
    print(f"device: {jax.devices()[0]}  batch={args.batch}")
    if "r_separate" in args.workloads:
        state, step, _ = build_r_separate(args.batch)
        time_step(
            "r_separate", state, step, args.batch, args.steps, args.warmup,
            args.reps, needs_real=False,
        )
    if "r_iterative" in args.workloads:
        state, step, _ = build_r_iterative(args.batch)
        time_step(
            "r_iterative", state, step, args.batch, args.steps, args.warmup,
            args.reps, needs_real=True,
        )


if __name__ == "__main__":
    main()
