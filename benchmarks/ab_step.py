"""Interleaved A/B benchmark of two train-step configurations.

On a shared/tunneled TPU host, ambient load drifts on minute timescales —
back-to-back blocks (all A, then all B) confound config effects with drift.
This probe alternates short timing reps A,B,A,B,... so both configs sample
the same ambient conditions, then reports per-config medians and the
per-pair deltas (the pairwise statistic is drift-immune).

    python benchmarks/ab_step.py --b pallas        # XLA vs Pallas kernels
    python benchmarks/ab_step.py --b two_forward   # shared-vjp vs 2-forward

Used for DESIGN.md §4 default-follows-measurement decisions
(benchmarks/KERNELS.md records the outcomes).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gea  # noqa: F401,E402  (applies the GEA_PLATFORM override; jax
# backends initialize lazily, so doing this after `import jax` is fine)


def build(
    use_pallas: bool,
    share_g_forward,
    batch: int,
    image_size: int,
    gen_overrides=None,
):
    # One shared workload definition (benchmarks/common.py): A/B rows must
    # measure exactly the headline bench.py config.
    from benchmarks.common import build_flagship_step, flagship_config

    cfg = flagship_config(batch, image_size=image_size, use_pallas=use_pallas)
    return build_flagship_step(
        cfg, share_g_forward=share_g_forward, gen_overrides=gen_overrides
    )


def build_forward(batch: int, image_size: int, gen_overrides=None):
    """Jitted inference render of all stages (the G-forward-only surface
    the fused seed kernel targets; KERNELS.md micro-profile pins G fwd at
    ~60 TFLOPS vs 96+ for the grads)."""
    from benchmarks.common import flagship_config
    from gea.models import GeneratorLIS

    cfg = flagship_config(batch, image_size=image_size)
    generator = GeneratorLIS.from_config(cfg, **(gen_overrides or {}))
    z = jnp.zeros((batch, cfg.code_size), jnp.float32)
    variables = generator.init(jax.random.PRNGKey(0), z, train=False)

    @jax.jit
    def fwd(z):
        images, _ = generator.apply(
            variables, z, train=False, render_all_stages=True
        )
        return images

    return None, fwd


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--b", default="pallas",
        choices=("pallas", "two_forward", "fused_seed"),
    )
    p.add_argument(
        "--forward_only", action="store_true",
        help="time the generator forward (all-stage render) instead of "
        "the full train step — isolates the unit the fused seed kernel "
        "targets",
    )
    p.add_argument("--pairs", type=int, default=8)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--image_size", type=int, default=80)
    a = p.parse_args()

    real = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0)
            .uniform(-1, 1, (a.batch, a.image_size, a.image_size, 3))
            .astype(np.float32)
        )
    )

    if a.forward_only:
        state_a, step_a = build_forward(a.batch, a.image_size)
        state_b, step_b = build_forward(
            a.batch, a.image_size,
            gen_overrides={"fused_seed": True} if a.b == "fused_seed" else None,
        )
        z_in = jax.device_put(
            jnp.asarray(
                np.random.default_rng(1)
                .standard_normal((a.batch, 256))
                .astype(np.float32)
            )
        )

        def rep(state, step):
            t0 = time.perf_counter()
            for _ in range(a.steps):
                images = step(z_in)
            float(jnp.sum(images[-1, 0, 0]))  # host sync
            return state, a.batch * a.steps / (time.perf_counter() - t0)

    else:
        state_a, step_a = build(False, None, a.batch, a.image_size)
        if a.b == "pallas":
            state_b, step_b = build(True, None, a.batch, a.image_size)
        elif a.b == "fused_seed":
            state_b, step_b = build(
                False, None, a.batch, a.image_size,
                gen_overrides={"fused_seed": True},
            )
        else:
            state_b, step_b = build(False, False, a.batch, a.image_size)

        def rep(state, step):
            t0 = time.perf_counter()
            for _ in range(a.steps):
                state, metrics = step(state, real)
            float(metrics["loss_d"])  # host sync (tunneled runtime)
            return state, a.batch * a.steps / (time.perf_counter() - t0)

    # Warmup both (compile + first executions).
    for _ in range(3):
        state_a, _ = rep(state_a, step_a)
        state_b, _ = rep(state_b, step_b)

    ra, rb = [], []
    for _ in range(a.pairs):
        state_a, va = rep(state_a, step_a)
        state_b, vb = rep(state_b, step_b)
        ra.append(va)
        rb.append(vb)

    deltas = [100.0 * (y - x) / x for x, y in zip(ra, rb)]
    print(
        json.dumps(
            {
                "a": "xla/default",
                "b": a.b,
                "a_median": round(statistics.median(ra), 2),
                "b_median": round(statistics.median(rb), 2),
                "a_reps": [round(v, 2) for v in ra],
                "b_reps": [round(v, 2) for v in rb],
                "pairwise_delta_pct": [round(d, 2) for d in deltas],
                "median_delta_pct": round(statistics.median(deltas), 2),
                "b_wins_pairs": sum(d > 0 for d in deltas),
                "pairs": a.pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
