"""Serving-path throughput: exported StableHLO artifact vs live-jit render.

Measures images/sec of the deployed inference path (gea.serve on a
`gea.cli.export_model` artifact) against the same render jitted live from
the checkpoint — the question a serving deployment actually asks: does the
frozen artifact cost anything over the development path?

    python benchmarks/serve_bench.py --artifact <export_dir> \
        [--run <run_dir>] [--batch 256] [--reps 5] [--steps 20]

Prints one JSON line with median/spread for both paths. The artifact is
called through `Exported.call` (traced into a fresh jit), so XLA compiles
the same program either way — parity here is the expected result, and a
gap would indicate serialization-roundtrip lowering loss.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(out):
    """Barrier on real device execution.

    On the tunneled runtime `jax.block_until_ready` returns before the
    program has executed (same finding as bench.py:96); a 1-element D2H
    readback of an output leaf cannot — the value doesn't exist until
    the program finishes.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[0])


def time_reps(fn, z, reps: int, steps: int) -> dict:
    out = fn(z)  # warmup/compile
    _sync(out)
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(z)
        _sync(out)  # one sync RTT per rep, amortized over `steps` calls
        dt = time.perf_counter() - t0
        rates.append(steps * z.shape[0] / dt)
    # Per-request latency: sync every call — what a single online request
    # pays, including the host<->device round trip.
    lat = []
    for _ in range(max(reps, 5)):
        t0 = time.perf_counter()
        _sync(fn(z))
        lat.append(1e3 * (time.perf_counter() - t0))
    med = statistics.median(rates)
    return {
        "median": round(med, 2),
        "best": round(max(rates), 2),
        "reps": [round(r, 2) for r in rates],
        "spread_pct": round(100 * (max(rates) - min(rates)) / med, 2),
        "request_latency_ms": {
            "median": round(statistics.median(lat), 2),
            "best": round(min(lat), 2),
        },
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", required=True, help="export_model output dir")
    p.add_argument(
        "--run", default="",
        help="source run dir for the live-jit comparison (default: the "
        "artifact manifest's source_run)",
    )
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--steps", type=int, default=20)
    a = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gea import serve

    model = serve.load(a.artifact)
    z = np.random.default_rng(0).standard_normal(
        (a.batch, model.code_size)
    ).astype(np.float32)
    if model.spatial_noise_shape is not None:
        raise SystemExit("spatial-noise artifacts not supported by this bench")

    z_dev = jax.device_put(z)
    exported_call = jax.jit(model.exported.call)
    artifact = time_reps(exported_call, z_dev, a.reps, a.steps)

    # the live path is the plain final-stage render: the roundtrip-parity
    # comparison only holds for artifacts without baked extras
    extras = [
        k for k in ("correction", "chain") if model.manifest.get(k)
    ] + (["scores"] if "scores" in (model.manifest.get("outputs") or []) else [])
    live = None
    run_dir = a.run or model.manifest.get("source_run", "")
    if run_dir:
        from gea.cli.sample import load_generator

        generator, g_vars, _cfg = load_generator(
            run_dir, step=model.manifest.get("step")
        )

        @jax.jit
        def live_render(zz):
            images, _ = generator.render(g_vars, zz)
            return jnp.clip((images[-1] + 1) * 127.5, 0, 255).astype(jnp.uint8)

        live = time_reps(live_render, z_dev, a.reps, a.steps)

    print(json.dumps({
        "metric": "serving images/sec, exported StableHLO artifact "
        f"batch={a.batch} [{jax.devices()[0].platform}]",
        "artifact": artifact,
        "live_jit_render": live,
        "live_comparable": not extras,
        "artifact_extra_work": extras or None,
        "outputs": model.manifest.get("outputs"),
        "n_stages": model.manifest.get("n_stages"),
        "image_size": model.manifest.get("image_size"),
    }))


if __name__ == "__main__":
    main()
