"""Per-LIS-stage evaluation CLI — quantifies the error-avoidance effect
(the core claim of arXiv:1707.00768): for each stage image z_0..z_N it
reports (a) the mean trained-discriminator realism score and (b) the
Frechet distance to the real data, so the improvement from each LIS
refinement is a number, not just a grid.

    python -m gea.cli.eval_stages --load_path runs/glis3_80 \
        --dataset folder --dataroot /data/celeba --num_samples 2048
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gea.cli.compute_fid import real_batch_iter
from gea.cli.sample import load_discriminator, load_generator
from gea.eval.fid import MetricBundle


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True, help="trained G-LIS run dir")
    p.add_argument(
        "--dataset", default="",
        help="real-data source for the Frechet reference (default: the "
        "run's own training dataset from its config.json)",
    )
    p.add_argument("--dataroot", default="")
    p.add_argument("--num_samples", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="", help="optional JSON output path")
    p.add_argument(
        "--step", type=int, default=0,
        help="checkpoint step (0 = latest, -1 = best per --fid_interval)",
    )
    p.add_argument(
        "--extractor", default="auto", choices=("auto", "inception", "random")
    )
    p.add_argument(
        "--inception_weights", default="",
        help="local keras InceptionV3 weights (.h5) for true FID offline",
    )
    p.add_argument(
        "--second_opinion", action="store_true",
        help="add two independent per-stage columns: Frechet distance "
        "under a second random-feature net (frechet_b) and KID (cubic-"
        "kernel MMD x1000) — rank agreement across metrics is evidence "
        "the stage ordering is not a one-metric artifact",
    )
    a = p.parse_args(argv)
    from gea.utils.devices import acquire_devices

    # Wedged-relay guard: fail loudly within GEA_DEVICE_TIMEOUT
    # instead of hanging on the first device touch (VERDICT r3 #6).
    acquire_devices()

    from gea.utils.checkpoint import restore_checkpoint

    step = a.step if a.step != 0 else None  # -1 = best.json
    restored = restore_checkpoint(a.load_path, target=None, step=step)
    generator, g_vars, cfg = load_generator(
        a.load_path, step=step, restored=restored
    )
    discriminator, d_vars = load_discriminator(
        a.load_path, step=step, restored=restored
    )
    n_stages = cfg.r_iterations + 1

    @jax.jit
    def render_and_score(z, sn):
        images, _ = generator.render(g_vars, z, spatial_noise=sn)
        flat = images.reshape(-1, *images.shape[2:])
        scores = jax.nn.sigmoid(
            discriminator.apply(d_vars, flat, train=False)
        ).reshape(n_stages, -1)
        return images, scores

    # MetricBundle: one feature extraction per batch feeds every enabled
    # metric, and the real dataset is decoded exactly once (shared with
    # compute_fid / eval_chain).
    bundle = MetricBundle(
        cfg.image_size,
        extractor=a.extractor,
        inception_weights=a.inception_weights,
        second_opinion=a.second_opinion,
    )
    stage_groups = [bundle.group() for _ in range(n_stages)]
    d_scores = [[] for _ in range(n_stages)]

    rng = jax.random.PRNGKey(a.seed)
    done = 0
    while done < a.num_samples:
        n = min(a.batch_size, a.num_samples - done)
        rng, z_rng, sn_rng = jax.random.split(rng, 3)
        z = jax.random.normal(z_rng, (n, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(n)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )
        images, scores = render_and_score(z, sn)
        scores = np.asarray(jax.device_get(scores))
        for s in range(n_stages):
            d_scores[s].append(scores[s])
            stage_groups[s].update(images[s])
        done += n

    def make_reals():
        return real_batch_iter(
            cfg.replace(
                dataset=a.dataset or cfg.dataset,
                dataroot=a.dataroot or cfg.dataroot,
                batch_size=a.batch_size,
            ),
            a.seed,
        )

    bundle.set_reals(make_reals(), a.num_samples)

    stages = []
    for s in range(n_stages):
        row = {
            "stage": s,
            "d_score_mean": round(float(np.mean(np.concatenate(d_scores[s]))), 4),
        }
        row.update(bundle.row(stage_groups[s]))
        stages.append(row)
    result = {
        "metric": bundle.label,
        # Provenance of the reference distribution: without it, a score
        # measured against the wrong reals is indistinguishable from a
        # real eval in the saved artifact.
        "real_dataset": a.dataset or cfg.dataset,
        "real_dataroot": a.dataroot or cfg.dataroot,
        "num_samples": a.num_samples,
        "stages": stages,
        "load_path": os.path.abspath(a.load_path),
    }
    if a.second_opinion:
        result["metric_b"] = bundle.label_b
        result["kid_metric"] = f"KID over {bundle.label} features, x1000"
    print(json.dumps(result))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
