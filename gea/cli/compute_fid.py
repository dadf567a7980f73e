"""FID evaluation CLI (SURVEY.md §7 layer 8): score a trained generator
run against a real dataset.

    python -m gea.cli.compute_fid --load_path runs/glis3_80 \
        --dataset folder --dataroot /data/celeba --num_samples 10000

The metric label in the output says exactly which extractor was used:
``FID(inception-v3)`` when imagenet weights are available, otherwise
``proxy-FID(random-cnn)`` — a documented offline proxy (gea/eval/fid.py).
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gea.cli.sample import load_generator
from gea.data.ondevice import preprocess_batch
from gea.data.pipeline import device_crop_size, make_dataset
from gea.eval.fid import MetricBundle


def fake_batch_iter(generator, variables, cfg, batch_size: int, seed: int):
    render = jax.jit(
        lambda z, sn: generator.render(variables, z, spatial_noise=sn)[0][-1]
    )
    rng = jax.random.PRNGKey(seed)
    while True:
        rng, z_rng, sn_rng = jax.random.split(rng, 3)
        z = jax.random.normal(z_rng, (batch_size, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(batch_size)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )
        yield np.asarray(jax.device_get(render(z, sn)))


def corrected_batch_iter(
    generator,
    g_vars,
    cfg,
    r_path: str,
    batch_size: int,
    seed: int,
    correction_steps: int = 1,
    correction_strength: float = 0.3,
    shell_renorm: bool = True,
    r_step: int = 0,
):
    """Final images AFTER the R-separate correction chain — lets the
    ablation 'does correction improve FID?' run as a first-class metric
    (VERDICT r1 #4) instead of an offline script."""
    from gea.cli.sample_r_separate import load_reverter
    from gea.models.reverter import blend_correction

    reverter, r_vars, _r_cfg = load_reverter(r_path, step=r_step or None)

    @jax.jit
    def chain(z, sn):
        for _ in range(correction_steps):
            images, _ = generator.apply(
                g_vars, z, spatial_noise=sn, train=False,
                render_all_stages=True,
            )
            z_hat = reverter.apply(r_vars, images[-1], train=False)
            z = blend_correction(z, z_hat, correction_strength, shell_renorm)
        images, _ = generator.apply(
            g_vars, z, spatial_noise=sn, train=False, render_all_stages=True
        )
        return images[-1]

    rng = jax.random.PRNGKey(seed)
    while True:
        rng, z_rng, sn_rng = jax.random.split(rng, 3)
        z = jax.random.normal(z_rng, (batch_size, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(batch_size)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )
        yield np.asarray(jax.device_get(chain(z, sn)))


def filtered_batch_iter(
    generator,
    g_vars,
    cfg,
    load_path: str,
    batch_size: int,
    seed: int,
    oversample: int = 4,
    d_step: int = 0,
    restored=None,
):
    """Final images after discriminator-filtered resampling (`--d_filter`):
    render oversample*batch candidates, keep the top batch by D score —
    the same selection the sampler applies, scored as a first-class FID
    ablation (VERDICT r1 weak #7). Pass `restored` to reuse an
    already-read checkpoint when D comes from the same step as G."""
    from gea.cli.sample import load_discriminator

    discriminator, d_vars = load_discriminator(
        load_path, step=d_step or None, restored=restored
    )

    @jax.jit
    def render(z, sn):
        images, _ = generator.apply(
            g_vars, z, spatial_noise=sn, train=False, render_all_stages=True
        )
        final = images[-1]
        scores = discriminator.apply(d_vars, final, train=False)
        _, keep = jax.lax.top_k(scores, batch_size)
        return final[keep]

    rng = jax.random.PRNGKey(seed)
    n_cand = batch_size * max(1, oversample)
    while True:
        rng, z_rng, sn_rng = jax.random.split(rng, 3)
        z = jax.random.normal(z_rng, (n_cand, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(n_cand)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )
        yield np.asarray(jax.device_get(render(z, sn)))


def real_batch_iter(cfg, seed: int):
    ds = make_dataset(cfg, seed=seed)
    rng = jax.random.PRNGKey(seed)
    for raw in ds.batches():
        rng, prng = jax.random.split(rng)
        batch = preprocess_batch(
            jnp.asarray(raw),
            prng,
            crop_size=device_crop_size(cfg),
            image_size=cfg.image_size,
            augment_flip=False,
        )
        yield np.asarray(jax.device_get(batch))


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True, help="trained G-LIS run dir")
    p.add_argument("--dataset", default="folder")
    p.add_argument("--dataroot", default="")
    p.add_argument("--num_samples", type=int, default=10_000)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--extractor", default="auto", choices=("auto", "inception", "random")
    )
    p.add_argument(
        "--inception_weights", default="",
        help="local keras InceptionV3 weights (.h5/.weights.h5) for true "
        "FID offline; overrides --extractor",
    )
    p.add_argument("--out", default="", help="optional JSON output path")
    p.add_argument(
        "--step", type=int, default=0,
        help="checkpoint step (0 = latest, -1 = best per --fid_interval)",
    )
    p.add_argument(
        "--r_path", default="",
        help="R-separate run dir: score CORRECTED samples "
        "G(blend(z, R(G(z)))) instead of plain ones",
    )
    p.add_argument("--correction_steps", type=int, default=1)
    p.add_argument("--correction_strength", type=float, default=0.3)
    p.add_argument(
        "--shell_renorm", type=lambda v: v.lower() not in ("0", "false", "no"),
        default=True,
    )
    p.add_argument("--r_step", type=int, default=0)
    p.add_argument(
        "--d_filter", action="store_true",
        help="score D-filtered samples (top batch of --oversample x "
        "candidates by discriminator score) — the sampler's "
        "error-avoidance resampling as a FID ablation",
    )
    p.add_argument("--oversample", type=int, default=4)
    p.add_argument(
        "--d_filter_step", type=int, default=0,
        help="with --d_filter: D snapshot step to judge with (0 = --step)",
    )
    p.add_argument(
        "--use_ema", action="store_true",
        help="score the EMA copy of G (runs trained with --g_ema > 0)",
    )
    p.add_argument(
        "--second_opinion", action="store_true",
        help="also score with an independent second random-feature net "
        "(proxy-FID-b), KID (cubic-kernel MMD), and improved "
        "precision/recall (k-NN manifolds: fidelity vs diversity split) — "
        "rank agreement across metric families is evidence a result is "
        "not a one-metric artifact",
    )
    p.add_argument(
        "--repeats", type=int, default=1,
        help="score N INDEPENDENT sample draws (fresh z stream and a "
        "reshuffled real subset per repeat) and report mean +- spread "
        "per metric — a cheap eval-noise estimate at this --num_samples, "
        "so score margins between runs can be read against the noise "
        "floor instead of as point estimates (VERDICT r4 order #6)",
    )
    a = p.parse_args(argv)
    from gea.utils.devices import acquire_devices

    # Wedged-relay guard: fail loudly within GEA_DEVICE_TIMEOUT
    # instead of hanging on the first device touch (VERDICT r3 #6).
    acquire_devices()

    from gea.utils.checkpoint import restore_checkpoint

    restored = restore_checkpoint(a.load_path, target=None, step=a.step or None)
    generator, variables, train_cfg = load_generator(
        a.load_path, step=a.step or None, restored=restored, use_ema=a.use_ema
    )
    data_cfg = train_cfg.replace(
        dataset=a.dataset,
        dataroot=a.dataroot or train_cfg.dataroot,
        batch_size=a.batch_size,
    )
    def make_fakes(seed: int):
        """Fresh fake-sample iterator (deterministic from the seed) — the
        second-opinion metrics re-walk the identical sample stream."""
        if a.r_path:
            return corrected_batch_iter(
                generator, variables, train_cfg, a.r_path, a.batch_size,
                seed,
                correction_steps=a.correction_steps,
                correction_strength=a.correction_strength,
                shell_renorm=a.shell_renorm,
                r_step=a.r_step,
            )
        if a.d_filter:
            d_step = a.d_filter_step or a.step
            return filtered_batch_iter(
                generator, variables, train_cfg, a.load_path, a.batch_size,
                seed, oversample=a.oversample, d_step=d_step,
                restored=restored if d_step == a.step else None,
            )
        return fake_batch_iter(
            generator, variables, train_cfg, a.batch_size, seed
        )

    def score_once(seed: int):
        # One pass over reals and one over fakes feeds every enabled
        # metric (MetricBundle): with --second_opinion the old flow
        # re-rendered the full fake stream and re-decoded the real
        # dataset twice more.
        bundle = MetricBundle(
            train_cfg.image_size,
            extractor=a.extractor,
            inception_weights=a.inception_weights,
            second_opinion=a.second_opinion,
        )
        bundle.set_reals(real_batch_iter(data_cfg, seed), a.num_samples)
        fakes = bundle.group()
        fakes.consume(make_fakes(seed), a.num_samples)
        return bundle, bundle.row(fakes)

    # --repeats N: N fully independent draws (fresh z stream AND a
    # reshuffled real subset) -> mean +- spread per metric. The model is
    # fixed; what varies is the eval draw, so the spread IS the eval
    # noise at this sample budget.
    repeat_seeds = [a.seed + 7919 * r for r in range(max(1, a.repeats))]
    rows = []
    for seed in repeat_seeds:
        bundle, scores = score_once(seed)
        rows.append(scores)

    def agg(key):
        vals = [r[key] for r in rows if r.get(key) is not None]
        if not vals:
            return None, None
        mean = float(np.mean(vals))
        half = float((max(vals) - min(vals)) / 2.0)
        return round(mean, 4), round(half, 4)

    scores = rows[0] if len(rows) == 1 else {
        k: agg(k)[0] for k in rows[0]
    }
    result = {
        "metric": bundle.label,
        "value": scores["frechet"],
        "num_samples": a.num_samples,
        "load_path": os.path.abspath(a.load_path),
    }
    if a.second_opinion:
        result["second_opinion"] = {
            "metric_b": bundle.label_b,
            "value_b": scores["frechet_b"],
            "kid_metric": f"KID over {bundle.label} features, x1000",
            "kid_x1000": scores["kid_x1000"],
            "kid_x1000_std": scores["kid_x1000_std"],
            # Kynkäänniemi-style k-NN manifold membership: fidelity vs
            # diversity split over the same feature matrices.
            "precision": scores["precision"],
            "recall": scores["recall"],
        }
    if len(rows) > 1:
        spread_keys = ["frechet"]
        if a.second_opinion:
            spread_keys += ["frechet_b", "kid_x1000", "precision", "recall"]
        result["repeats"] = {
            "n": len(rows),
            "seeds": repeat_seeds,
            "per_draw": rows,
            # Half the max-min spread across draws: an honest +- for the
            # reported mean (2 draws -> half the |difference|).
            "half_spread": {k: agg(k)[1] for k in spread_keys},
        }
    if a.r_path:
        result["r_path"] = os.path.abspath(a.r_path)
        result["correction"] = (
            f"steps={a.correction_steps} strength={a.correction_strength} "
            f"shell_renorm={a.shell_renorm}"
        )
    if a.d_filter:
        result["d_filter"] = (
            f"oversample={a.oversample} "
            f"d_step={a.d_filter_step or a.step or 'latest'}"
        )
    print(json.dumps(result))
    if a.out:
        with open(a.out, "w") as f:
            json.dump(result, f, indent=2)
    return result


if __name__ == "__main__":
    main()
