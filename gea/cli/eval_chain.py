"""Per-chain-link evaluation for R-iterative runs (VERDICT r2 #3) — the
quantitative counterpart of `sample_r_iterative`: for each link of the
inference correction chain z_t = z_{t-1} + R(G(z_{t-1})) it reports the
mean trained-discriminator realism score and the Frechet distance to the
real data, so "does the chain improve samples?" is a table, not a grid
(upstream mechanism: `r_iterative/train.py`, SURVEY.md §3.3).

    python -m gea.cli.eval_chain --load_path runs/riter \
        --dataset folder --dataroot /data/celeba --num_samples 2048

Supports --second_opinion (independent proxy-FID-b + KID columns) like
eval_stages.
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
from gea.config import TrainRIterativeConfig
from gea.eval.fid import MetricBundle
from gea.models import Discriminator, GeneratorLIS, Reverter
from gea.models.reverter import iterative_chain
from gea.utils.checkpoint import restore_checkpoint


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True, help="R-iterative run dir")
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
        "--chain_length", type=int, default=None,
        help="links to evaluate (default: the run's r_chain_length; larger "
        "values probe extrapolating the chain beyond training)",
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
        help="add independent frechet_b (second random-feature net) and "
        "KID x1000 columns per link",
    )
    a = p.parse_args(argv)
    from gea.utils.devices import acquire_devices

    # Wedged-relay guard: fail loudly within GEA_DEVICE_TIMEOUT
    # instead of hanging on the first device touch (VERDICT r3 #6).
    acquire_devices()

    cfg = TrainRIterativeConfig.load(os.path.join(a.load_path, "config.json"))
    generator = GeneratorLIS.from_config(cfg, r_iterations=0)
    reverter = Reverter.from_config(cfg)
    discriminator = Discriminator.from_config(cfg)
    step = a.step if a.step != 0 else None  # -1 = best.json
    restored = restore_checkpoint(a.load_path, target=None, step=step)
    g_vars = {"params": restored["params_g"], **(restored.get("extras_g") or {})}
    r_vars = {"params": restored["params_r"], **(restored.get("extras_r") or {})}
    d_vars = {"params": restored["params_d"], **(restored.get("extras_d") or {})}
    links = a.chain_length if a.chain_length is not None else cfg.r_chain_length
    n_links = links + 1  # link 0 = uncorrected G(z0)

    @jax.jit
    def chain_and_score(z, sn):
        imgs = iterative_chain(
            generator, reverter, g_vars, r_vars, z, sn, links
        )  # (links+1, B, H, W, 3)
        flat = imgs.reshape(-1, *imgs.shape[2:])
        scores = jax.nn.sigmoid(
            discriminator.apply(d_vars, flat, train=False)
        ).reshape(n_links, -1)
        return imgs, scores

    # Shared metric plumbing (MetricBundle): one extraction per batch
    # feeds every metric; reals decoded once (same as eval_stages).
    bundle = MetricBundle(
        cfg.image_size,
        extractor=a.extractor,
        inception_weights=a.inception_weights,
        second_opinion=a.second_opinion,
    )
    link_groups = [bundle.group() for _ in range(n_links)]
    d_scores = [[] for _ in range(n_links)]

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
        imgs, scores = chain_and_score(z, sn)
        scores = np.asarray(jax.device_get(scores))
        for t in range(n_links):
            d_scores[t].append(scores[t])
            link_groups[t].update(imgs[t])
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

    rows = []
    for t in range(n_links):
        row = {
            "link": t,
            "d_score_mean": round(
                float(np.mean(np.concatenate(d_scores[t]))), 4
            ),
        }
        row.update(bundle.row(link_groups[t]))
        rows.append(row)

    result = {
        "metric": bundle.label,
        # Provenance of the reference distribution: without it, a score
        # measured against the wrong reals is indistinguishable from a
        # real eval in the saved artifact.
        "real_dataset": a.dataset or cfg.dataset,
        "real_dataroot": a.dataroot or cfg.dataroot,
        "num_samples": a.num_samples,
        "lambda_r": cfg.lambda_r,
        "chain_length_trained": cfg.r_chain_length,
        "links": rows,
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
