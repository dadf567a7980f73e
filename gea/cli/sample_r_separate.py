"""R-separate sampler CLI (reference: the r_separate sampler script,
SURVEY.md §2 C8/C13): load a frozen generator and a trained reverser and
render the post-hoc error-avoidance correction — grids for the chain
G(z), G(R(G(z))), G(R(G(R(G(z))))), ... up to --correction_steps.

    python -m gea.cli.sample_r_separate --load_path runs/rsep \
        --save_path_samples out/rsep --count 64
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gea.config import TrainRSeparateConfig
from gea.cli.sample import load_generator, pad_to_batch
from gea.models import Reverter
from gea.utils.checkpoint import restore_checkpoint
from gea.utils.grids import save_stage_grids


def load_reverter(load_path: str, step=None):
    cfg = TrainRSeparateConfig.load(os.path.join(load_path, "config.json"))
    reverter = Reverter.from_config(cfg)
    restored = restore_checkpoint(load_path, target=None, step=step)
    variables = {"params": restored["params_r"], **(restored.get("extras_r") or {})}
    return reverter, variables, cfg


def run(
    load_path: str,
    save_path_samples: str,
    count: int = 64,
    batch_size: int = 64,
    seed: int = 0,
    grid_rows: int = 8,
    correction_steps: int = 2,
    correction_strength: float = 0.3,
    shell_renorm: bool = True,
    step: int = 0,
):
    reverter, r_vars, r_cfg = load_reverter(load_path, step=step or None)
    # Load the same frozen-G snapshot R was trained against (--g_step is
    # recorded in the R run's config; 0 = latest).
    generator, g_vars, _g_cfg = load_generator(
        r_cfg.g_path, step=getattr(r_cfg, "g_step", 0) or None
    )
    out_dir = save_path_samples or os.path.join(load_path, "samples_cli")
    os.makedirs(out_dir, exist_ok=True)

    from gea.models.reverter import blend_correction

    @jax.jit
    def correction_chain(z, sn):
        imgs = []
        for _ in range(correction_steps + 1):
            images, _ = generator.apply(
                g_vars, z, spatial_noise=sn, train=False, render_all_stages=True
            )
            img = images[-1]
            imgs.append(img)
            z_hat = reverter.apply(r_vars, img, train=False)
            # Similarity-constrained inference (blend + shell renorm) — a
            # pure MSE-trained R shrinks codes toward the mean, which
            # degrades renders (measured: FID 56 -> 15 with blend+renorm
            # on the round-1 demo run).
            z = blend_correction(z, z_hat, correction_strength, shell_renorm)
        return jnp.stack(imgs)

    rng = jax.random.PRNGKey(seed)
    done, batch_idx = 0, 0
    while done < count:
        n = min(batch_size, count - done)
        rng, z_rng, sn_rng = jax.random.split(rng, 3)
        z = jax.random.normal(z_rng, (n, r_cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(n)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )
        z, sn = pad_to_batch(z, sn, batch_size)  # ragged tail: no recompile
        imgs = np.asarray(jax.device_get(correction_chain(z, sn)))[:, :n]
        save_stage_grids(imgs, out_dir, batch_idx, rows=grid_rows)
        done += n
        batch_idx += 1
    print(f"[gea] wrote {batch_idx} correction-chain grid sets to {out_dir}")


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True, help="R-separate run dir")
    p.add_argument("--save_path_samples", default="")
    p.add_argument("--count", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--grid_rows", type=int, default=8)
    p.add_argument(
        "--correction_steps",
        type=int,
        default=2,
        help="number of R correction applications to visualize",
    )
    p.add_argument(
        "--correction_strength",
        type=float,
        default=0.3,
        help="blend weight toward R's corrected code (the similarity "
        "constraint applied at inference); 1.0 = pure R output",
    )
    p.add_argument(
        "--step", type=int, default=0,
        help="R checkpoint step to load (0 = latest)",
    )
    p.add_argument(
        "--shell_renorm",
        type=lambda v: v.lower() in ("1", "true", "yes"),
        default=True,
        help="project corrected codes back onto the Gaussian shell",
    )
    a = p.parse_args(argv)
    from gea.utils.devices import acquire_devices

    # Wedged-relay guard: fail loudly within GEA_DEVICE_TIMEOUT
    # instead of hanging on the first device touch (VERDICT r3 #6).
    acquire_devices()
    return run(
        a.load_path,
        a.save_path_samples,
        a.count,
        a.batch_size,
        a.seed,
        a.grid_rows,
        a.correction_steps,
        a.correction_strength,
        a.shell_renorm,
        a.step,
    )


if __name__ == "__main__":
    main()
