"""R-iterative sampler CLI (reference: `r_iterative/sample.py`, SURVEY.md
§2 C7): load a jointly-trained G/R pair and render the iterative correction
chain z_t = z_{t-1} + R(G(z_{t-1})) — one grid per link.

    python -m gea.cli.sample_r_iterative --load_path runs/riter \
        --save_path_samples out/riter --chain_length 3
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gea.cli.sample import pad_to_batch
from gea.config import TrainRIterativeConfig
from gea.models import GeneratorLIS, Reverter
from gea.utils.checkpoint import restore_checkpoint
from gea.utils.grids import save_stage_grids


def run(
    load_path: str,
    save_path_samples: str,
    count: int = 64,
    batch_size: int = 64,
    seed: int = 0,
    grid_rows: int = 8,
    chain_length: Optional[int] = None,
    step: int = 0,
):
    cfg = TrainRIterativeConfig.load(os.path.join(load_path, "config.json"))
    generator = GeneratorLIS.from_config(cfg, r_iterations=0)
    reverter = Reverter.from_config(cfg)
    restored = restore_checkpoint(load_path, target=None, step=step or None)
    g_vars = {"params": restored["params_g"], **(restored.get("extras_g") or {})}
    r_vars = {"params": restored["params_r"], **(restored.get("extras_r") or {})}
    links = chain_length if chain_length is not None else cfg.r_chain_length
    out_dir = save_path_samples or os.path.join(load_path, "samples_cli")
    os.makedirs(out_dir, exist_ok=True)

    from gea.models.reverter import iterative_chain

    @jax.jit
    def chain(z, sn):
        return iterative_chain(generator, reverter, g_vars, r_vars, z, sn, links)

    rng = jax.random.PRNGKey(seed)
    done, batch_idx = 0, 0
    while done < count:
        n = min(batch_size, count - done)
        rng, z_rng, sn_rng = jax.random.split(rng, 3)
        z = jax.random.normal(z_rng, (n, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(n)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )
        z, sn = pad_to_batch(z, sn, batch_size)  # ragged tail: no recompile
        imgs = np.asarray(jax.device_get(chain(z, sn)))[:, :n]
        save_stage_grids(imgs, out_dir, batch_idx, rows=grid_rows)
        done += n
        batch_idx += 1
    print(f"[gea] wrote {batch_idx} chain grid sets to {out_dir}")


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True, help="R-iterative run dir")
    p.add_argument("--save_path_samples", default="")
    p.add_argument("--count", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--grid_rows", type=int, default=8)
    p.add_argument("--chain_length", type=int, default=None)
    p.add_argument(
        "--step", type=int, default=0,
        help="checkpoint step to load (0 = latest)",
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
        a.chain_length,
        a.step,
    )


if __name__ == "__main__":
    main()
