"""R-iterative trainer CLI (reference: `r_iterative/train.py`, SURVEY.md
§3.3): joint G/D/R training where the reverser correction chain
z_t = z_{t-1} + R(G(z_{t-1})) is unrolled inside every step and the
similarity penalty lambda_r keeps corrected codes near the originals.

    python -m gea.cli.train_r_iterative --dataset folder --dataroot /data/celeba \
        --image_size 80 --crop_size 160 --r_chain_length 2 --lambda_r 0.9 \
        --save_path runs/riter
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gea.config import TrainRIterativeConfig
from gea.models import Discriminator, GeneratorLIS, Reverter
from gea.parallel.mesh import DATA_AXIS
from gea.train.runner import (
    TrainLoop,
    build_step_fn,
    check_batch,
    fuse_input_pipeline,
    input_iterator,
    maybe_resume,
    prepare_run,
    resolve_mesh,
    tp_shards,
)
from gea.train.state import add_reverter, create_glis_state, make_optimizer, param_count
from gea.train.steps_r import build_r_iterative_step
from gea.utils.grids import save_stage_grids


def build_models(cfg: TrainRIterativeConfig):
    # The R-iterative approach uses a plain generator (no LIS modules) —
    # the input-space correction comes from R, not from LIS (SURVEY.md §0).
    generator = GeneratorLIS.from_config(cfg, r_iterations=0)
    discriminator = Discriminator.from_config(cfg)
    reverter = Reverter.from_config(cfg)
    return generator, discriminator, reverter


def make_vis_fn(cfg, generator, reverter, run_dir: str):
    """Per-link correction-chain grids: G(z_0), G(z_1), ..., G(z_T)."""
    n_vis = cfg.vis_rows * cfg.vis_rows
    rng = jax.random.PRNGKey(cfg.seed + 999)
    z_rng, sn_rng = jax.random.split(rng)
    z0 = jax.random.normal(z_rng, (n_vis, cfg.code_size), jnp.float32)
    sn_shape = generator.spatial_noise_shape(n_vis)
    sn = jax.random.normal(sn_rng, sn_shape, jnp.float32) if sn_shape else None

    from gea.models.reverter import iterative_chain

    @jax.jit
    def render_chain(params_g, extras_g, params_r, extras_r):
        g_vars = {"params": params_g, **extras_g}
        r_vars = {"params": params_r, **extras_r}
        return iterative_chain(
            generator, reverter, g_vars, r_vars, z0, sn, cfg.r_chain_length
        )

    def vis(state, step: int) -> None:
        from gea.parallel.dp import local_copy

        # Multihost: vis runs on the lead only — fetch a host-local copy
        # of the replicated params so the render is a local computation
        # (same hazard train_glis.make_vis_fn documents).
        imgs = np.asarray(
            jax.device_get(
                render_chain(
                    local_copy(state.params_g), local_copy(state.extras_g),
                    local_copy(state.params_r), local_copy(state.extras_r),
                )
            )
        )
        save_stage_grids(
            imgs, os.path.join(run_dir, "samples"), step, rows=cfg.vis_rows
        )

    return vis


def make_fid_fn(cfg, generator, reverter):
    """--fid_interval for R-iterative: proxy-FID of the END of the
    correction chain G(z_T) against the training data, pinning the best
    joint G/R snapshot (best.json, --step -1)."""
    from gea.cli.compute_fid import real_batch_iter
    from gea.eval.fid import OnlineFID
    from gea.models.reverter import iterative_chain

    data_cfg = cfg  # the trainer's own dataset flags
    online = OnlineFID(
        real_batch_iter(data_cfg, cfg.seed ^ 0xF1D),
        cfg.image_size,
        num_samples=cfg.fid_samples,
    )
    print(
        f"[gea] --fid_interval {cfg.fid_interval}: tracking chain-end "
        f"{online.label} over {cfg.fid_samples} samples"
    )

    @jax.jit
    def chain_final(params_g, extras_g, params_r, extras_r, z, sn):
        imgs = iterative_chain(
            generator,
            reverter,
            {"params": params_g, **extras_g},
            {"params": params_r, **extras_r},
            z,
            sn,
            cfg.r_chain_length,
        )
        return imgs[-1]

    def fid_fn(state) -> float:
        rng = jax.random.PRNGKey(cfg.seed ^ 0xFAD)

        def fakes():
            nonlocal rng
            while True:
                rng, z_rng, sn_rng = jax.random.split(rng, 3)
                z = jax.random.normal(
                    z_rng, (cfg.batch_size, cfg.code_size), jnp.float32
                )
                sn_shape = generator.spatial_noise_shape(cfg.batch_size)
                sn = (
                    jax.random.normal(sn_rng, sn_shape, jnp.float32)
                    if sn_shape
                    else None
                )
                yield np.asarray(
                    jax.device_get(
                        chain_final(
                            state.params_g, state.extras_g,
                            state.params_r, state.extras_r, z, sn,
                        )
                    )
                )

        return online.score(fakes())

    return fid_fn


def run(cfg: TrainRIterativeConfig):
    run_dir = prepare_run(cfg)
    mesh = resolve_mesh(cfg)
    num_chips = mesh.devices.size if mesh is not None else 1
    check_batch(cfg, num_chips)

    generator, discriminator, reverter = build_models(cfg)
    tx_g = make_optimizer(
        cfg.lr, cfg.beta1, cfg.beta2,
        schedule=cfg.lr_schedule, total_steps=cfg.niter, lr_final=cfg.lr_final,
    )
    tx_d = make_optimizer(
        cfg.lr, cfg.beta1, cfg.beta2,
        schedule=cfg.lr_schedule, total_steps=cfg.niter, lr_final=cfg.lr_final,
    )
    tx_r = make_optimizer(
        cfg.lr, cfg.beta1, cfg.beta2,
        schedule=cfg.lr_schedule, total_steps=cfg.niter, lr_final=cfg.lr_final,
    )
    state = create_glis_state(cfg, generator, discriminator, tx_g, tx_d, cfg.seed)
    state = add_reverter(state, cfg, reverter, tx_r, cfg.seed)
    print(
        f"[gea] G {param_count(state.params_g):,} | D {param_count(state.params_d):,}"
        f" | R {param_count(state.params_r):,} params, devices: {num_chips}"
    )
    state, start_step = maybe_resume(cfg, state)

    axis = DATA_AXIS if mesh is not None and tp_shards(cfg) == 1 else None
    step = build_r_iterative_step(
        cfg, generator, discriminator, reverter, tx_g, tx_d, tx_r, axis_name=axis
    )
    fused = fuse_input_pipeline(cfg, step, axis_name=axis)
    state, step_fn = build_step_fn(cfg, mesh, state, fused)

    data_iter = input_iterator(cfg, mesh, cfg.seed, start_step=start_step)
    vis = make_vis_fn(cfg, generator, reverter, run_dir)
    is_lead = not cfg.multihost or jax.process_index() == 0
    fid_fn = (
        make_fid_fn(cfg, generator, reverter)
        if cfg.fid_interval > 0 and is_lead
        else None
    )
    loop = TrainLoop(
        cfg,
        run_dir,
        state,
        step_fn,
        data_iter,
        vis_fn=vis,
        num_chips=num_chips,
        loss_keys=("loss_d", "loss_g", "loss_r_sim"),
        fid_fn=fid_fn,
    )
    final_state = loop.run(start_step)
    stats = loop.meter.stats(num_chips)
    print(
        f"[gea] done: {stats['images_per_sec']:.1f} img/s "
        f"({stats['images_per_sec_per_chip']:.1f}/chip)"
    )
    return final_state, stats


def main(argv: Optional[list] = None):
    cfg = TrainRIterativeConfig.from_args(argv)
    return run(cfg)


if __name__ == "__main__":
    main()
