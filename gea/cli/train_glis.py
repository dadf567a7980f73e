"""G-LIS trainer CLI (reference: `g_lis/train.py`, SURVEY.md §3.1).

Example (BASELINE.json config 3 — G-LIS, 3 LIS modules, 80x80):

    python -m gea.cli.train_glis \
        --dataset folder --dataroot /data/celeba --crop_size 160 \
        --image_size 80 --code_size 256 --norm weight --r_iterations 3 \
        --save_path runs/glis3_80

Synthetic smoke run (config 1, CPU-runnable):

    python -m gea.cli.train_glis --dataset synthetic --image_size 64 \
        --r_iterations 0 --batch_size 16 --niter 50 --save_path /tmp/run
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gea.config import TrainGLISConfig
from gea.models import Discriminator, GeneratorLIS
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
from gea.train.state import create_glis_state, make_optimizer, param_count
from gea.train.steps import build_glis_train_step
from gea.utils.grids import save_stage_grids


def build_models(cfg: TrainGLISConfig):
    generator = GeneratorLIS.from_config(cfg)
    discriminator = Discriminator.from_config(cfg)
    return generator, discriminator


def make_vis_fn(cfg, generator, run_dir: str):
    """Fixed eval-noise per-stage sample grids (reference C11)."""
    n_vis = cfg.vis_rows * cfg.vis_rows
    vis_rng = jax.random.PRNGKey(cfg.seed + 999)
    z_rng, sn_rng = jax.random.split(vis_rng)
    z = jax.random.normal(z_rng, (n_vis, cfg.code_size), jnp.float32)
    sn_shape = generator.spatial_noise_shape(n_vis)
    sn = (
        jax.random.normal(sn_rng, sn_shape, jnp.float32) if sn_shape else None
    )

    @jax.jit
    def render(params_g, extras_g):
        images, _ = generator.render({"params": params_g, **extras_g}, z, sn)
        return images

    def vis(state, step: int) -> None:
        from gea.parallel.dp import local_copy

        # Multihost: vis runs on the lead only — fetch a host-local copy
        # of the replicated params so the render is a local computation.
        images = np.asarray(
            jax.device_get(
                render(local_copy(state.params_g), local_copy(state.extras_g))
            )
        )
        save_stage_grids(
            images, os.path.join(run_dir, "samples"), step, rows=cfg.vis_rows
        )

    return vis


def make_fid_fn(cfg, generator):
    """In-training proxy-FID of the final LIS stage (--fid_interval):
    real-side moments from the training dataset once, fake side rendered
    from the live params at a fixed eval seed each call."""
    # Same real-side iterator as the offline evaluator (compute_fid) —
    # in-training scores and post-hoc scores must see the identical real
    # distribution or best-snapshot pinning silently drifts.
    from gea.cli.compute_fid import real_batch_iter
    from gea.eval.fid import OnlineFID

    online = OnlineFID(
        real_batch_iter(cfg, cfg.seed ^ 0xF1D),
        cfg.image_size,
        num_samples=cfg.fid_samples,
        extractor="auto",
    )
    print(
        f"[gea] --fid_interval {cfg.fid_interval}: tracking "
        f"{online.label} over {cfg.fid_samples} samples"
    )

    @jax.jit
    def render_final(params_g, extras_g, z, sn):
        images, _ = generator.render({"params": params_g, **extras_g}, z, sn)
        return images[-1]

    # With --g_ema, score the EMA shadow: --use_ema sampling is the
    # artifact the user ships, so best.json must pin the step where THAT
    # copy scores best, not the live params.
    score_ema = getattr(cfg, "g_ema", 0.0) > 0

    def fid_fn(state) -> float:
        from gea.parallel.dp import local_copy

        rng = jax.random.PRNGKey(cfg.seed ^ 0xFAD)
        params = local_copy(
            state.params_g_ema if score_ema else state.params_g
        )
        state = state.replace(extras_g=local_copy(state.extras_g))

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
                        render_final(params, state.extras_g, z, sn)
                    )
                )

        return online.score(fakes())

    return fid_fn


def run(cfg: TrainGLISConfig):
    run_dir = prepare_run(cfg)
    mesh = resolve_mesh(cfg)
    num_chips = mesh.devices.size if mesh is not None else 1
    check_batch(cfg, num_chips)

    generator, discriminator = build_models(cfg)
    tx_g = make_optimizer(
        cfg.lr, cfg.beta1, cfg.beta2,
        schedule=cfg.lr_schedule, total_steps=cfg.niter, lr_final=cfg.lr_final,
    )
    tx_d = make_optimizer(
        cfg.lr, cfg.beta1, cfg.beta2,
        schedule=cfg.lr_schedule, total_steps=cfg.niter, lr_final=cfg.lr_final,
    )
    state = create_glis_state(cfg, generator, discriminator, tx_g, tx_d, cfg.seed)
    print(
        f"[gea] G params: {param_count(state.params_g):,}  "
        f"D params: {param_count(state.params_d):,}  "
        f"devices: {num_chips}  stages/step: {generator.n_stages}"
    )
    state, start_step = maybe_resume(cfg, state)

    # GSPMD tp (--model_shards): the step keeps single-program semantics
    # (axis_name=None) and jit's sharding annotations partition it.
    axis = DATA_AXIS if mesh is not None and tp_shards(cfg) == 1 else None
    step = build_glis_train_step(
        cfg, generator, discriminator, tx_g, tx_d, axis_name=axis
    )
    fused = fuse_input_pipeline(cfg, step, axis_name=axis)
    state, step_fn = build_step_fn(cfg, mesh, state, fused)

    data_iter = input_iterator(cfg, mesh, cfg.seed, start_step=start_step)
    vis = make_vis_fn(cfg, generator, run_dir)
    # Only the lead process evaluates FID (TrainLoop gates the calls on
    # is_lead); skip the real-stats precompute on followers entirely.
    is_lead = not cfg.multihost or jax.process_index() == 0
    fid_fn = (
        make_fid_fn(cfg, generator)
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
    cfg = TrainGLISConfig.from_args(argv)
    return run(cfg)


if __name__ == "__main__":
    main()
