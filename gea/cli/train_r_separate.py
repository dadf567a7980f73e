"""R-separate trainer CLI (reference: `r_separate/train_r.py`, SURVEY.md
§3.4): train a reverser R against a FROZEN generator loaded from a finished
G-LIS run. The generator's architecture is taken from the G run's saved
config.json, not from this tool's flags — the cross-tool checkpoint
contract (SURVEY.md §7 hard part #7).

    python -m gea.cli.train_r_separate --g_path runs/glis3_80 \
        --save_path runs/rsep --niter 20000

R-separate needs NO real data: the frozen G is the data source, so the
whole step runs on device with an empty input pipeline.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gea.config import TrainRSeparateConfig
from gea.cli.sample import load_generator
from gea.models import Reverter
from gea.parallel.mesh import DATA_AXIS
from gea.train.runner import (
    TrainLoop,
    build_step_fn,
    check_batch,
    dispatch_chunk,
    dummy_input,
    maybe_resume,
    prepare_run,
    resolve_mesh,
    tp_shards,
)
from gea.train.state import GANTrainState, make_optimizer, param_count
from gea.train.steps_r import build_r_separate_step
from gea.utils.grids import save_stage_grids


def _architecture_from_g(cfg: TrainRSeparateConfig, g_cfg) -> TrainRSeparateConfig:
    """The reverser tool inherits every architecture field from the frozen
    generator's run config."""
    return cfg.replace(
        image_size=g_cfg.image_size,
        code_size=g_cfg.code_size,
        norm=g_cfg.norm,
        r_iterations=g_cfg.r_iterations,
        num_features=g_cfg.num_features,
        max_features=g_cfg.max_features,
        lis_hidden_mult=g_cfg.lis_hidden_mult,
        spatial_code=g_cfg.spatial_code,
        include_initial_image=g_cfg.include_initial_image,
        dtype=g_cfg.dtype,
    )


def create_r_state(cfg, reverter: Reverter, tx_r, seed: int) -> GANTrainState:
    rng = jax.random.PRNGKey(seed)
    r_init, rng = jax.random.split(rng)
    img = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    vars_r = reverter.init(r_init, img, train=True)
    params_r = vars_r["params"]
    extras_r = {k: v for k, v in vars_r.items() if k != "params"}
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        rng=rng,
        params_g={},
        params_d={},
        extras_g={},
        extras_d={},
        opt_g={},
        opt_d={},
        params_r=params_r,
        extras_r=extras_r,
        opt_r=tx_r.init(params_r),
    )


def make_vis_fn(cfg, generator, g_variables, reverter, run_dir: str):
    """Before/after correction grids: G(z) vs G(R(G(z))) — the
    error-avoidance payoff made visible (reference C13)."""
    n_vis = cfg.vis_rows * cfg.vis_rows
    rng = jax.random.PRNGKey(cfg.seed + 999)
    z_rng, sn_rng = jax.random.split(rng)
    z = jax.random.normal(z_rng, (n_vis, cfg.code_size), jnp.float32)
    sn_shape = generator.spatial_noise_shape(n_vis)
    sn = jax.random.normal(sn_rng, sn_shape, jnp.float32) if sn_shape else None

    @jax.jit
    def render_pair(params_r, extras_r):
        images, zs = generator.apply(
            g_variables, z, spatial_noise=sn, train=False,
            render_all_stages=True,
        )
        before = images[-1]
        z_corr = reverter.apply(
            {"params": params_r, **extras_r}, before, train=False
        )
        images2, _ = generator.apply(
            g_variables, z_corr, spatial_noise=sn, train=False,
            render_all_stages=True,
        )
        after = images2[-1]
        return jnp.stack([before, after])

    def vis(state, step: int) -> None:
        from gea.parallel.dp import local_copy

        # Multihost: lead-only render — use host-local replica copies
        # (same hazard train_glis.make_vis_fn documents).
        pair = np.asarray(
            jax.device_get(
                render_pair(local_copy(state.params_r), local_copy(state.extras_r))
            )
        )
        save_stage_grids(
            pair, os.path.join(run_dir, "samples"), step, rows=cfg.vis_rows
        )

    return vis


def make_fid_fn(cfg, g_cfg, generator, g_variables, reverter):
    """Corrected-sample proxy-FID (--fid_interval): score
    G(blend(z, R(G(z)))) — the sampler-default correction (strength 0.3 +
    Gaussian-shell renorm) — against the G run's dataset. Directly tracks
    whether R training is improving the correction, and pins the best R
    snapshot (best.json, --step -1)."""
    from gea.cli.compute_fid import real_batch_iter
    from gea.eval.fid import OnlineFID

    data_cfg = g_cfg.replace(batch_size=cfg.batch_size)
    online = OnlineFID(
        real_batch_iter(data_cfg, cfg.seed ^ 0xF1D),
        cfg.image_size,
        num_samples=cfg.fid_samples,
    )
    print(
        f"[gea] --fid_interval {cfg.fid_interval}: tracking corrected-"
        f"sample {online.label} over {cfg.fid_samples} samples "
        f"(strength {cfg.fid_correction_strength})"
    )
    from gea.models.reverter import blend_correction

    @jax.jit
    def corrected_final(params_r, extras_r, z, sn):
        images, _ = generator.apply(
            g_variables, z, spatial_noise=sn, train=False,
            render_all_stages=True,
        )
        z_hat = reverter.apply(
            {"params": params_r, **extras_r}, images[-1], train=False
        )
        z2 = blend_correction(z, z_hat, cfg.fid_correction_strength)
        images2, _ = generator.apply(
            g_variables, z2, spatial_noise=sn, train=False,
            render_all_stages=True,
        )
        return images2[-1]

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
                        corrected_final(state.params_r, state.extras_r, z, sn)
                    )
                )

        return online.score(fakes())

    return fid_fn


def run(cfg: TrainRSeparateConfig):
    if not cfg.g_path:
        raise SystemExit("--g_path (trained generator run dir) is required")
    # Architecture adoption needs only the G run's config (a file read);
    # prepare_run must come BEFORE the checkpoint restore because it is
    # what calls jax.distributed.initialize() under --multihost, and no
    # JAX computation may precede that.
    from gea.config import TrainGLISConfig

    g_cfg = TrainGLISConfig.load(os.path.join(cfg.g_path, "config.json"))
    cfg = _architecture_from_g(cfg, g_cfg)
    run_dir = prepare_run(cfg)
    generator, g_variables, g_cfg = load_generator(
        cfg.g_path, step=cfg.g_step or None
    )
    mesh = resolve_mesh(cfg)
    num_chips = mesh.devices.size if mesh is not None else 1
    check_batch(cfg, num_chips)

    reverter = Reverter.from_config(cfg)
    tx_r = make_optimizer(
        cfg.lr, cfg.beta1, cfg.beta2,
        schedule=cfg.lr_schedule, total_steps=cfg.niter, lr_final=cfg.lr_final,
    )
    state = create_r_state(cfg, reverter, tx_r, cfg.seed)
    print(f"[gea] R params: {param_count(state.params_r):,}  devices: {num_chips}")
    state, start_step = maybe_resume(cfg, state)

    discriminator, d_variables = None, None
    if cfg.r_adv_weight > 0 or cfg.r_mine_weight > 0:
        # D-feedback / defective-z mining need the G run's frozen D
        # (same checkpoint the generator came from).
        from gea.cli.sample import load_discriminator

        try:
            discriminator, d_variables = load_discriminator(
                cfg.g_path, step=cfg.g_step or None
            )
        except (KeyError, FileNotFoundError) as e:
            print(
                f"[gea] no discriminator in {cfg.g_path!r} ({e}); "
                "falling back to pure code-reconstruction MSE"
            )

    axis = DATA_AXIS if mesh is not None and tp_shards(cfg) == 1 else None
    step = build_r_separate_step(
        cfg,
        generator,
        reverter,
        g_variables,
        tx_r,
        axis_name=axis,
        discriminator=discriminator,
        frozen_d_variables=d_variables,
    )

    def step_no_input(state, raw, rng):
        return step(state, raw)

    state, step_fn = build_step_fn(cfg, mesh, state, step_no_input)

    vis = make_vis_fn(cfg, generator, g_variables, reverter, run_dir)
    is_lead = not cfg.multihost or jax.process_index() == 0
    fid_fn = (
        make_fid_fn(cfg, g_cfg, generator, g_variables, reverter)
        if cfg.fid_interval > 0 and is_lead
        else None
    )
    loop = TrainLoop(
        cfg,
        run_dir,
        state,
        step_fn,
        dummy_input(mesh, dispatch_chunk(cfg)),
        vis_fn=vis,
        num_chips=num_chips,
        loss_keys=("loss_r",),
        fid_fn=fid_fn,
    )
    final_state = loop.run(start_step)
    stats = loop.meter.stats(num_chips)
    print(f"[gea] done: {stats['images_per_sec']:.1f} img/s")
    return final_state, stats


def main(argv: Optional[list] = None):
    cfg = TrainRSeparateConfig.from_args(argv)
    return run(cfg)


if __name__ == "__main__":
    main()
