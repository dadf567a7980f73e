"""Per-stage grid sampler CLI (reference: `g_lis/sample.py`, SURVEY.md
§3.2): load a trained G-LIS run, render image grids for every LIS stage so
the error-avoidance progression is visible (reference C6/C13).

    python -m gea.cli.sample --load_path runs/glis3_80 \
        --save_path_samples out/samples --count 64
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gea.config import SampleConfig, TrainGLISConfig
from gea.models import GeneratorLIS
from gea.utils.checkpoint import restore_checkpoint
from gea.utils.grids import save_stage_gif, save_stage_grids


def pad_to_batch(z, sn, batch_size: int):
    """Pad a ragged final batch up to the compiled batch shape (callers
    slice outputs back to the true count): a new input shape would
    recompile the whole unrolled render/correction chain for one batch —
    minutes on a tunneled chip. Shared by both R samplers."""
    n = z.shape[0]
    if n == batch_size:
        return z, sn
    pad = batch_size - n
    z = jnp.concatenate([z, jnp.zeros((pad, z.shape[1]), z.dtype)])
    if sn is not None:
        sn = jnp.concatenate([sn, jnp.zeros((pad, *sn.shape[1:]), sn.dtype)])
    return z, sn


def load_generator(
    load_path: str,
    step: Optional[int] = None,
    restored: Optional[dict] = None,
    use_ema: bool = False,
) -> Tuple[GeneratorLIS, Dict[str, Any], TrainGLISConfig]:
    """Rebuild the generator from a run dir's config.json + a checkpoint
    (latest by default, or an explicit --step — GAN quality is
    non-monotone, so snapshot selection matters). This is the cross-tool
    checkpoint contract (SURVEY.md §7 hard part #7) that R-separate also
    relies on. `use_ema` selects the EMA shadow params (--g_ema runs)."""
    train_cfg = TrainGLISConfig.load(os.path.join(load_path, "config.json"))
    generator = GeneratorLIS.from_config(train_cfg)
    if restored is None:
        restored = restore_checkpoint(load_path, target=None, step=step)
    if use_ema:
        params_g = restored.get("params_g_ema")
        if not params_g:
            raise SystemExit(
                f"--use_ema: checkpoint under {load_path!r} has no EMA "
                "params (train with --g_ema > 0)"
            )
    else:
        params_g = restored["params_g"]
    extras_g = restored.get("extras_g") or {}
    variables = {"params": params_g, **extras_g}
    return generator, variables, train_cfg


def load_discriminator(
    load_path: str, step: Optional[int] = None, restored: Optional[dict] = None
):
    """Rebuild the run's discriminator from the same checkpoint — used by
    the error-avoidance resampling filter."""
    from gea.models import Discriminator

    train_cfg = TrainGLISConfig.load(os.path.join(load_path, "config.json"))
    discriminator = Discriminator.from_config(train_cfg)
    if restored is None:
        restored = restore_checkpoint(load_path, target=None, step=step)
    variables = {
        "params": restored["params_d"],
        **(restored.get("extras_d") or {}),
    }
    return discriminator, variables


def run(cfg: SampleConfig):
    step = cfg.step if cfg.step != 0 else None  # -1 = best.json
    restored = restore_checkpoint(cfg.load_path, target=None, step=step)
    generator, variables, train_cfg = load_generator(
        cfg.load_path,
        step=step,
        restored=restored,
        use_ema=getattr(cfg, "use_ema", False),
    )
    out_dir = cfg.save_path_samples or os.path.join(cfg.load_path, "samples_cli")
    os.makedirs(out_dir, exist_ok=True)

    oversample = max(1, cfg.oversample) if cfg.d_filter else 1
    if cfg.d_filter:
        # --d_filter_step: score with a D snapshot from an earlier step —
        # a less overfit judge of realism than the final D (the top-k
        # filter on the final D raises per-sample realism but narrows the
        # distribution; see docs/RESULTS.md ablations). `!= 0` so that -1
        # selects the best.json snapshot, matching the --step convention
        # and compute_fid's `a.d_filter_step or a.step` (ADVICE.md r2).
        d_step = cfg.d_filter_step if cfg.d_filter_step != 0 else step
        if cfg.d_threshold > 0 and getattr(train_cfg, "gan_loss", "bce") != "bce":
            # Hinge-trained discriminators emit uncalibrated margins, so
            # sigmoid(logit) >= threshold has no probability semantics
            # (top-k ranking is unaffected) — warn instead of silently
            # applying a miscalibrated cutoff (ADVICE.md r2).
            print(
                f"[gea] warning: this run was trained with --gan_loss "
                f"{train_cfg.gan_loss}; --d_threshold compares "
                "sigmoid(margin) against an absolute cutoff, which is "
                "uncalibrated for non-BCE objectives — treat the "
                "threshold as a unitless knob, not a probability"
            )
        discriminator, d_vars = load_discriminator(
            cfg.load_path,
            step=d_step,
            restored=restored if d_step == step else None,
        )

        if cfg.d_threshold > 0:
            # Absolute-quality rejection sampling: keep candidates whose
            # D score clears the threshold, rendering more batches until
            # the count fills (reference C13 'error-avoidance resampling'
            # as true rejection sampling rather than relative top-k).
            @jax.jit
            def render_scored(z, sn):
                images, _ = generator.render(variables, z, spatial_noise=sn)
                scores = jax.nn.sigmoid(
                    discriminator.apply(d_vars, images[-1], train=False)
                )
                return images, scores

            def render(z, sn, _rng=[jax.random.PRNGKey(cfg.seed + 1)]):
                n_keep = z.shape[0] // oversample
                kept = []
                # Running top-n_keep reject buffer: holding every reject
                # across 20 rounds would pin O(rounds * batch * stages *
                # H^2) host memory; the fill path only ever needs the
                # best n_keep of them.
                pool, pool_scores = None, None
                for _ in range(20):  # bounded host loop
                    images, scores = jax.device_get(render_scored(z, sn))
                    ok = scores >= cfg.d_threshold
                    kept.append(images[:, ok])
                    rej, rej_scores = images[:, ~ok], scores[~ok]
                    if pool is None:
                        pool, pool_scores = rej, rej_scores
                    else:
                        pool = np.concatenate([pool, rej], axis=1)
                        pool_scores = np.concatenate([pool_scores, rej_scores])
                    top = np.argsort(pool_scores)[::-1][:n_keep]
                    pool, pool_scores = pool[:, top], pool_scores[top]
                    if sum(k.shape[1] for k in kept) >= n_keep:
                        break
                    _rng[0], z_rng, sn_rng = jax.random.split(_rng[0], 3)
                    z = jax.random.normal(z_rng, z.shape, z.dtype)
                    if sn is not None:
                        sn = jax.random.normal(sn_rng, sn.shape, sn.dtype)
                out = np.concatenate(kept, axis=1)
                if out.shape[1] < n_keep:
                    # Threshold too strict for this G: fill the remainder
                    # with the best-scoring rejects and say so.
                    need = n_keep - out.shape[1]
                    print(
                        f"[gea] d_threshold={cfg.d_threshold}: only "
                        f"{out.shape[1]}/{n_keep} candidates cleared it; "
                        f"filling {need} from the best rejects"
                    )
                    out = np.concatenate([out, pool[:, :need]], axis=1)
                return out[:, :n_keep]

        else:

            @jax.jit
            def render(z, sn):
                """Error-avoidance resampling (reference C13): render
                `oversample`x candidates, score the FINAL LIS stage with the
                trained discriminator, and keep the best batch — defective
                z's that even the LIS chain could not rescue are dropped."""
                images, _ = generator.render(variables, z, spatial_noise=sn)
                scores = discriminator.apply(d_vars, images[-1], train=False)
                n_keep = z.shape[0] // oversample
                _, keep = jax.lax.top_k(scores, n_keep)
                return images[:, keep]

    else:
        render = jax.jit(
            lambda z, sn: generator.render(variables, z, spatial_noise=sn)[0]
        )
    rng = jax.random.PRNGKey(cfg.seed)
    done = 0
    batch_idx = 0
    while done < cfg.count:
        n = min(cfg.batch_size, cfg.count - done)
        rng, z_rng, sn_rng = jax.random.split(rng, 3)
        z = jax.random.normal(
            z_rng, (n * oversample, train_cfg.code_size), jnp.float32
        )
        sn_shape = generator.spatial_noise_shape(n * oversample)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )
        images = np.asarray(jax.device_get(render(z, sn)))
        save_stage_grids(images, out_dir, batch_idx, rows=cfg.grid_rows)
        if cfg.save_gif:
            save_stage_gif(
                images,
                os.path.join(out_dir, f"progression_{batch_idx:08d}.gif"),
                rows=cfg.grid_rows,
            )
        done += n
        batch_idx += 1
    print(f"[gea] wrote {batch_idx} per-stage grid sets to {out_dir}")


def main(argv: Optional[list] = None):
    cfg = SampleConfig.from_args(argv)
    from gea.utils.devices import acquire_devices

    # Wedged-relay guard: fail loudly within GEA_DEVICE_TIMEOUT
    # instead of hanging on the first device touch (VERDICT r3 #6).
    acquire_devices()
    if not cfg.load_path:
        raise SystemExit("--load_path is required")
    return run(cfg)


if __name__ == "__main__":
    main()
