"""Interpolation sampler CLI (reference: `g_lis/sample_interpolations.py`,
SURVEY.md §2 C6): walk between pairs of noise vectors (spherical or linear
interpolation) and render the walk per LIS stage — each output grid has one
row per interpolation walk.

    python -m gea.cli.sample_interpolations --load_path runs/glis3_80 \
        --save_path_samples out/interp --interp_pairs 8 --interp_points 10
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gea.config import SampleInterpolationsConfig
from gea.cli.sample import load_generator
from gea.utils.grids import tile_grid, to_uint8


def slerp(z_a: jnp.ndarray, z_b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Spherical interpolation — the standard GAN latent-walk geodesic
    (high-dim gaussian mass lives on a shell, so lerp leaves the data
    manifold; slerp stays on it)."""
    a = z_a / jnp.linalg.norm(z_a, axis=-1, keepdims=True)
    b = z_b / jnp.linalg.norm(z_b, axis=-1, keepdims=True)
    omega = jnp.arccos(jnp.clip(jnp.sum(a * b, axis=-1, keepdims=True), -1, 1))
    so = jnp.sin(omega)
    t = t[..., None]
    # Nearly-parallel pairs (omega -> 0) make sin(omega) -> 0: fall back to
    # lerp there instead of dividing by ~0 and emitting NaN frames.
    safe_so = jnp.where(so < 1e-6, 1.0, so)
    spherical = (
        jnp.sin((1.0 - t) * omega) / safe_so * z_a
        + jnp.sin(t * omega) / safe_so * z_b
    )
    linear = (1.0 - t) * z_a + t * z_b
    return jnp.where(so < 1e-6, linear, spherical)


def run(cfg: SampleInterpolationsConfig):
    step = cfg.step if cfg.step != 0 else None  # -1 = best.json
    generator, variables, train_cfg = load_generator(
        cfg.load_path, step=step, use_ema=getattr(cfg, "use_ema", False)
    )
    out_dir = cfg.save_path_samples or os.path.join(cfg.load_path, "interp_cli")
    os.makedirs(out_dir, exist_ok=True)

    rng = jax.random.PRNGKey(cfg.seed)
    z_rng, sn_rng = jax.random.split(rng)
    pairs = jax.random.normal(
        z_rng, (2, cfg.interp_pairs, train_cfg.code_size), jnp.float32
    )
    t = jnp.linspace(0.0, 1.0, cfg.interp_points)
    # (pairs, points, code)
    if cfg.interp_mode == "slerp":
        walk = jax.vmap(
            lambda za, zb: slerp(za[None, :], zb[None, :], t)
        )(pairs[0], pairs[1])
    else:
        walk = jax.vmap(
            lambda za, zb: za[None, :] * (1 - t[:, None]) + zb[None, :] * t[:, None]
        )(pairs[0], pairs[1])
    z = walk.reshape(-1, train_cfg.code_size)

    # One spatial-noise draw PER PAIR, tiled across that pair's points:
    # independent noise per frame would make adjacent frames differ by
    # noise resampling instead of latent movement — flicker, not a walk.
    sn_shape = generator.spatial_noise_shape(cfg.interp_pairs)
    if sn_shape:
        sn_pair = jax.random.normal(sn_rng, sn_shape, jnp.float32)
        sn = jnp.repeat(sn_pair, cfg.interp_points, axis=0)
    else:
        sn = None
    images = np.asarray(
        jax.device_get(generator.render(variables, z, spatial_noise=sn)[0])
    )
    # (S, pairs*points, H, W, 3): one grid per stage, one row per pair.
    for s in range(images.shape[0]):
        from PIL import Image

        grid = tile_grid(to_uint8(images[s]), rows=cfg.interp_pairs)
        Image.fromarray(grid).save(
            os.path.join(out_dir, f"interpolation_stage{s}.png")
        )
    print(f"[gea] wrote {images.shape[0]} interpolation grids to {out_dir}")


def main(argv: Optional[list] = None):
    cfg = SampleInterpolationsConfig.from_args(argv)
    from gea.utils.devices import acquire_devices

    # Wedged-relay guard: fail loudly within GEA_DEVICE_TIMEOUT
    # instead of hanging on the first device touch (VERDICT r3 #6).
    acquire_devices()
    if not cfg.load_path:
        raise SystemExit("--load_path is required")
    return run(cfg)


if __name__ == "__main__":
    main()
