"""The ONE definition of the flagship benchmark workload.

bench.py (the driver-facing headline number), ab_step.py (interleaved A/B
probe), and mfu_probe.py (lowering experiments) must all measure the same
G-LIS-3 80x80 bf16 alternating step — three hand-synced copies of the
config literal had already drifted in small ways, which silently makes
probe rows incomparable with the headline. Edit the workload here only.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# BASELINE.json config-3 shape; batch sized for MXU occupancy on one chip.
FLAGSHIP = dict(
    image_size=80,
    code_size=256,
    r_iterations=3,
    norm="weight",
    num_features=64,
    max_features=512,
    dtype="bfloat16",
    dataset="synthetic",
    lr=2e-4,
    use_pallas=False,  # XLA lowering measured faster (benchmarks/KERNELS.md)
)


def flagship_config(batch: int, **overrides):
    from gea.config import TrainGLISConfig

    kw = dict(FLAGSHIP, batch_size=batch)
    kw.update(overrides)
    return TrainGLISConfig(**kw)


def build_flagship_step(cfg, share_g_forward=None, gen_overrides=None):
    """(state, jitted step) for the flagship alternating G+D train step."""
    from gea.models import Discriminator, GeneratorLIS
    from gea.train.state import create_glis_state, make_optimizer
    from gea.train.steps import build_glis_train_step

    generator = GeneratorLIS.from_config(cfg, **(gen_overrides or {}))
    discriminator = Discriminator.from_config(cfg)
    tx_g = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    tx_d = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    state = create_glis_state(cfg, generator, discriminator, tx_g, tx_d, 0)
    step = jax.jit(
        build_glis_train_step(
            cfg, generator, discriminator, tx_g, tx_d,
            share_g_forward=share_g_forward,
        ),
        donate_argnums=0,
    )
    return state, step


def flagship_real_batch(cfg):
    """The deterministic synthetic 'real' batch every probe times against."""
    return jax.device_put(
        jnp.asarray(
            np.random.default_rng(0)
            .uniform(-1, 1, (cfg.batch_size, cfg.image_size, cfg.image_size, 3))
            .astype(np.float32)
        )
    )
