"""Train state containers.

The reference keeps G/D (and R) modules + two/three Adam optimizers as
mutable Python objects in the training script (`g_lis/train.py`,
SURVEY.md §3.1). TPU-native equivalent: ONE immutable pytree holding every
piece of training state — params, optimizer states, extra variable
collections (batch_stats when --norm batch), the step counter and the PRNG
key — so the whole step is a pure function `state -> state` that jit/
shard_map can transform, donate, and shard.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gea.config import ModelConfig
from gea.models import Discriminator, GeneratorLIS, Reverter


@struct.dataclass
class GANTrainState:
    step: jnp.ndarray
    rng: jax.Array
    params_g: Any
    params_d: Any
    extras_g: Dict[str, Any]  # e.g. {"batch_stats": ...}; {} for weight norm
    extras_d: Dict[str, Any]
    opt_g: optax.OptState
    opt_d: optax.OptState
    # R-tools only; None-like empty dicts otherwise so the pytree is uniform.
    params_r: Any = None
    extras_r: Any = None
    opt_r: Any = None
    # EMA shadow of params_g (--g_ema > 0); {} when disabled so old
    # checkpoints stay restorable (an empty subtree has no leaves to read).
    params_g_ema: Any = None


def make_optimizer(
    lr: float,
    beta1: float,
    beta2: float,
    schedule: str = "constant",
    total_steps: int = 0,
    lr_final: float = 0.0,
) -> optax.GradientTransformation:
    """Adam with DCGAN betas — matches the reference trainers' optimizer
    choice (`g_lis/train.py` Adam(G.params), Adam(D.params), SURVEY.md §3.1).

    `schedule` (beyond-reference, round 5): "cosine" or "linear" decays the
    learning rate from `lr` to `lr_final * lr` over `total_steps` optimizer
    updates. The decay rides optax's per-state update count, so a resumed
    run continues the schedule exactly where the checkpointed opt state
    left off (the GAN convergence-scale recipe from the recall
    investigation, docs/RESULTS.md round 5)."""
    if schedule == "constant" or total_steps <= 0:
        return optax.adam(lr, b1=beta1, b2=beta2)
    floor = lr * lr_final
    if schedule == "cosine":
        sched = optax.cosine_decay_schedule(
            init_value=lr, decay_steps=total_steps, alpha=lr_final
        )
    elif schedule == "linear":
        sched = optax.linear_schedule(
            init_value=lr, end_value=floor, transition_steps=total_steps
        )
    else:
        raise ValueError(f"unknown lr schedule {schedule!r}")
    return optax.adam(sched, b1=beta1, b2=beta2)


def _split_variables(variables: Any) -> Tuple[Any, Dict[str, Any]]:
    params = variables["params"]
    extras = {k: v for k, v in variables.items() if k != "params"}
    return params, extras


def create_glis_state(
    cfg: Any,
    generator: GeneratorLIS,
    discriminator: Discriminator,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    seed: int,
) -> GANTrainState:
    rng = jax.random.PRNGKey(seed)
    rng, g_init, d_init = jax.random.split(rng, 3)
    z = jnp.zeros((2, cfg.code_size), jnp.float32)
    sn_shape = generator.spatial_noise_shape(2)
    sn = jnp.zeros(sn_shape, jnp.float32) if sn_shape else None
    vars_g = generator.init(g_init, z, spatial_noise=sn, train=True)
    params_g, extras_g = _split_variables(vars_g)

    img = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    vars_d = discriminator.init(d_init, img, train=True)
    params_d, extras_d = _split_variables(vars_d)

    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        rng=rng,
        params_g=params_g,
        params_d=params_d,
        extras_g=extras_g,
        extras_d=extras_d,
        opt_g=tx_g.init(params_g),
        opt_d=tx_d.init(params_d),
        params_r={},
        extras_r={},
        opt_r={},
        params_g_ema=(
            jax.tree_util.tree_map(jnp.copy, params_g)
            if getattr(cfg, "g_ema", 0.0) > 0
            else {}
        ),
    )


def add_reverter(
    state: GANTrainState,
    cfg: Any,
    reverter: Reverter,
    tx_r: optax.GradientTransformation,
    seed: int,
) -> GANTrainState:
    r_init = jax.random.PRNGKey(seed + 101)
    img = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
    vars_r = reverter.init(r_init, img, train=True)
    params_r, extras_r = _split_variables(vars_r)
    return state.replace(
        params_r=params_r, extras_r=extras_r, opt_r=tx_r.init(params_r)
    )


def param_count(tree: Any) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
