"""Reverser network R (reference C7/C8: `r_iterative/common.py` and the
r_separate models — citations approximate, reference mount empty; see
SURVEY.md §0).

R maps a generated image back to a (corrected) noise vector: a conv encoder
mirroring the discriminator trunk, followed by an FC head onto the code
space. Used two ways (SURVEY.md §0):

* **R-iterative** — trained jointly with G/D; applied in a chain
  ``z_{t+1} = z_t + R(G(z_t))`` with a similarity penalty keeping z_{t+1}
  near z_t.
* **R-separate** — trained after G has finished, against a frozen G; purely
  post-hoc input-space correction at inference.

One module, two output contracts — be explicit when wiring R:

* **R-iterative treats R's output as a residual Δz**: the chain composes
  ``z_{t+1} = z_t + R(G(z_t))`` (``iterative_chain`` below /
  steps_r.build_r_iterative_step), and the similarity penalty
  ``lambda_r * ||Δz||²`` (gea/train/losses.py) regularizes the raw output.
* **R-separate treats R's output as the absolute corrected code**: training
  targets the full chain-final code (steps_r: loss vs ``zs[-1]``), and
  sample_r_separate blends ``z_hat`` directly with z. No residual add.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from gea.config import ModelConfig
from gea.models.discriminator import DiscriminatorTrunk
from gea.ops.layers import Dense, TPReLU


class Reverter(nn.Module):
    """Image -> Δz correction in code space."""

    image_size: int = 80
    code_size: int = 256
    norm: str = "weight"
    num_features: int = 64
    max_features: int = 512
    hidden: int = 512
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @classmethod
    def from_config(cls, cfg: ModelConfig, **overrides: Any) -> "Reverter":
        kw = dict(
            image_size=cfg.image_size,
            code_size=cfg.code_size,
            norm=cfg.norm,
            num_features=cfg.num_features,
            max_features=cfg.max_features,
            hidden=getattr(cfg, "r_hidden", 512),
            dtype=jnp.dtype(cfg.dtype),
            use_pallas=getattr(cfg, "use_pallas", False),
        )
        kw.update(overrides)
        return cls(**kw)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        wn = self.norm == "weight"
        h = DiscriminatorTrunk(
            image_size=self.image_size,
            norm=self.norm,
            num_features=self.num_features,
            max_features=self.max_features,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="trunk",
        )(x, train=train)
        h = Dense(self.hidden, weight_norm=wn, dtype=self.dtype, name="fc1")(h)
        if wn:
            h = TPReLU(dtype=self.dtype, name="act")(h)
        else:
            h = nn.leaky_relu(h, negative_slope=0.2)
        delta = Dense(
            self.code_size, weight_norm=wn, dtype=self.dtype, name="fc2"
        )(h)
        return delta.astype(jnp.float32)


def apply_correction(z: jnp.ndarray, delta: jnp.ndarray) -> jnp.ndarray:
    """One reverser step: z' = z + R(G(z))."""
    return z + delta


def blend_correction(
    z: jnp.ndarray,
    z_hat: jnp.ndarray,
    strength: float = 0.3,
    shell_renorm: bool = True,
) -> jnp.ndarray:
    """R-separate inference correction: blend the absolute corrected code
    toward the original (the lambda_r similarity intent at sampling time)
    and project back onto the Gaussian shell ||z|| = sqrt(d). The ONE
    definition shared by the R-separate sampler, compute_fid's corrected
    scorer, and the trainer's --fid_interval tracker — the correction
    math cannot drift between them."""
    z2 = (1.0 - strength) * z + strength * z_hat
    if shell_renorm:
        d = float(z.shape[-1])
        z2 = z2 * jnp.sqrt(d) / jnp.linalg.norm(z2, axis=-1, keepdims=True)
    return z2


def iterative_chain(
    generator, reverter, g_vars, r_vars, z0, sn, links: int
) -> jnp.ndarray:
    """Unrolled inference chain z_t = z_{t-1} + R(G(z_{t-1})): returns the
    stacked per-link images (links+1, B, H, W, 3). Shared by the
    R-iterative sampler and the trainer's vis function so the chain
    semantics cannot drift between them."""
    z = z0
    imgs = [generator.apply(g_vars, z, spatial_noise=sn, train=False)[0][0]]
    for _ in range(links):
        delta = reverter.apply(r_vars, imgs[-1], train=False)
        z = z + delta
        imgs.append(
            generator.apply(g_vars, z, spatial_noise=sn, train=False)[0][0]
        )
    return jnp.stack(imgs)
