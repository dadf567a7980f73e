"""DCGAN-style discriminator (reference C4: `Discriminator` in
`g_lis/common.py` and per-approach twins, SURVEY.md §2 — citations
approximate, reference mount empty; see SURVEY.md §0).

Stride-2 convs halve resolution and double channels down to the seed
resolution (4x4 or 5x5), then a linear head produces ONE logit per image;
the training objective is BCE-with-logits (sigmoid GAN loss, SURVEY.md §0).

TPU-first notes: NHWC layout; the first block skips normalization (DCGAN
convention); the flatten + Dense head replaces the reference's final
full-window conv — identical math, friendlier MXU shape. The head returns
raw logits; the sigmoid lives inside the loss for numerical stability.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from gea.config import ModelConfig
from gea.models.generator import generator_plan
from gea.ops.layers import Conv, Dense, NormAct


class DiscriminatorTrunk(nn.Module):
    """Shared conv encoder: image -> flat features at seed resolution.

    Reused by the Reverter (reference C7's conv encoder 'mirroring D')."""

    image_size: int
    norm: str = "weight"
    num_features: int = 64
    max_features: int = 512
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        s0, d = generator_plan(self.image_size)
        wn = self.norm == "weight"
        nf, cap = self.num_features, self.max_features

        for i in range(d):
            ci = min(nf * 2**i, cap)
            x = Conv(
                ci,
                kernel_size=4,
                stride=2,
                padding=1,
                weight_norm=wn,
                dtype=self.dtype,
                name=f"down{i}",
            )(x)
            if i == 0:
                # DCGAN convention: no norm on the first block.
                x = nn.leaky_relu(x, negative_slope=0.2)
            else:
                # XLA path on purpose — see GeneratorCore note on the
                # Pallas TPReLU epilogue benchmark.
                x = NormAct(
                    norm=self.norm, dtype=self.dtype, name=f"down{i}_act"
                )(x, train=train)
        return x.reshape(x.shape[0], -1)


class Discriminator(nn.Module):
    """Image -> single real/fake logit."""

    image_size: int = 80
    norm: str = "weight"
    num_features: int = 64
    max_features: int = 512
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @classmethod
    def from_config(cls, cfg: ModelConfig, **overrides: Any) -> "Discriminator":
        kw = dict(
            image_size=cfg.image_size,
            norm=cfg.norm,
            num_features=cfg.num_features,
            max_features=cfg.max_features,
            dtype=jnp.dtype(cfg.dtype),
            use_pallas=getattr(cfg, "use_pallas", False),
        )
        kw.update(overrides)
        return cls(**kw)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = DiscriminatorTrunk(
            image_size=self.image_size,
            norm=self.norm,
            num_features=self.num_features,
            max_features=self.max_features,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            name="trunk",
        )(x, train=train)
        logits = Dense(
            1,
            weight_norm=self.norm == "weight",
            dtype=self.dtype,
            name="head",
        )(h)
        return logits.squeeze(-1).astype(jnp.float32)
