"""GAN objectives (reference: BCE/sigmoid GAN loss, SURVEY.md §0/§2 C4/C5).

All losses take raw logits; the log-sigmoid is folded in for numerical
stability (identical numerics to torch's binary_cross_entropy_with_logits,
pinned by tests/test_torch_parity.py)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """mean( max(x,0) - x*t + log(1+exp(-|x|)) ) — the stable BCE form."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )
    return jnp.mean(loss)


def d_real_loss(logits_real: jnp.ndarray) -> jnp.ndarray:
    return bce_with_logits(logits_real, jnp.ones_like(logits_real))


def d_fake_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    return bce_with_logits(logits_fake, jnp.zeros_like(logits_fake))


def g_adv_loss(logits_fake: jnp.ndarray) -> jnp.ndarray:
    return bce_with_logits(logits_fake, jnp.ones_like(logits_fake))


def staged_loss(
    logits_per_stage: jnp.ndarray,
    weights: Sequence[float],
    target: float,
) -> jnp.ndarray:
    """Weighted per-stage BCE: logits (S, B), weights length S.

    The per-stage weighting (final stage highest) is the G-LIS training
    signal that teaches the LIS chain to steer noise out of error regions
    (SURVEY.md §0 item 3)."""
    w = jnp.asarray(weights, dtype=jnp.float32)
    t = jnp.full(logits_per_stage.shape[1:], target, dtype=jnp.float32)
    per_stage = jax.vmap(lambda lg: bce_with_logits(lg, t))(logits_per_stage)
    return jnp.sum(w * per_stage)


def hinge_d_real(logits: jnp.ndarray) -> jnp.ndarray:
    """Geometric-margin D loss on reals: mean(relu(1 - logits)).

    Beyond-reference option (`--gan_loss hinge`, VERDICT r1 #10): the
    SAGAN/BigGAN hinge objective, selectable alongside the reference's BCE."""
    return jnp.mean(jax.nn.relu(1.0 - logits.astype(jnp.float32)))


def hinge_d_fake(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jax.nn.relu(1.0 + logits.astype(jnp.float32)))


def hinge_g(logits: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(logits.astype(jnp.float32))


def staged_apply(fn, logits_per_stage: jnp.ndarray, weights) -> jnp.ndarray:
    """Weighted per-stage reduction with an arbitrary per-stage loss fn —
    the generic form of `staged_loss` used by the selectable GAN objective."""
    w = jnp.asarray(weights, dtype=jnp.float32)
    per_stage = jax.vmap(fn)(logits_per_stage)
    return jnp.sum(w * per_stage)


def wgan_d_real(logits: jnp.ndarray) -> jnp.ndarray:
    """Wasserstein critic loss, real side: -E[D(x)] (beyond-reference
    option `--gan_loss wgan-gp`; the gradient penalty lives in the train
    step, not here, because it differentiates D w.r.t. IMAGES)."""
    return -jnp.mean(logits.astype(jnp.float32))


def wgan_d_fake(logits: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(logits.astype(jnp.float32))


def wgan_g(logits: jnp.ndarray) -> jnp.ndarray:
    return -jnp.mean(logits.astype(jnp.float32))


def gradient_penalty(
    d_apply, real: jnp.ndarray, fake: jnp.ndarray, rng=None, eps=None
) -> jnp.ndarray:
    """WGAN-GP (Gulrajani et al. 2017): E[(||grad_x D(x_hat)|| - 1)^2] on
    random interpolates x_hat between real and fake batches. `d_apply`
    maps images -> logits (params closed over; the step differentiates the
    whole D loss w.r.t. params afterwards — grad-of-grad).

    `eps` (per-sample interpolation coefficients, shape (B, 1, 1, 1)) may
    be pre-drawn by the caller — the gradient-accumulation path draws one
    full-batch eps and slices it per microbatch so K>1 stays numerically
    identical to K=1."""
    if eps is None:
        if rng is None:
            raise ValueError("gradient_penalty needs either rng or eps")
        eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), jnp.float32)
    x_hat = eps * real.astype(jnp.float32) + (1.0 - eps) * fake.astype(
        jnp.float32
    )

    def total(x):
        return jnp.sum(d_apply(x).astype(jnp.float32))

    g = jax.grad(total)(x_hat)
    norms = jnp.sqrt(jnp.sum(jnp.square(g), axis=(1, 2, 3)) + 1e-12)
    return jnp.mean(jnp.square(norms - 1.0))


def gan_objective(kind: str):
    """(d_real_fn, d_fake_fn, g_fn) for `--gan_loss {bce,hinge,wgan-gp}`."""
    if kind == "hinge":
        return hinge_d_real, hinge_d_fake, hinge_g
    if kind == "wgan-gp":
        return wgan_d_real, wgan_d_fake, wgan_g
    if kind == "bce":
        return (
            d_real_loss,
            lambda lg: bce_with_logits(lg, jnp.zeros_like(lg)),
            lambda lg: bce_with_logits(lg, jnp.ones_like(lg)),
        )
    raise ValueError(f"unknown gan_loss {kind!r}")


def z_similarity_loss(delta: jnp.ndarray) -> jnp.ndarray:
    """Mean squared correction magnitude: ||z' - z||² / dim — the
    similarity constraint (weight lambda_r) keeping corrected codes close
    to the originals (reference C7/C8 mechanism, SURVEY.md §3.3)."""
    return jnp.mean(jnp.square(delta.astype(jnp.float32)))
