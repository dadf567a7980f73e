"""Jitted alternating G/D train step for G-LIS (reference C5:
`g_lis/train.py`'s hot loop, SURVEY.md §3.1).

Semantics matched to the reference:

* one step = (1) D update on real batch + all LIS-stage fakes (detached),
  then (2) G update against the freshly-updated D, with per-stage
  adversarial-loss weights (final stage highest).
* BCE-with-logits objective; Adam for both players.

TPU-native structure:

* The whole step is ONE pure function compiled once by XLA — the LIS chain
  and stage count are static Python constants (no recompiles, SURVEY.md §7
  hard part #2); stage renders run as a single `n_stages * B` batch through
  the conv core so every conv hits the MXU at full tile occupancy.
* Data parallelism: the same step function, built with `axis_name="data"`,
  runs under shard_map over a 1-axis mesh; gradients and metrics are
  reduced with `lax.pmean` (a psum over ICI) before the optimizer update,
  so every replica applies identical updates to its replicated params
  (SURVEY.md §2 'Parallelism strategies').
* The state pytree is donated by callers (`jit(..., donate_argnums=0)`) so
  params/opt-state buffers are reused in place — no HBM double-booking.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from gea.config import TrainGLISConfig, stage_weights
from gea.models import Discriminator, GeneratorLIS
from gea.train import losses
from gea.train.state import GANTrainState

Metrics = Dict[str, jnp.ndarray]


def _maybe_pmean(tree: Any, axis_name: Optional[str]) -> Any:
    if axis_name is None:
        return tree
    return lax.pmean(tree, axis_name)


def _check_accum(cfg) -> int:
    """--grad_accum contract, shared by all three trainers: K sequential
    microbatches per optimizer update, identical math to K=1 at the same
    batch size (see DESIGN.md §12)."""
    accum = max(1, int(getattr(cfg, "grad_accum", 1)))
    if accum > 1 and cfg.norm == "batch":
        raise ValueError(
            "--grad_accum > 1 requires --norm weight|none: batch "
            "statistics would be computed per-microbatch, changing the "
            "reference's full-batch BatchNorm semantics"
        )
    return accum


def _split_mb(x: jnp.ndarray, accum: int) -> jnp.ndarray:
    """(B, ...) -> (K, B/K, ...) microbatch slicing for the accum scan."""
    return x.reshape(accum, x.shape[0] // accum, *x.shape[1:])


def _apply_model(model, params, extras, *args, train: bool, **kw):
    """Apply a flax module, tolerating mutable collections (batch norm)."""
    variables = {"params": params, **extras}
    if extras:  # batch_stats present -> allow (and capture) mutation
        out, new_vars = model.apply(
            variables, *args, train=train, mutable=list(extras.keys()), **kw
        )
        return out, dict(new_vars)
    return model.apply(variables, *args, train=train, **kw), extras


def build_glis_train_step(
    cfg: TrainGLISConfig,
    generator: GeneratorLIS,
    discriminator: Discriminator,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    axis_name: Optional[str] = None,
    fold_device_noise: bool = True,
    share_g_forward: Optional[bool] = None,
) -> Callable[[GANTrainState, jnp.ndarray], Tuple[GANTrainState, Metrics]]:
    """Returns step(state, real_images) -> (state, metrics).

    `real_images`: (local_batch, H, W, 3) float32 in [-1, 1]. When
    `axis_name` is set the function must run inside shard_map/pmap over
    that axis and `real_images` is the per-device shard.

    `fold_device_noise=False` makes every device draw IDENTICAL z/noise
    (test-only: enables exact single-device-equivalence checks of the
    shard_map/psum path; never use for training — replicas would explore
    the same codes).

    `share_g_forward` overrides the shared-G-forward (vjp pullback)
    optimization: None = auto (shared unless batch norm mutates state),
    False = always re-run G's forward in the G step (the pre-r2 two-forward
    structure — kept selectable so the two lowerings can be benchmarked
    against each other; see benchmarks/KERNELS.md).
    """
    weights = stage_weights(cfg)
    n_stages = generator.n_stages
    gan_kind = getattr(cfg, "gan_loss", "bce")
    d_real_fn, d_fake_fn, g_fn = losses.gan_objective(gan_kind)
    use_gp = gan_kind == "wgan-gp"
    gp_weight = getattr(cfg, "gp_weight", 10.0)
    ema_decay = getattr(cfg, "g_ema", 0.0)
    accum = _check_accum(cfg)
    remat = bool(getattr(cfg, "remat", False))

    def step(state: GANTrainState, real: jnp.ndarray):
        batch = real.shape[0]
        step_rng = jax.random.fold_in(state.rng, state.step)
        if axis_name is not None and fold_device_noise:
            # Device-unique noise; params stay replicated.
            step_rng = jax.random.fold_in(step_rng, lax.axis_index(axis_name))
        z_rng, sn_rng, gp_rng = jax.random.split(step_rng, 3)
        z = jax.random.normal(z_rng, (batch, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(batch)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )

        # -------------------------------------------- G forward (ONCE)
        # One generator forward serves both players, exactly like the
        # reference's single `fakes = G(z)` reused for the D step
        # (detached) and the G step (backward through the same graph):
        # jax.vjp captures the forward residuals so the G-step gradient
        # is a pure pullback — no second G forward. (Batch-norm G keeps
        # the two-forward path because its forward mutates state.)
        share = (
            (not state.extras_g) if share_g_forward is None
            else (share_g_forward and not state.extras_g)
        )

        if share:

            def g_images(params_g):
                (images, _zs), _ = _apply_model(
                    generator,
                    params_g,
                    state.extras_g,
                    z,
                    train=True,
                    spatial_noise=sn,
                )
                return images

            if remat:
                # --remat: the vjp residuals of the G forward would
                # otherwise stay live across the whole D step (the largest
                # cross-segment liveness in the step); jax.checkpoint makes
                # the residuals just the inputs and recomputes G's forward
                # inside g_pullback instead.
                g_images = jax.checkpoint(g_images)
            fakes_live, g_pullback = jax.vjp(g_images, state.params_g)
        else:
            fakes_live, _zs = _apply_model(
                generator,
                state.params_g,
                state.extras_g,
                z,
                train=True,
                spatial_noise=sn,
            )[0]
            g_pullback = None
        fakes = lax.stop_gradient(fakes_live)  # (S, B, H, W, 3)
        flat_fakes = fakes.reshape(-1, *fakes.shape[2:])

        def d_loss_fn(params_d):
            if cfg.norm == "batch":
                # Separate forwards keep per-population batch statistics —
                # the reference's single-device BatchNorm intent
                # (SURVEY.md §7 hard part #3).
                logits_real, new_extras = _apply_model(
                    discriminator, params_d, state.extras_d, real, train=True
                )
                logits_fake, new_extras = _apply_model(
                    discriminator, params_d, new_extras, flat_fakes, train=True
                )
            else:
                # One fused forward over real + every stage's fakes: a
                # single (1 + n_stages) * B conv batch keeps the MXU at
                # full tile occupancy instead of two smaller launches.
                combined = jnp.concatenate(
                    [real.astype(flat_fakes.dtype), flat_fakes], axis=0
                )
                logits_all, new_extras = _apply_model(
                    discriminator, params_d, state.extras_d, combined, train=True
                )
                logits_real = logits_all[:batch]
                logits_fake = logits_all[batch:]
            logits_fake = logits_fake.reshape(n_stages, batch)
            loss = d_real_fn(logits_real) + losses.staged_apply(
                d_fake_fn, logits_fake, weights
            )
            if use_gp:
                # WGAN-GP: penalize the critic's image-space gradient norm
                # on real<->final-stage-fake interpolates (grad-of-grad:
                # the outer value_and_grad differentiates this w.r.t.
                # params_d through the inner jax.grad w.r.t. images).
                loss = loss + gp_weight * losses.gradient_penalty(
                    lambda x: _apply_model(
                        discriminator, params_d, state.extras_d, x, train=True
                    )[0],
                    real,
                    fakes[-1],
                    gp_rng,
                )
            return loss, (new_extras, logits_real, logits_fake)

        (loss_d, (extras_d, logits_real, logits_fake_d)), grads_d = (
            jax.value_and_grad(d_loss_fn, has_aux=True)(state.params_d)
        )
        grads_d = _maybe_pmean(grads_d, axis_name)
        updates_d, opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        # ------------------------------------------------ G step (vs updated D)
        if share:
            # d(loss_g)/d(images) against the UPDATED discriminator, then
            # pull back through the saved G forward.
            def img_loss_fn(images):
                flat = images.reshape(-1, *images.shape[2:])
                logits, _ = _apply_model(
                    discriminator, params_d, extras_d, flat, train=True
                )
                logits = logits.reshape(n_stages, batch)
                return losses.staged_apply(g_fn, logits, weights), logits

            (loss_g, logits_fake_g), d_images = jax.value_and_grad(
                img_loss_fn, has_aux=True
            )(fakes_live)
            (grads_g,) = g_pullback(d_images.astype(fakes_live.dtype))
            extras_g = state.extras_g
        else:

            def gen_fwd(params_g):
                (images, _), new_extras_g = _apply_model(
                    generator,
                    params_g,
                    state.extras_g,
                    z,
                    train=True,
                    spatial_noise=sn,
                )
                return images, new_extras_g

            if remat:
                gen_fwd = jax.checkpoint(gen_fwd)

            def g_loss_fn(params_g):
                images, new_extras_g = gen_fwd(params_g)
                flat = images.reshape(-1, *images.shape[2:])
                logits, _ = _apply_model(
                    discriminator, params_d, extras_d, flat, train=True
                )
                logits = logits.reshape(n_stages, batch)
                loss = losses.staged_apply(g_fn, logits, weights)
                return loss, (new_extras_g, logits)

            (loss_g, (extras_g, logits_fake_g)), grads_g = jax.value_and_grad(
                g_loss_fn, has_aux=True
            )(state.params_g)
        grads_g = _maybe_pmean(grads_g, axis_name)
        updates_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        # EMA shadow of G (--g_ema): replicas apply identical updates to
        # identical params, so the EMA stays replicated with no extra psum.
        params_g_ema = state.params_g_ema
        if ema_decay > 0:
            params_g_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                params_g_ema,
                params_g,
            )

        metrics: Metrics = {
            "loss_d": loss_d,
            "loss_g": loss_g,
            "d_real": jnp.mean(jax.nn.sigmoid(logits_real)),
            "d_fake_final": jnp.mean(jax.nn.sigmoid(logits_fake_d[-1])),
        }
        metrics = _maybe_pmean(metrics, axis_name)
        # Keep running statistics (batch_stats) identical across replicas:
        # each device computed stats from its own shard, so average them
        # before they enter the replicated state (otherwise checkpoints
        # capture only device 0's statistics).
        extras_g = _maybe_pmean(extras_g, axis_name)
        extras_d = _maybe_pmean(extras_d, axis_name)

        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            extras_g=extras_g,
            extras_d=extras_d,
            opt_g=opt_g,
            opt_d=opt_d,
            params_g_ema=params_g_ema,
        )
        return new_state, metrics

    def step_accum(state: GANTrainState, real: jnp.ndarray):
        """--grad_accum K path: identical math to `step` at the same
        batch size (z/spatial-noise/GP-eps are drawn once for the FULL
        batch, then sliced, and all losses are means over equal-sized
        microbatches, so the average of microbatch gradients equals the
        full-batch gradient), but the forward/backward runs as a
        `lax.scan` over K microbatches — activation memory drops ~K x,
        raising the feasible batch/resolution per chip. Weight-norm/none
        only (guarded at build time); extras stay empty, so the
        microbatch losses can close over the static state."""
        batch = real.shape[0]
        if batch % accum:
            raise ValueError(
                f"per-device batch {batch} not divisible by "
                f"grad_accum {accum}"
            )
        micro = batch // accum
        step_rng = jax.random.fold_in(state.rng, state.step)
        if axis_name is not None and fold_device_noise:
            step_rng = jax.random.fold_in(step_rng, lax.axis_index(axis_name))
        z_rng, sn_rng, gp_rng = jax.random.split(step_rng, 3)
        z = jax.random.normal(z_rng, (batch, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(batch)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )

        xs = {"real": _split_mb(real, accum), "z": _split_mb(z, accum)}
        if sn is not None:
            xs["sn"] = _split_mb(sn, accum)
        if use_gp:
            # Same draw as gradient_penalty's internal one at K=1.
            xs["eps"] = _split_mb(
                jax.random.uniform(gp_rng, (batch, 1, 1, 1), jnp.float32),
                accum,
            )

        def gen_images(params_g, z_mb, sn_mb):
            (images, _zs), _ = _apply_model(
                generator,
                params_g,
                state.extras_g,
                z_mb,
                train=True,
                spatial_noise=sn_mb,
            )
            return images  # (S, micro, H, W, 3)

        if remat:
            # prevent_cse=False: the rematerialized calls sit inside
            # lax.scan bodies (d_body/g_body), where JAX documents the
            # CSE-prevention barrier as unnecessary overhead.
            gen_images = jax.checkpoint(gen_images, prevent_cse=False)

        # ------------------------------------------ D grads, accumulated
        def d_micro(x):
            real_mb = x["real"]
            fakes = lax.stop_gradient(
                gen_images(state.params_g, x["z"], x.get("sn"))
            )
            flat_fakes = fakes.reshape(-1, *fakes.shape[2:])

            def d_loss_fn(params_d):
                combined = jnp.concatenate(
                    [real_mb.astype(flat_fakes.dtype), flat_fakes], axis=0
                )
                logits_all, _ = _apply_model(
                    discriminator, params_d, state.extras_d, combined,
                    train=True,
                )
                logits_real = logits_all[:micro]
                logits_fake = logits_all[micro:].reshape(n_stages, micro)
                loss = d_real_fn(logits_real) + losses.staged_apply(
                    d_fake_fn, logits_fake, weights
                )
                if use_gp:
                    loss = loss + gp_weight * losses.gradient_penalty(
                        lambda im: _apply_model(
                            discriminator, params_d, state.extras_d, im,
                            train=True,
                        )[0],
                        real_mb,
                        fakes[-1],
                        eps=x["eps"],
                    )
                return loss, (logits_real, logits_fake)

            (loss, (lr_mb, lf_mb)), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.params_d)
            return (
                grads,
                loss,
                jnp.mean(jax.nn.sigmoid(lr_mb)),
                jnp.mean(jax.nn.sigmoid(lf_mb[-1])),
            )

        def d_body(carry, x):
            g_acc, l_acc, r_acc, f_acc = carry
            grads, loss, d_real, d_fake = d_micro(x)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            return (g_acc, l_acc + loss, r_acc + d_real, f_acc + d_fake), None

        zero = jnp.zeros((), jnp.float32)
        d_init = (
            jax.tree_util.tree_map(jnp.zeros_like, state.params_d),
            zero,
            zero,
            zero,
        )
        (g_acc_d, loss_d, d_real_m, d_fake_m), _ = lax.scan(d_body, d_init, xs)
        grads_d = jax.tree_util.tree_map(lambda a: a / accum, g_acc_d)
        grads_d = _maybe_pmean(grads_d, axis_name)
        updates_d, opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        # ------------------------- G grads vs the updated D, accumulated
        def g_micro(x):
            def g_loss_fn(params_g):
                images = gen_images(params_g, x["z"], x.get("sn"))
                flat = images.reshape(-1, *images.shape[2:])
                logits, _ = _apply_model(
                    discriminator, params_d, state.extras_d, flat, train=True
                )
                logits = logits.reshape(n_stages, micro)
                return losses.staged_apply(g_fn, logits, weights)

            return jax.value_and_grad(g_loss_fn)(state.params_g)

        def g_body(carry, x):
            g_acc, l_acc = carry
            loss, grads = g_micro(x)
            return (
                jax.tree_util.tree_map(jnp.add, g_acc, grads),
                l_acc + loss,
            ), None

        g_init = (jax.tree_util.tree_map(jnp.zeros_like, state.params_g), zero)
        (g_acc_g, loss_g), _ = lax.scan(g_body, g_init, xs)
        grads_g = jax.tree_util.tree_map(lambda a: a / accum, g_acc_g)
        grads_g = _maybe_pmean(grads_g, axis_name)
        updates_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        params_g_ema = state.params_g_ema
        if ema_decay > 0:
            params_g_ema = jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                params_g_ema,
                params_g,
            )

        metrics: Metrics = {
            "loss_d": loss_d / accum,
            "loss_g": loss_g / accum,
            "d_real": d_real_m / accum,
            "d_fake_final": d_fake_m / accum,
        }
        metrics = _maybe_pmean(metrics, axis_name)
        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            opt_g=opt_g,
            opt_d=opt_d,
            params_g_ema=params_g_ema,
        )
        return new_state, metrics

    return step_accum if accum > 1 else step
