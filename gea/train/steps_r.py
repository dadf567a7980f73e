"""Reverser train steps (reference C7/C8, SURVEY.md §3.3/§3.4 — mechanism
[H], exact loss forms [M]; reference mount empty, see SURVEY.md §0).

R-separate (`r_separate/train_r.py` equivalent):
    The generator is FROZEN (loaded from a finished G-LIS run). R learns to
    invert the rendering core: given the final-stage image it predicts the
    code that produced it, by minimizing ||R(G(z)) - z||^2 over fresh noise.
    At inference the correction G(R(G(z))) moves defective codes toward
    regions R has learned map to well-formed images — purely post-hoc
    input-space error avoidance. No real data is needed: the frozen G is
    the data source, so the step is fully on-device with zero input
    pipeline.

R-iterative (`r_iterative/train.py` equivalent):
    G, D, R train jointly. Each step unrolls the correction chain
    z_t = z_{t-1} + R(G(z_{t-1})) for `r_chain_length` iterations (a static
    Python loop — one compiled program), renders an image per link, gives
    every link's image discriminator feedback (final link weighted highest)
    and penalizes correction magnitude with lambda_r * ||z_t - z_{t-1}||^2
    so corrected codes stay near the originals.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

from gea.config import TrainRIterativeConfig, TrainRSeparateConfig
from gea.models import Discriminator, GeneratorLIS, Reverter
from gea.train import losses
from gea.train.state import GANTrainState

Metrics = Dict[str, jnp.ndarray]


from gea.train.steps import _check_accum, _split_mb  # shared --grad_accum


def _maybe_pmean(tree: Any, axis_name: Optional[str]) -> Any:
    if axis_name is None:
        return tree
    return lax.pmean(tree, axis_name)


def build_r_separate_step(
    cfg: TrainRSeparateConfig,
    generator: GeneratorLIS,
    reverter: Reverter,
    frozen_g_variables: Any,
    tx_r: optax.GradientTransformation,
    axis_name: Optional[str] = None,
    discriminator: Optional[Discriminator] = None,
    frozen_d_variables: Any = None,
) -> Callable[[GANTrainState, jnp.ndarray], Tuple[GANTrainState, Metrics]]:
    """step(state, _unused) -> (state, metrics). The second argument is
    accepted (and ignored) so the generic TrainLoop can drive this step;
    pass a dummy batch.

    Loss (SURVEY.md §3.4 marks the exact form [M] — 'adversarial via D
    and/or similarity'):
      r_mse_weight * ||R(G(z)) - z||^2            code reconstruction
    + r_adv_weight * BCE(D(G(R(G(z)))), real)     D-feedback (frozen G+D)
    with optional defective-z mining (r_mine_weight): the reconstruction
    term re-weights toward samples the frozen D scored as fake. The
    D-feedback term is what makes the correction IMPROVE sample quality —
    pure MSE shrinks codes toward the mean (round-1 ablation,
    docs/RESULTS.md)."""
    use_adv = (
        discriminator is not None
        and frozen_d_variables is not None
        and cfg.r_adv_weight > 0
    )
    use_mine = (
        discriminator is not None
        and frozen_d_variables is not None
        and cfg.r_mine_weight > 0
    )
    accum = _check_accum(cfg)
    remat = bool(getattr(cfg, "remat", False))

    def corr_render(z_pred, sn):
        """The D-feedback segment: corrected code -> frozen G render ->
        frozen D logits. Under --remat this whole segment is
        rematerialized, so its conv activations are not live at the same
        time as the reverter's own backward residuals."""
        corr_images, _ = generator.apply(
            frozen_g_variables,
            z_pred,
            spatial_noise=sn,
            train=False,
            render_all_stages=True,
        )
        return discriminator.apply(
            frozen_d_variables, corr_images[-1], train=False
        )

    if remat:
        # Two wrappings of the same segment: the full-batch path calls it
        # under plain jit (CSE prevention required for remat to survive),
        # the --grad_accum path calls it inside a lax.scan body, where
        # JAX documents the CSE barrier as unnecessary overhead.
        corr_render_full = jax.checkpoint(corr_render)
        corr_render_micro = jax.checkpoint(corr_render, prevent_cse=False)
    else:
        corr_render_full = corr_render_micro = corr_render

    def step(state: GANTrainState, _unused: jnp.ndarray):
        batch = cfg.batch_size
        if axis_name is not None:
            batch = batch // lax.psum(1, axis_name)
        step_rng = jax.random.fold_in(state.rng, state.step)
        if axis_name is not None:
            step_rng = jax.random.fold_in(step_rng, lax.axis_index(axis_name))
        z_rng, sn_rng = jax.random.split(step_rng)
        z = jax.random.normal(z_rng, (batch, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(batch)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )

        # Frozen G: inference mode, no param gradients.
        images, zs = generator.apply(
            frozen_g_variables,
            z,
            spatial_noise=sn,
            train=False,
            render_all_stages=True,
        )
        final_img = lax.stop_gradient(images[-1])
        target_code = lax.stop_gradient(zs[-1])

        if use_mine:
            # Defective-z mining: samples the frozen D already likes need
            # no correction practice; focus the reconstruction loss on the
            # defective ones. Weights are detached and mean-1 normalized.
            d_logits = discriminator.apply(
                frozen_d_variables, final_img, train=False
            )
            defect = 1.0 - jax.nn.sigmoid(d_logits.astype(jnp.float32))
            defect = defect / (jnp.mean(defect) + 1e-8)
            mine_w = lax.stop_gradient(
                (1.0 - cfg.r_mine_weight) + cfg.r_mine_weight * defect
            )
        else:
            mine_w = None

        def r_loss_fn(params_r):
            variables = {"params": params_r, **state.extras_r}
            if state.extras_r:
                z_pred, new_extras = reverter.apply(
                    variables,
                    final_img,
                    train=True,
                    mutable=list(state.extras_r.keys()),
                )
                new_extras = dict(new_extras)
            else:
                z_pred = reverter.apply(variables, final_img, train=True)
                new_extras = state.extras_r
            per_sample = jnp.mean(
                jnp.square(z_pred - target_code), axis=-1
            )
            if mine_w is not None:
                per_sample = per_sample * mine_w
            loss_mse = jnp.mean(per_sample)
            loss = cfg.r_mse_weight * loss_mse
            loss_adv = jnp.float32(0.0)
            if use_adv:
                # Render the corrected code through the frozen G and score
                # with the frozen D: gradients flow D -> image -> z_pred
                # -> R params (G/D params are not differentiated).
                # Same spatial noise as the defective render: a
                # spatial_code generator REQUIRES it (generator.apply
                # raises without it), and reusing sn isolates the z
                # correction as the only change between the two renders.
                logits_corr = corr_render_full(z_pred, sn)
                loss_adv = losses.g_adv_loss(logits_corr)
                loss = loss + cfg.r_adv_weight * loss_adv
            return loss, (new_extras, z_pred, loss_mse, loss_adv)

        (loss_r, (extras_r, z_pred, loss_mse, loss_adv)), grads_r = (
            jax.value_and_grad(r_loss_fn, has_aux=True)(state.params_r)
        )
        grads_r = _maybe_pmean(grads_r, axis_name)
        updates_r, opt_r = tx_r.update(grads_r, state.opt_r, state.params_r)
        params_r = optax.apply_updates(state.params_r, updates_r)

        metrics: Metrics = {
            "loss_r": loss_r,
            "loss_r_mse": loss_mse,
            "loss_r_adv": loss_adv,
            "correction_norm": jnp.mean(
                jnp.linalg.norm(z_pred - target_code, axis=-1)
            ),
        }
        metrics = _maybe_pmean(metrics, axis_name)
        extras_r = _maybe_pmean(extras_r, axis_name)
        new_state = state.replace(
            step=state.step + 1,
            params_r=params_r,
            extras_r=extras_r,
            opt_r=opt_r,
        )
        return new_state, metrics

    def step_accum(state: GANTrainState, _unused: jnp.ndarray):
        """--grad_accum path. The frozen-G defective renders and the
        mining weights are computed full-batch OUTSIDE the scan (the
        mining weights normalize over the WHOLE batch, and the no-grad
        forward holds no residuals), then the R forward/backward — the
        memory hog, since the adversarial term backprops through a full
        corrected G render — scans over K microbatches. Weight-norm/none
        only (extras stay empty), guarded in _check_accum."""
        batch = cfg.batch_size
        if axis_name is not None:
            batch = batch // lax.psum(1, axis_name)
        if batch % accum:
            raise ValueError(
                f"per-device batch {batch} not divisible by "
                f"grad_accum {accum}"
            )
        step_rng = jax.random.fold_in(state.rng, state.step)
        if axis_name is not None:
            step_rng = jax.random.fold_in(step_rng, lax.axis_index(axis_name))
        z_rng, sn_rng = jax.random.split(step_rng)
        z = jax.random.normal(z_rng, (batch, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(batch)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )

        images, zs = generator.apply(
            frozen_g_variables,
            z,
            spatial_noise=sn,
            train=False,
            render_all_stages=True,
        )
        final_img = lax.stop_gradient(images[-1])
        target_code = lax.stop_gradient(zs[-1])

        xs = {
            "img": _split_mb(final_img, accum),
            "code": _split_mb(target_code, accum),
        }
        if sn is not None:
            xs["sn"] = _split_mb(sn, accum)
        if use_mine:
            d_logits = discriminator.apply(
                frozen_d_variables, final_img, train=False
            )
            defect = 1.0 - jax.nn.sigmoid(d_logits.astype(jnp.float32))
            defect = defect / (jnp.mean(defect) + 1e-8)  # full-batch norm
            xs["mine"] = _split_mb(
                lax.stop_gradient(
                    (1.0 - cfg.r_mine_weight) + cfg.r_mine_weight * defect
                ),
                accum,
            )

        def r_micro(x):
            def r_loss_fn(params_r):
                z_pred = reverter.apply(
                    {"params": params_r}, x["img"], train=True
                )
                per_sample = jnp.mean(
                    jnp.square(z_pred - x["code"]), axis=-1
                )
                if use_mine:
                    per_sample = per_sample * x["mine"]
                loss_mse = jnp.mean(per_sample)
                loss = cfg.r_mse_weight * loss_mse
                loss_adv = jnp.float32(0.0)
                if use_adv:
                    logits_corr = corr_render_micro(z_pred, x.get("sn"))
                    loss_adv = losses.g_adv_loss(logits_corr)
                    loss = loss + cfg.r_adv_weight * loss_adv
                return loss, (z_pred, loss_mse, loss_adv)

            (loss_r, (z_pred, loss_mse, loss_adv)), grads = (
                jax.value_and_grad(r_loss_fn, has_aux=True)(state.params_r)
            )
            corr = jnp.mean(jnp.linalg.norm(z_pred - x["code"], axis=-1))
            return grads, jnp.stack([loss_r, loss_mse, loss_adv, corr])

        def body(carry, x):
            g_acc, s_acc = carry
            grads, scalars = r_micro(x)
            return (
                jax.tree_util.tree_map(jnp.add, g_acc, grads),
                s_acc + scalars,
            ), None

        init = (
            jax.tree_util.tree_map(jnp.zeros_like, state.params_r),
            jnp.zeros((4,), jnp.float32),
        )
        (g_acc, s_acc), _ = lax.scan(body, init, xs)
        grads_r = jax.tree_util.tree_map(lambda a: a / accum, g_acc)
        grads_r = _maybe_pmean(grads_r, axis_name)
        updates_r, opt_r = tx_r.update(grads_r, state.opt_r, state.params_r)
        params_r = optax.apply_updates(state.params_r, updates_r)

        s_acc = s_acc / accum
        metrics: Metrics = {
            "loss_r": s_acc[0],
            "loss_r_mse": s_acc[1],
            "loss_r_adv": s_acc[2],
            "correction_norm": s_acc[3],
        }
        metrics = _maybe_pmean(metrics, axis_name)
        new_state = state.replace(
            step=state.step + 1, params_r=params_r, opt_r=opt_r
        )
        return new_state, metrics

    return step_accum if accum > 1 else step


def build_r_iterative_step(
    cfg: TrainRIterativeConfig,
    generator: GeneratorLIS,
    discriminator: Discriminator,
    reverter: Reverter,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    tx_r: optax.GradientTransformation,
    axis_name: Optional[str] = None,
    fold_device_noise: bool = True,
) -> Callable[[GANTrainState, jnp.ndarray], Tuple[GANTrainState, Metrics]]:
    """Joint G/D/R step. `generator` here is the plain conv core
    (r_iterations=0 — the R-iterative approach predates LIS modules).

    `fold_device_noise=False` makes every device draw IDENTICAL z0/noise
    (test-only: enables the exact single-device-equivalence check of the
    shard_map/pmean path for the three-player update; never use for
    training — replicas would explore the same codes)."""
    n_links = cfg.r_chain_length + 1  # images: img_0 .. img_T
    # Final link weighted highest, like the staged G-LIS loss.
    raw_w = [0.5 + 0.5 * i / max(1, n_links - 1) for i in range(n_links)]
    weights = tuple(w / sum(raw_w) for w in raw_w)
    accum = _check_accum(cfg)
    remat = bool(getattr(cfg, "remat", False))

    def unroll(params_g, extras_g, params_r, extras_r, z0, sn):
        """Chain: z_t = z_{t-1} + R(img_{t-1}); returns stacked images
        (T+1, B, H, W, 3), zs (T+1, B, code) and the updated mutable
        collections (batch_stats when --norm batch; no-ops otherwise —
        G and R are both being trained, so their statistics must track).

        Under --remat each chain link (R encode + G render) is wrapped in
        jax.checkpoint: only the link boundaries (z_t, img_t) stay live
        across the unroll, and each link's conv activations are recomputed
        during its own backward — activation memory drops ~(T+1) x at the
        cost of one extra forward per link."""
        from gea.train.steps import _apply_model

        def render(params_g, extras_g, z, sn):
            (img, _), extras_g = _apply_model(
                generator, params_g, extras_g, z, train=True,
                spatial_noise=sn,
            )
            return img[0], extras_g  # (B, H, W, 3): single-stage generator

        def link(params_g, params_r, extras_g, extras_r, z_prev, img_prev, sn):
            delta, extras_r = _apply_model(
                reverter, params_r, extras_r, img_prev, train=True
            )
            z_next = z_prev + delta
            img_next, extras_g = render(params_g, extras_g, z_next, sn)
            return z_next, img_next, extras_g, extras_r

        if remat:
            render = jax.checkpoint(render)
            link = jax.checkpoint(link)

        img0, extras_g = render(params_g, extras_g, z0, sn)
        zs = [z0]
        imgs = [img0]
        for _ in range(cfg.r_chain_length):
            z_next, img_next, extras_g, extras_r = link(
                params_g, params_r, extras_g, extras_r, zs[-1], imgs[-1], sn
            )
            zs.append(z_next)
            imgs.append(img_next)
        return jnp.stack(imgs), jnp.stack(zs), extras_g, extras_r

    def step(state: GANTrainState, real: jnp.ndarray):
        batch = real.shape[0]
        step_rng = jax.random.fold_in(state.rng, state.step)
        if axis_name is not None and fold_device_noise:
            step_rng = jax.random.fold_in(step_rng, lax.axis_index(axis_name))
        z_rng, sn_rng = jax.random.split(step_rng)
        z0 = jax.random.normal(z_rng, (batch, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(batch)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )

        # ---------------------------------------------- D step (detached)
        from gea.train.steps import _apply_model

        fakes, _, _, _ = unroll(
            state.params_g,
            state.extras_g,
            state.params_r,
            state.extras_r,
            z0,
            sn,
        )
        fakes = lax.stop_gradient(fakes)
        flat_fakes = fakes.reshape(-1, *fakes.shape[2:])

        def d_loss_fn(params_d):
            logits_real, new_extras_d = _apply_model(
                discriminator, params_d, state.extras_d, real, train=True
            )
            logits_fake, new_extras_d = _apply_model(
                discriminator, params_d, new_extras_d, flat_fakes, train=True
            )
            logits_fake = logits_fake.reshape(n_links, batch)
            loss = losses.d_real_loss(logits_real) + losses.staged_loss(
                logits_fake, weights, 0.0
            )
            return loss, (new_extras_d, logits_real, logits_fake)

        (loss_d, (extras_d, logits_real, _)), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(state.params_d)
        grads_d = _maybe_pmean(grads_d, axis_name)
        updates_d, opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        # -------------------------------------- joint G+R step (vs new D)
        def gr_loss_fn(params_gr):
            params_g, params_r = params_gr
            images, zs, new_extras_g, new_extras_r = unroll(
                params_g,
                state.extras_g,
                params_r,
                state.extras_r,
                z0,
                sn,
            )
            flat = images.reshape(-1, *images.shape[2:])
            logits, _ = _apply_model(
                discriminator, params_d, extras_d, flat, train=True
            )
            logits = logits.reshape(n_links, batch)
            adv = losses.staged_loss(logits, weights, 1.0)
            sim = losses.z_similarity_loss(zs[1:] - zs[:-1])
            return adv + cfg.lambda_r * sim, (adv, sim, new_extras_g, new_extras_r)

        (loss_gr, (adv, sim, extras_g, extras_r)), grads_gr = jax.value_and_grad(
            gr_loss_fn, has_aux=True
        )((state.params_g, state.params_r))
        grads_g, grads_r = grads_gr
        grads_g = _maybe_pmean(grads_g, axis_name)
        grads_r = _maybe_pmean(grads_r, axis_name)
        updates_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)
        updates_r, opt_r = tx_r.update(grads_r, state.opt_r, state.params_r)
        params_r = optax.apply_updates(state.params_r, updates_r)

        metrics: Metrics = {
            "loss_d": loss_d,
            "loss_g": adv,
            "loss_r_sim": sim,
            "d_real": jnp.mean(jax.nn.sigmoid(logits_real)),
        }
        metrics = _maybe_pmean(metrics, axis_name)
        extras_g = _maybe_pmean(extras_g, axis_name)
        extras_d = _maybe_pmean(extras_d, axis_name)
        extras_r = _maybe_pmean(extras_r, axis_name)
        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            params_r=params_r,
            extras_g=extras_g,
            extras_d=extras_d,
            extras_r=extras_r,
            opt_g=opt_g,
            opt_d=opt_d,
            opt_r=opt_r,
        )
        return new_state, metrics

    def step_accum(state: GANTrainState, real: jnp.ndarray):
        """--grad_accum path: same two-phase structure (D update on
        detached chain renders, then joint G+R vs the new D) but each
        phase scans over K microbatches — the chain unrolls T+1 full
        generator renders per sample, so activation memory is the
        binding constraint at scale. Weight-norm/none only (extras stay
        empty, guarded in _check_accum); noise drawn full-batch then
        sliced so K>1 equals K=1 exactly."""
        from gea.train.steps import _apply_model

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
        z_rng, sn_rng = jax.random.split(step_rng)
        z0 = jax.random.normal(z_rng, (batch, cfg.code_size), jnp.float32)
        sn_shape = generator.spatial_noise_shape(batch)
        sn = (
            jax.random.normal(sn_rng, sn_shape, jnp.float32)
            if sn_shape
            else None
        )

        xs = {"real": _split_mb(real, accum), "z0": _split_mb(z0, accum)}
        if sn is not None:
            xs["sn"] = _split_mb(sn, accum)

        # ---------------------------------------- D phase, accumulated
        def d_micro(x):
            fakes, _, _, _ = unroll(
                state.params_g,
                state.extras_g,
                state.params_r,
                state.extras_r,
                x["z0"],
                x.get("sn"),
            )
            fakes = lax.stop_gradient(fakes)
            flat_fakes = fakes.reshape(-1, *fakes.shape[2:])

            def d_loss_fn(params_d):
                logits_real, _ = _apply_model(
                    discriminator, params_d, state.extras_d, x["real"],
                    train=True,
                )
                logits_fake, _ = _apply_model(
                    discriminator, params_d, state.extras_d, flat_fakes,
                    train=True,
                )
                logits_fake = logits_fake.reshape(n_links, micro)
                loss = losses.d_real_loss(logits_real) + losses.staged_loss(
                    logits_fake, weights, 0.0
                )
                return loss, logits_real

            (loss, logits_real), grads = jax.value_and_grad(
                d_loss_fn, has_aux=True
            )(state.params_d)
            return grads, loss, jnp.mean(jax.nn.sigmoid(logits_real))

        def d_body(carry, x):
            g_acc, l_acc, r_acc = carry
            grads, loss, d_real = d_micro(x)
            return (
                jax.tree_util.tree_map(jnp.add, g_acc, grads),
                l_acc + loss,
                r_acc + d_real,
            ), None

        zero = jnp.zeros((), jnp.float32)
        d_init = (
            jax.tree_util.tree_map(jnp.zeros_like, state.params_d),
            zero,
            zero,
        )
        (g_acc_d, loss_d, d_real_m), _ = lax.scan(d_body, d_init, xs)
        grads_d = jax.tree_util.tree_map(lambda a: a / accum, g_acc_d)
        grads_d = _maybe_pmean(grads_d, axis_name)
        updates_d, opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        # ------------------------------ joint G+R phase vs the new D
        def gr_micro(x):
            def gr_loss_fn(params_gr):
                params_g, params_r = params_gr
                images, zs, _, _ = unroll(
                    params_g,
                    state.extras_g,
                    params_r,
                    state.extras_r,
                    x["z0"],
                    x.get("sn"),
                )
                flat = images.reshape(-1, *images.shape[2:])
                logits, _ = _apply_model(
                    discriminator, params_d, state.extras_d, flat, train=True
                )
                logits = logits.reshape(n_links, micro)
                adv = losses.staged_loss(logits, weights, 1.0)
                sim = losses.z_similarity_loss(zs[1:] - zs[:-1])
                return adv + cfg.lambda_r * sim, (adv, sim)

            (_, (adv, sim)), grads = jax.value_and_grad(
                gr_loss_fn, has_aux=True
            )((state.params_g, state.params_r))
            return grads, adv, sim

        def gr_body(carry, x):
            g_acc, a_acc, s_acc = carry
            grads, adv, sim = gr_micro(x)
            return (
                jax.tree_util.tree_map(jnp.add, g_acc, grads),
                a_acc + adv,
                s_acc + sim,
            ), None

        gr_init = (
            jax.tree_util.tree_map(
                jnp.zeros_like, (state.params_g, state.params_r)
            ),
            zero,
            zero,
        )
        (g_acc_gr, adv, sim), _ = lax.scan(gr_body, gr_init, xs)
        grads_g, grads_r = jax.tree_util.tree_map(
            lambda a: a / accum, g_acc_gr
        )
        grads_g = _maybe_pmean(grads_g, axis_name)
        grads_r = _maybe_pmean(grads_r, axis_name)
        updates_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)
        updates_r, opt_r = tx_r.update(grads_r, state.opt_r, state.params_r)
        params_r = optax.apply_updates(state.params_r, updates_r)

        metrics: Metrics = {
            "loss_d": loss_d / accum,
            "loss_g": adv / accum,
            "loss_r_sim": sim / accum,
            "d_real": d_real_m / accum,
        }
        metrics = _maybe_pmean(metrics, axis_name)
        new_state = state.replace(
            step=state.step + 1,
            params_g=params_g,
            params_d=params_d,
            params_r=params_r,
            opt_g=opt_g,
            opt_d=opt_d,
            opt_r=opt_r,
        )
        return new_state, metrics

    return step_accum if accum > 1 else step
