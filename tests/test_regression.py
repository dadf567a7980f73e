"""Numerical regression pins + the batch-norm cross-tool path.

The golden test records fixed-seed 2-step losses of the tiny G-LIS config
on CPU; drift beyond float tolerance means the training math changed —
deliberate changes must update the constants (with a commit explaining
why)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gea.config import TrainGLISConfig, TrainRSeparateConfig
from gea.models import Discriminator, GeneratorLIS, Reverter
from gea.train.state import create_glis_state, make_optimizer
from gea.train.steps import build_glis_train_step
from gea.train.steps_r import build_r_separate_step


def tiny_cfg(cls=TrainGLISConfig, **kw):
    base = dict(
        image_size=16, code_size=16, r_iterations=1, norm="weight",
        num_features=4, max_features=16, dtype="float32", batch_size=8,
        dataset="synthetic", lr=1e-3,
    )
    base.update(kw)
    return cls(**base)


def run_two_steps(cfg):
    g = GeneratorLIS.from_config(cfg)
    d = Discriminator.from_config(cfg)
    tx = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    state = create_glis_state(cfg, g, d, tx, tx, 0)
    step = jax.jit(build_glis_train_step(cfg, g, d, tx, tx))
    real = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    )
    out = []
    for _ in range(2):
        state, m = step(state, real)
        out.append((float(m["loss_d"]), float(m["loss_g"])))
    return out


def test_golden_two_step_losses():
    """Pinned on CPU, jax 0.9, seed 0. Update deliberately or not at all."""
    got = run_two_steps(tiny_cfg())
    want = [(1.3752918243408203, 0.6656976938247681),
            (1.3632303476333618, 0.6632566452026367)]
    for (gd, gg), (wd, wg) in zip(got, want):
        np.testing.assert_allclose(gd, wd, rtol=2e-4)
        np.testing.assert_allclose(gg, wg, rtol=2e-4)


def test_r_separate_on_batchnorm_generator():
    """Cross-tool path with --norm batch: the frozen G carries batch_stats
    and the reverser has its own mutable collection."""
    cfg = tiny_cfg(
        TrainRSeparateConfig, norm="batch", g_path="x", r_hidden=16
    )
    g = GeneratorLIS.from_config(cfg)
    d = Discriminator.from_config(cfg)
    tx = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    gd_state = create_glis_state(cfg, g, d, tx, tx, 0)
    assert gd_state.extras_g, "batch norm G must carry batch_stats"
    frozen = {"params": gd_state.params_g, **gd_state.extras_g}
    reverter = Reverter.from_config(cfg)
    from gea.cli.train_r_separate import create_r_state

    rstate = create_r_state(cfg, reverter, tx, 0)
    assert rstate.extras_r
    step = jax.jit(build_r_separate_step(cfg, g, reverter, frozen, tx))
    s, m = step(rstate, jnp.zeros((1,)))
    assert np.isfinite(float(m["loss_r"]))
    assert int(s.step) == 1
