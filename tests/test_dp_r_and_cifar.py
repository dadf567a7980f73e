"""Data-parallel reverser step on the 8-device mesh + the cifar10
dataset branch (fake pickle batches)."""

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gea.config import TrainGLISConfig, TrainRSeparateConfig
from gea.models import Discriminator, GeneratorLIS, Reverter
from gea.parallel import make_mesh
from gea.parallel.dp import (
    make_parallel_input_step,
    replicate_state,
    shard_batch,
)
from gea.parallel.mesh import DATA_AXIS
from gea.train.state import create_glis_state, make_optimizer
from gea.train.steps_r import build_r_separate_step


@pytest.mark.slow
def test_r_separate_dp_step():
    cfg = TrainRSeparateConfig(
        image_size=16, code_size=16, r_iterations=1, norm="weight",
        num_features=4, max_features=16, dtype="float32", batch_size=16,
        dataset="synthetic", g_path="x", r_hidden=16,
    )
    mesh = make_mesh(8)
    g = GeneratorLIS.from_config(cfg)
    d = Discriminator.from_config(cfg)
    tx = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    gd_state = create_glis_state(cfg, g, d, tx, tx, 0)
    frozen = {"params": gd_state.params_g, **gd_state.extras_g}
    reverter = Reverter.from_config(cfg)
    from gea.cli.train_r_separate import create_r_state

    rstate = create_r_state(cfg, reverter, tx, 0)
    step = build_r_separate_step(
        cfg, g, reverter, frozen, tx, axis_name=DATA_AXIS
    )

    def step3(state, raw, rng):
        return step(state, raw)

    pstep = make_parallel_input_step(step3, mesh)
    rstate = replicate_state(rstate, mesh)
    dummy = shard_batch(np.zeros((8,), np.float32), mesh)
    new_state, metrics = pstep(rstate, dummy, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_r"]))
    assert int(new_state.step) == 1
    for leaf in jax.tree_util.tree_leaves(new_state.params_r):
        assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_glis_dp_step_with_spatial_noise():
    """BASELINE.json config-5 shape (DP + spatial noise channels) on the
    virtual mesh: the per-device spatial noise draw + tile/concat must
    compile and keep params replicated."""
    from gea.train.steps import build_glis_train_step

    cfg = TrainGLISConfig(
        image_size=16, code_size=16, r_iterations=1, spatial_code=2,
        norm="weight", num_features=4, max_features=16, dtype="float32",
        batch_size=16, dataset="synthetic",
    )
    mesh = make_mesh(8)
    g = GeneratorLIS.from_config(cfg)
    d = Discriminator.from_config(cfg)
    tx = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    state = create_glis_state(cfg, g, d, tx, tx, 0)
    step = build_glis_train_step(cfg, g, d, tx, tx, axis_name=DATA_AXIS)

    def step3(state, raw, rng):
        return step(state, raw)

    pstep = make_parallel_input_step(step3, mesh)
    state = replicate_state(state, mesh)
    real = shard_batch(
        np.random.default_rng(0)
        .uniform(-1, 1, (16, 16, 16, 3))
        .astype(np.float32),
        mesh,
    )
    new_state, metrics = pstep(state, real, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss_d"]))
    for leaf in jax.tree_util.tree_leaves(new_state.params_g):
        assert leaf.sharding.is_fully_replicated


def test_cifar10_dataset(tmp_path):
    rng = np.random.default_rng(0)
    data = (rng.random((50, 3 * 32 * 32)) * 255).astype(np.uint8)
    with open(tmp_path / "data_batch_1", "wb") as f:
        pickle.dump({b"data": data}, f)
    cfg = TrainGLISConfig(
        dataset="cifar10", dataroot=str(tmp_path), batch_size=8,
        crop_size=32, image_size=32,
    )
    from gea.data.pipeline import make_dataset

    ds = make_dataset(cfg, seed=0)
    assert len(ds) == 50
    b = next(ds.batches())
    assert b.shape == (8, 32, 32, 3) and b.dtype == np.uint8
