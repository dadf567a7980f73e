"""GSPMD tensor-parallel (dp x tp) tests — gea/parallel/tp.py.

Rebuild-new surface (SURVEY.md §2 parallelism): the reference is
single-GPU; these tests pin the round-3 'model' mesh axis implementation:
the sharding rule, mesh construction, exact single-device numeric
equivalence of the partitioned step, the presence of real collectives in
the compiled program, and the trainer CLI path end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from gea.config import TrainGLISConfig
from gea.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from gea.parallel.tp import (
    leaf_spec,
    make_gspmd_input_step,
    shard_state,
    sharded_param_fraction,
    state_shardings,
)

from tests.test_train_step import build, fake_real_batch, tiny_cfg


def test_leaf_spec_rule():
    assert leaf_spec((3, 3, 16, 32), 4, 16) == P(None, None, None, MODEL_AXIS)
    assert leaf_spec((16, 32), 4, 16) == P(None, MODEL_AXIS)
    assert leaf_spec((32,), 4, 16) == P(MODEL_AXIS)
    assert leaf_spec((2,), 4, 16) == P()  # too narrow (rng keys)
    assert leaf_spec((), 4, 16) == P()  # scalars (step counter)
    assert leaf_spec((3, 3, 16, 30), 4, 16) == P()  # not divisible
    assert leaf_spec((3, 3, 16, 32), 4, 64) == P()  # below min_width


def test_make_mesh_2d():
    mesh = make_mesh(8, model_shards=4)
    assert mesh.axis_names == (DATA_AXIS, MODEL_AXIS)
    assert mesh.shape[DATA_AXIS] == 2 and mesh.shape[MODEL_AXIS] == 4
    with pytest.raises(ValueError, match="must divide"):
        make_mesh(8, model_shards=3)


def test_state_shardings_cover_optimizer_and_ema():
    """Adam mu/nu and the EMA shadow mirror the param tree, so the shape
    rule must shard them with the SAME spec as their parameter."""
    cfg = tiny_cfg(g_ema=0.999)
    state, _ = build(cfg)
    mesh = make_mesh(8, model_shards=4)
    sh = state_shardings(state, mesh, min_width=16)
    assert 0.0 < sharded_param_fraction(sh) < 1.0

    flat_p = jax.tree_util.tree_leaves_with_path(sh.params_g)
    specs_p = {jax.tree_util.keystr(k): s.spec for k, s in flat_p}
    # EMA mirrors params_g exactly
    for k, s in jax.tree_util.tree_leaves_with_path(sh.params_g_ema):
        assert s.spec == specs_p[jax.tree_util.keystr(k)]
    # at least one wide kernel actually sharded, narrow leaves replicated
    assert any(s != P() for s in specs_p.values())
    assert sh.step.spec == P() and sh.rng.spec == P()
    # adam state embeds two copies of the param tree (mu, nu): every
    # sharded param spec must appear in the opt tree as well
    opt_specs = [
        s.spec for s in jax.tree_util.tree_leaves(
            sh.opt_g, is_leaf=lambda x: isinstance(x, NamedSharding)
        )
    ]
    for spec in specs_p.values():
        if spec != P():
            assert opt_specs.count(spec) >= 2


@pytest.mark.slow
def test_tp_step_matches_single_device():
    """The dp x tp step is the SAME single-program function, partitioned by
    GSPMD — so on identical inputs it must match the single-device step to
    float tolerance (reassociated reductions only)."""
    cfg = tiny_cfg(batch_size=16)
    real = fake_real_batch(cfg, 16)
    rng = jax.random.PRNGKey(7)

    def with_input(step):
        def f(state, raw, r):
            return step(state, raw)

        return f

    state_1, step_1 = build(cfg)
    new_1, metrics_1 = jax.jit(with_input(step_1))(
        state_1, jnp.asarray(real), rng
    )

    mesh = make_mesh(8, model_shards=4)
    state_tp, step_tp = build(cfg)  # same seed -> identical init
    sh = state_shardings(state_tp, mesh, min_width=16)
    assert sharded_param_fraction(sh) > 0
    pstep = make_gspmd_input_step(with_input(step_tp), mesh, sh)
    new_tp, metrics_tp = pstep(shard_state(state_tp, sh), real, rng)

    np.testing.assert_allclose(
        float(metrics_tp["loss_d"]), float(metrics_1["loss_d"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics_tp["loss_g"]), float(metrics_1["loss_g"]), rtol=1e-5
    )
    for name in ("params_g", "params_d"):
        for a, b in zip(
            jax.tree_util.tree_leaves(jax.device_get(getattr(new_tp, name))),
            jax.tree_util.tree_leaves(jax.device_get(getattr(new_1, name))),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_tp_compiled_program_contains_collectives():
    """The partitioned step must contain real XLA collectives (the sharded
    conv/dense layers force all-gathers/all-reduces) — guards against the
    annotations silently propagating to fully-replicated execution."""
    cfg = tiny_cfg(batch_size=16)
    mesh = make_mesh(8, model_shards=4)
    state, step = build(cfg)
    sh = state_shardings(state, mesh, min_width=16)

    def f(state, raw, rng):
        return step(state, raw)

    pstep = make_gspmd_input_step(f, mesh, sh)
    compiled = pstep.lower(
        shard_state(state, sh),
        fake_real_batch(cfg, 16),
        jax.random.PRNGKey(0),
    ).compile()
    text = compiled.as_text()
    assert any(
        op in text for op in ("all-gather", "all-reduce", "reduce-scatter")
    ), "no collectives in the dp x tp program"


def test_resolve_mesh_tp_validations():
    from gea.train.runner import resolve_mesh

    with pytest.raises(SystemExit, match="single-host"):
        resolve_mesh(
            TrainGLISConfig(num_devices=8, model_shards=2, multihost=True)
        )
    with pytest.raises(ValueError, match="must divide"):
        resolve_mesh(TrainGLISConfig(num_devices=8, model_shards=3))


@pytest.mark.slow
def test_tp_cli_train_and_resume(tmp_path):
    """train_glis --model_shards 2: trains, checkpoints, and resumes (the
    orbax round trip must survive sharded arrays)."""
    from gea.cli import train_glis

    args = [
        "--dataset", "synthetic", "--image_size", "16", "--code_size", "16",
        "--num_features", "8", "--max_features", "32", "--batch_size", "8",
        "--dtype", "float32", "--log_interval", "1", "--vis_rows", "2",
        "--num_devices", "8", "--model_shards", "2", "--tp_min_width", "16",
        "--r_iterations", "1", "--vis_interval", "2", "--save_interval", "2",
        "--save_path", str(tmp_path),
    ]
    train_glis.main(args + ["--niter", "2"])
    import os

    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoints", "2"))
    train_glis.main(args + ["--niter", "3", "--save_interval", "3"])
    assert os.path.isdir(os.path.join(str(tmp_path), "checkpoints", "3"))
