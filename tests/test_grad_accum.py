"""--grad_accum tests: the K-microbatch accumulated step must be
numerically identical to the K=1 step at the same batch size (the flag's
whole contract — it trades compute serialization for ~K x lower
activation memory, never different math). SURVEY.md §4 'Integration'."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gea.config import TrainGLISConfig
from gea.models import Discriminator, GeneratorLIS
from gea.parallel import make_mesh, make_parallel_step, shard_batch
from gea.parallel.dp import replicate_state
from gea.parallel.mesh import DATA_AXIS
from gea.train.state import create_glis_state, make_optimizer
from gea.train.steps import build_glis_train_step


def tiny_cfg(**kw):
    base = dict(
        image_size=16,
        code_size=16,
        r_iterations=1,
        norm="weight",
        num_features=4,
        max_features=16,
        dtype="float32",
        batch_size=8,
        dataset="synthetic",
        lr=1e-3,
    )
    base.update(kw)
    return TrainGLISConfig(**base)


def build(cfg, axis_name=None, seed=0, **step_kw):
    g = GeneratorLIS.from_config(cfg)
    d = Discriminator.from_config(cfg)
    tx_g = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    tx_d = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    state = create_glis_state(cfg, g, d, tx_g, tx_d, seed)
    step = build_glis_train_step(
        cfg, g, d, tx_g, tx_d, axis_name=axis_name, **step_kw
    )
    return state, step


def fake_real_batch(cfg, n):
    rng = np.random.default_rng(0)
    return rng.uniform(-1, 1, (n, cfg.image_size, cfg.image_size, 3)).astype(
        np.float32
    )


def assert_trees_close(a, b, atol, rtol=1e-4):
    for x, y in zip(
        jax.tree_util.tree_leaves(jax.device_get(a)),
        jax.tree_util.tree_leaves(jax.device_get(b)),
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=rtol)


def _run_equivalence(extra_cfg, steps=2, atol=5e-6):
    """accum=4 over 2 steps must match accum=1 on the same data/seed."""
    cfg1 = tiny_cfg(**extra_cfg)
    cfg4 = tiny_cfg(grad_accum=4, **extra_cfg)
    state1, step1 = build(cfg1)
    state4, step4 = build(cfg4)
    j1 = jax.jit(step1)
    j4 = jax.jit(step4)
    real = fake_real_batch(cfg1, cfg1.batch_size)
    for _ in range(steps):
        state1, m1 = j1(state1, real)
        state4, m4 = j4(state4, real)
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m4[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )
    assert_trees_close(state1.params_g, state4.params_g, atol)
    assert_trees_close(state1.params_d, state4.params_d, atol)
    return state1, state4


def test_accum_matches_full_batch_bce():
    _run_equivalence({})


def test_accum_matches_full_batch_with_spatial_noise_and_ema():
    s1, s4 = _run_equivalence({"spatial_code": 4, "g_ema": 0.9})
    assert_trees_close(s1.params_g_ema, s4.params_g_ema, 5e-6)


def test_accum_matches_full_batch_wgan_gp():
    """The GP interpolation coefficients are drawn full-batch then sliced,
    so the grad-of-grad penalty is also exactly preserved under K>1.

    SGD instead of Adam here: the Wasserstein loss is shift-invariant, so
    D's head-bias gradient is mathematically ZERO (the -mean/+mean
    adversarial terms cancel and the GP never sees the bias) — Adam's
    first update on that leaf is g/(|g|+eps) of pure float noise, i.e. an
    arbitrary sign at full lr, which no tolerance survives. SGD keeps the
    comparison what the flag promises: accumulated grads == full-batch
    grads."""
    import optax

    from gea.train.steps import build_glis_train_step as build_step

    states, metrics, cfgs = [], [], [
        tiny_cfg(gan_loss="wgan-gp", gp_weight=10.0),
        tiny_cfg(gan_loss="wgan-gp", gp_weight=10.0, grad_accum=4),
    ]
    real = fake_real_batch(cfgs[0], 8)
    for cfg in cfgs:
        g = GeneratorLIS.from_config(cfg)
        d = Discriminator.from_config(cfg)
        tx = optax.sgd(1e-3)
        state = create_glis_state(cfg, g, d, tx, tx, 0)
        step = jax.jit(build_step(cfg, g, d, tx, tx))
        for _ in range(2):
            state, m = step(state, real)
        states.append(state)
        metrics.append(m)
    for k in metrics[0]:
        np.testing.assert_allclose(
            float(metrics[0][k]), float(metrics[1][k]), rtol=1e-5, err_msg=k
        )
    assert_trees_close(states[0].params_d, states[1].params_d, 5e-7)
    assert_trees_close(states[0].params_g, states[1].params_g, 5e-7)


def test_accum_rejects_batch_norm():
    cfg = tiny_cfg(norm="batch", grad_accum=2)
    with pytest.raises(ValueError, match="grad_accum"):
        build(cfg)


def test_accum_rejects_indivisible_batch():
    cfg = tiny_cfg(grad_accum=3)  # 8 % 3 != 0
    state, step = build(cfg)
    with pytest.raises(ValueError, match="divisible"):
        jax.jit(step)(state, fake_real_batch(cfg, 8))


def test_accum_matches_full_batch_r_separate():
    """R-separate --grad_accum with the full loss surface on (D-feedback
    adversarial term + defective-z mining): the mining weights normalize
    over the WHOLE batch, so they are computed outside the microbatch
    scan — K=4 must match K=1 exactly."""
    from gea.cli.train_r_separate import create_r_state
    from gea.config import TrainRSeparateConfig
    from gea.models import Reverter
    from gea.train.steps_r import build_r_separate_step

    results = []
    for accum in (1, 4):
        cfg = tiny_cfg()
        rcfg = TrainRSeparateConfig(
            image_size=cfg.image_size,
            code_size=cfg.code_size,
            r_iterations=cfg.r_iterations,
            norm="weight",
            num_features=cfg.num_features,
            max_features=cfg.max_features,
            dtype="float32",
            batch_size=8,
            g_path="unused",
            r_hidden=16,
            lr=2e-3,
            r_adv_weight=0.3,
            r_mine_weight=0.5,
            grad_accum=accum,
        )
        g = GeneratorLIS.from_config(rcfg)
        d = Discriminator.from_config(rcfg)
        tx = make_optimizer(rcfg.lr, rcfg.beta1, rcfg.beta2)
        gstate = create_glis_state(rcfg, g, d, tx, tx, 0)
        frozen_g = {"params": gstate.params_g, **gstate.extras_g}
        frozen_d = {"params": gstate.params_d, **gstate.extras_d}
        reverter = Reverter.from_config(rcfg)
        rstate = create_r_state(rcfg, reverter, tx, 0)
        step = jax.jit(
            build_r_separate_step(
                rcfg, g, reverter, frozen_g, tx,
                discriminator=d, frozen_d_variables=frozen_d,
            )
        )
        dummy = jnp.zeros((1,))
        for _ in range(2):
            rstate, m = step(rstate, dummy)
        results.append((rstate, m))
    (s1, m1), (s4, m4) = results
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m4[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )
    assert_trees_close(s1.params_r, s4.params_r, 5e-6)


def test_accum_matches_full_batch_r_iterative():
    """R-iterative --grad_accum: both phases (D on detached chain renders,
    joint G+R vs the new D) accumulate exactly."""
    from gea.config import TrainRIterativeConfig
    from gea.models import Reverter
    from gea.train.state import add_reverter
    from gea.train.steps_r import build_r_iterative_step

    results = []
    for accum in (1, 4):
        cfg = TrainRIterativeConfig(
            image_size=16,
            code_size=16,
            norm="weight",
            num_features=4,
            max_features=16,
            dtype="float32",
            batch_size=8,
            dataset="synthetic",
            r_chain_length=2,
            r_hidden=16,
            lr=1e-3,
            grad_accum=accum,
        )
        g = GeneratorLIS.from_config(cfg, r_iterations=0)
        d = Discriminator.from_config(cfg)
        reverter = Reverter.from_config(cfg)
        tx = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
        state = create_glis_state(cfg, g, d, tx, tx, 0)
        state = add_reverter(state, cfg, reverter, tx, 0)
        step = jax.jit(build_r_iterative_step(cfg, g, d, reverter, tx, tx, tx))
        real = fake_real_batch(cfg, 8)
        for _ in range(2):
            state, m = step(state, real)
        results.append((state, m))
    (s1, m1), (s4, m4) = results
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m4[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )
    assert_trees_close(s1.params_g, s4.params_g, 5e-6)
    assert_trees_close(s1.params_d, s4.params_d, 5e-6)
    assert_trees_close(s1.params_r, s4.params_r, 5e-6)


@pytest.mark.slow
def test_accum_composes_with_tensor_parallelism():
    """--grad_accum under GSPMD dp x tp (--model_shards): the accum scan is
    part of the same single-program step that jit partitions, so K=2 must
    match K=1 on the identical mesh/shardings."""
    from gea.parallel.mesh import make_mesh
    from gea.parallel.tp import (
        make_gspmd_input_step,
        shard_state,
        sharded_param_fraction,
        state_shardings,
    )

    mesh = make_mesh(8, model_shards=4)
    real = fake_real_batch(tiny_cfg(), 16)
    rng = jax.random.PRNGKey(7)

    results = []
    for accum in (1, 2):
        cfg = tiny_cfg(batch_size=16, grad_accum=accum)
        state, step = build(cfg)  # same seed -> identical init

        def with_input(state, raw, r, _step=step):
            return _step(state, raw)

        sh = state_shardings(state, mesh, min_width=16)
        assert sharded_param_fraction(sh) > 0
        pstep = make_gspmd_input_step(with_input, mesh, sh)
        new_state, metrics = pstep(shard_state(state, sh), real, rng)
        results.append((new_state, metrics))
    (s1, m1), (s2, m2) = results
    for k in m1:
        np.testing.assert_allclose(
            float(m1[k]), float(m2[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )
    assert_trees_close(s1.params_g, s2.params_g, 2e-5)
    assert_trees_close(s1.params_d, s2.params_d, 2e-5)


def test_check_batch_tp_divides_over_data_axis_only():
    """check_batch must divide the batch by the DATA axis size, not the
    full mesh: dp2 x tp4 with batch 16 and --grad_accum 4 is valid (each
    data shard holds 8), and was falsely rejected when per_device used
    devices=8."""
    from gea.train.runner import check_batch

    check_batch(tiny_cfg(batch_size=16, grad_accum=4, model_shards=4), 8)
    with pytest.raises(ValueError, match="grad_accum"):
        check_batch(tiny_cfg(batch_size=16, grad_accum=4), 8)


@pytest.mark.slow
def test_accum_composes_with_chunked_dispatch(tmp_path):
    """--grad_accum 2 under --steps_per_dispatch 2 (a scan nested inside
    the dispatch scan) trains end-to-end through the real CLI and resumes."""
    from gea.cli import train_glis

    run = str(tmp_path / "ga_chunked")
    args = [
        "--dataset", "synthetic", "--image_size", "16", "--code_size", "16",
        "--num_features", "4", "--max_features", "16", "--batch_size", "4",
        "--dtype", "float32", "--log_interval", "1", "--vis_rows", "2",
        "--num_devices", "1", "--r_iterations", "1",
        "--grad_accum", "2", "--steps_per_dispatch", "2",
        "--vis_interval", "10", "--save_interval", "4", "--save_path", run,
    ]
    state, stats = train_glis.main(args + ["--niter", "4"])
    assert int(state.step) == 4
    state2, _ = train_glis.main(args + ["--niter", "8"])
    assert int(state2.step) == 8


@pytest.mark.slow
def test_accum_composes_with_shard_map():
    """Under the 8-device DP mesh, accum=2 must match accum=1 (same seeds,
    same shards): accumulation happens per device BEFORE the pmean, so the
    reduction contract is unchanged."""
    mesh = make_mesh(8)
    real = fake_real_batch(tiny_cfg(), 16)

    results = []
    for accum in (1, 2):
        cfg = tiny_cfg(batch_size=16, grad_accum=accum)
        state, step = build(cfg, axis_name=DATA_AXIS)
        pstep = make_parallel_step(step, mesh)
        new_state, metrics = pstep(
            replicate_state(state, mesh), shard_batch(real, mesh)
        )
        results.append((new_state, metrics))
    (s1, m1), (s2, m2) = results
    np.testing.assert_allclose(
        float(m1["loss_d"]), float(m2["loss_d"]), rtol=1e-5
    )
    assert_trees_close(s1.params_g, s2.params_g, 5e-6)
    assert_trees_close(s1.params_d, s2.params_d, 5e-6)
    for leaf in jax.tree_util.tree_leaves(s2.params_g):
        assert leaf.sharding.is_fully_replicated
