"""Checkpoint round-trip (SURVEY.md §4: 'checkpoint save→resume→bitwise-
state equality'), the cross-tool frozen-G contract, and the reverser train
steps."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gea.config import TrainGLISConfig, TrainRIterativeConfig, TrainRSeparateConfig
from gea.models import Discriminator, GeneratorLIS, Reverter
from gea.train.state import add_reverter, create_glis_state, make_optimizer
from gea.train.steps_r import build_r_iterative_step, build_r_separate_step
from gea.utils.checkpoint import latest_step, restore_checkpoint, save_checkpoint


def tiny_cfg(cls=TrainGLISConfig, **kw):
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
    )
    base.update(kw)
    return cls(**base)


def make_state(cfg, seed=0):
    g = GeneratorLIS.from_config(cfg)
    d = Discriminator.from_config(cfg)
    tx = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    return g, d, tx, create_glis_state(cfg, g, d, tx, tx, seed)


def assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_bitwise_roundtrip(tmp_path):
    cfg = tiny_cfg(save_path=str(tmp_path))
    _, _, _, state = make_state(cfg)
    save_checkpoint(str(tmp_path), 7, state)
    assert latest_step(str(tmp_path)) == 7
    restored = restore_checkpoint(str(tmp_path), state)
    assert_trees_equal(state.params_g, restored.params_g)
    assert_trees_equal(state.params_d, restored.params_d)
    assert_trees_equal(state.opt_g, restored.opt_g)
    assert int(restored.step) == int(state.step)


def test_latest_step_picks_max(tmp_path):
    cfg = tiny_cfg(save_path=str(tmp_path))
    _, _, _, state = make_state(cfg)
    for s in (5, 20, 10):
        save_checkpoint(str(tmp_path), s, state)
    assert latest_step(str(tmp_path)) == 20


def test_checkpoint_retention(tmp_path):
    cfg = tiny_cfg(save_path=str(tmp_path))
    _, _, _, state = make_state(cfg)
    for s in (1, 2, 3, 4):
        save_checkpoint(str(tmp_path), s, state, keep=2)
    root = os.path.join(str(tmp_path), "checkpoints")
    assert sorted(int(d) for d in os.listdir(root)) == [3, 4]


def test_cross_tool_frozen_g_contract(tmp_path):
    """R-separate must rebuild + load a generator from a G-LIS run dir via
    config.json + checkpoint only (SURVEY.md §7 hard part #7)."""
    from gea.cli.sample import load_generator

    run = str(tmp_path / "g_run")
    cfg = tiny_cfg(save_path=run)
    os.makedirs(run, exist_ok=True)
    cfg.save(os.path.join(run, "config.json"))
    g, d, tx, state = make_state(cfg)
    save_checkpoint(run, 3, state)

    g2, variables, cfg2 = load_generator(run)
    assert cfg2.image_size == cfg.image_size
    z = jnp.zeros((2, cfg.code_size))
    images, zs = g2.render(variables, z)
    assert images.shape == (2, 2, 16, 16, 3)  # stages x batch x H x W x C


def test_retention_protects_best_step(tmp_path):
    """`protect=` exempts the best-FID snapshot from keep-N pruning, and
    best.json round-trips through record/best_step/restore(step=-1)."""
    from gea.utils.checkpoint import best_step, record_best_step

    cfg = tiny_cfg(save_path=str(tmp_path))
    _, _, _, state = make_state(cfg)
    record_best_step(str(tmp_path), 2, 12.34, "fid")
    for s in (1, 2, 3, 4, 5):
        save_checkpoint(str(tmp_path), s, state, keep=2, protect=2)
    root = os.path.join(str(tmp_path), "checkpoints")
    assert sorted(int(d) for d in os.listdir(root)) == [2, 4, 5]
    assert best_step(str(tmp_path)) == 2
    restored = restore_checkpoint(str(tmp_path), state, step=-1)
    assert int(restored.step) == int(state.step)


def test_async_keep1_retains_last_committed_until_next_save(tmp_path):
    """With keep=1 and async saves, the prune after launching save(S)
    must keep the newest COMMITTED checkpoint too — save(S) is still
    serializing, so deleting the previous one leaves a crash window with
    zero restorable checkpoints. The extra dir is reclaimed by the next
    save, once S is durable."""
    from gea.utils.checkpoint import wait_for_checkpoints

    cfg = tiny_cfg(save_path=str(tmp_path))
    _, _, _, state = make_state(cfg)
    root = os.path.join(str(tmp_path), "checkpoints")
    save_checkpoint(str(tmp_path), 1, state, keep=1, async_save=True)
    save_checkpoint(str(tmp_path), 2, state, keep=1, async_save=True)
    # step 1 (the last committed) must still be on disk right now
    assert 1 in {int(d) for d in os.listdir(root) if d.isdigit()}
    save_checkpoint(str(tmp_path), 3, state, keep=1, async_save=True)
    wait_for_checkpoints()
    steps = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    assert steps == [2, 3]  # 1 reclaimed once 2 was durable; 2 kept for 3
    restored = restore_checkpoint(str(tmp_path), state, step=3)
    assert int(restored.step) == int(state.step)


def test_retention_protects_committed_and_pending_best(tmp_path):
    """During async best tracking there are TWO steps that must survive
    pruning: the one best.json durably points at and the newer pending
    best whose pointer is not committed yet — pruning away the committed
    one would leave best.json dangling at a deleted directory."""
    cfg = tiny_cfg(save_path=str(tmp_path))
    _, _, _, state = make_state(cfg)
    from gea.utils.checkpoint import record_best_step

    for s in (1, 2, 3):
        save_checkpoint(str(tmp_path), s, state, keep=0)  # no pruning yet
    record_best_step(str(tmp_path), 1, 10.0, "fid")  # committed best = 1
    # new best at 4 is pending; prune must keep committed 1 AND pending 4
    save_checkpoint(str(tmp_path), 4, state, keep=1, protect=(1, 4))
    root = os.path.join(str(tmp_path), "checkpoints")
    assert sorted(int(d) for d in os.listdir(root)) == [1, 4]
    # None entries (no best yet) are tolerated
    save_checkpoint(str(tmp_path), 5, state, keep=1, protect=(None, 4))
    assert sorted(int(d) for d in os.listdir(root)) == [4, 5]
    restored = restore_checkpoint(str(tmp_path), state, step=4)
    assert int(restored.step) == int(state.step)


def test_step_minus_one_without_best_json(tmp_path):
    cfg = tiny_cfg(save_path=str(tmp_path))
    _, _, _, state = make_state(cfg)
    save_checkpoint(str(tmp_path), 1, state)
    with pytest.raises(FileNotFoundError, match="fid_interval"):
        restore_checkpoint(str(tmp_path), state, step=-1)


def test_checkpoint_schema_evolution_ema(tmp_path):
    """Resume stays possible across the --g_ema schema change in every
    direction: pre-EMA checkpoints (field = {} or missing entirely) into
    EMA-enabled states and vice versa (orbax structure mismatch otherwise)."""
    import orbax.checkpoint as ocp
    import dataclasses

    cfg = tiny_cfg(save_path=str(tmp_path))
    g, d, tx, old_state = make_state(cfg)  # g_ema=0 -> params_g_ema={}
    # Perturb the saved params away from fresh init: both states come
    # from the same seed, so without this the "EMA initialized from the
    # RESTORED generator" assertions would also pass for a shadow left at
    # its fresh-init value (the exact bug this test must catch).
    old_state = old_state.replace(
        params_g=jax.tree_util.tree_map(lambda x: x + 1.0, old_state.params_g)
    )
    cfg_ema = tiny_cfg(save_path=str(tmp_path), g_ema=0.99)
    ema_state = create_glis_state(cfg_ema, g, d, tx, tx, 0)

    # pre-EMA checkpoint ({} field) -> EMA-enabled target: EMA initialized
    # from the restored generator params.
    run_a = str(tmp_path / "a")
    save_checkpoint(run_a, 5, old_state)
    r = restore_checkpoint(run_a, ema_state)
    assert_trees_equal(r.params_g_ema, old_state.params_g)

    # EMA checkpoint -> non-EMA target: shadow dropped.
    run_b = str(tmp_path / "b")
    save_checkpoint(run_b, 5, ema_state)
    r = restore_checkpoint(run_b, old_state)
    assert r.params_g_ema == {}
    assert_trees_equal(r.params_g, ema_state.params_g)

    # checkpoint written before the field existed at all (raw dict without
    # the key) -> both target flavors restore.
    raw = {
        f.name: getattr(jax.device_get(old_state), f.name)
        for f in dataclasses.fields(old_state)
    }
    raw.pop("params_g_ema")
    run_c = str(tmp_path / "c")
    ocp.PyTreeCheckpointer().save(
        os.path.join(run_c, "checkpoints", "5"), raw, force=True
    )
    r = restore_checkpoint(run_c, old_state)
    assert r.params_g_ema == {}
    r = restore_checkpoint(run_c, ema_state)
    assert_trees_equal(r.params_g_ema, old_state.params_g)
    assert_trees_equal(r.opt_g, old_state.opt_g)


def test_frozen_g_step_selection(tmp_path):
    """`--g_step` (R-separate) / `--step` (samplers) pick a specific frozen
    snapshot, not the latest — GAN quality is non-monotone so the best
    checkpoint is rarely the last one."""
    from gea.cli.sample import load_generator

    run = str(tmp_path / "g_run")
    cfg = tiny_cfg(save_path=run)
    os.makedirs(run, exist_ok=True)
    cfg.save(os.path.join(run, "config.json"))
    _, _, _, state = make_state(cfg)
    save_checkpoint(run, 3, state)
    bumped = state.replace(
        params_g=jax.tree_util.tree_map(lambda p: p + 1.0, state.params_g)
    )
    save_checkpoint(run, 9, bumped)

    _, vars_3, _ = load_generator(run, step=3)
    _, vars_latest, _ = load_generator(run)
    assert_trees_equal(vars_3["params"], state.params_g)
    assert_trees_equal(vars_latest["params"], bumped.params_g)


def test_r_separate_step(tmp_path):
    cfg = tiny_cfg(TrainRSeparateConfig, g_path="unused", r_hidden=16, lr=2e-3)
    g, d, tx, state = make_state(cfg)
    frozen_vars = {"params": state.params_g, **state.extras_g}
    reverter = Reverter.from_config(cfg)
    from gea.cli.train_r_separate import create_r_state

    rstate = create_r_state(cfg, reverter, tx, 0)
    step = build_r_separate_step(cfg, g, reverter, frozen_vars, tx)
    jstep = jax.jit(step)
    dummy = jnp.zeros((1,))
    s1, m1 = jstep(rstate, dummy)
    assert np.isfinite(float(m1["loss_r"]))
    assert int(s1.step) == 1
    # R params must move, and training should reduce the loss on average.
    losses = [float(m1["loss_r"])]
    s = s1
    for _ in range(39):
        s, m = jstep(s, dummy)
        losses.append(float(m["loss_r"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_r_iterative_step():
    cfg = tiny_cfg(TrainRIterativeConfig, r_chain_length=2, r_hidden=16)
    g = GeneratorLIS.from_config(cfg, r_iterations=0)
    d = Discriminator.from_config(cfg)
    reverter = Reverter.from_config(cfg)
    tx = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    state = create_glis_state(cfg, g, d, tx, tx, 0)
    state = add_reverter(state, cfg, reverter, tx, 0)
    step = build_r_iterative_step(cfg, g, d, reverter, tx, tx, tx)
    jstep = jax.jit(step)
    real = jnp.asarray(
        np.random.default_rng(0)
        .uniform(-1, 1, (8, 16, 16, 3))
        .astype(np.float32)
    )
    s1, m = jstep(state, real)
    for k in ("loss_d", "loss_g", "loss_r_sim", "d_real"):
        assert np.isfinite(float(m[k])), k
    for name, old, new in [
        ("g", state.params_g, s1.params_g),
        ("d", state.params_d, s1.params_d),
        ("r", state.params_r, s1.params_r),
    ]:
        moved = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(old), jax.tree_util.tree_leaves(new)
            )
        )
        assert moved > 0, f"params_{name} did not update"


def test_r_iterative_step_batch_norm_stats_update():
    """With --norm batch, the jointly-trained G/R/D must all update their
    batch statistics inside the chain unroll (they are being trained, not
    frozen)."""
    cfg = tiny_cfg(TrainRIterativeConfig, norm="batch", r_chain_length=1,
                   r_hidden=16)
    g = GeneratorLIS.from_config(cfg, r_iterations=0)
    d = Discriminator.from_config(cfg)
    reverter = Reverter.from_config(cfg)
    tx = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    state = create_glis_state(cfg, g, d, tx, tx, 0)
    state = add_reverter(state, cfg, reverter, tx, 0)
    assert state.extras_g and state.extras_d and state.extras_r
    step = jax.jit(build_r_iterative_step(cfg, g, d, reverter, tx, tx, tx))
    real = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (8, 16, 16, 3)).astype(np.float32)
    )
    s1, m = step(state, real)
    assert np.isfinite(float(m["loss_d"]))
    for name, old, new in [
        ("g", state.extras_g, s1.extras_g),
        ("d", state.extras_d, s1.extras_d),
        ("r", state.extras_r, s1.extras_r),
    ]:
        moved = max(
            float(jnp.max(jnp.abs(a - b)))
            for a, b in zip(
                jax.tree_util.tree_leaves(old), jax.tree_util.tree_leaves(new)
            )
        )
        assert moved > 0, f"batch_stats_{name} did not update"


def test_r_separate_d_feedback_and_mining():
    """D-feedback R-separate (VERDICT r1 #4): with the frozen G run's D
    passed in, the loss gains an adversarial term on G(R(G(z))) and the
    defective-z mining re-weights reconstruction; both must train stably
    and the adv term must actually influence the total."""
    cfg = tiny_cfg(
        TrainRSeparateConfig, g_path="unused", r_hidden=16, lr=2e-3,
        r_adv_weight=0.5, r_mine_weight=0.5,
    )
    g, d, tx, state = make_state(cfg)
    frozen_g = {"params": state.params_g, **state.extras_g}
    frozen_d = {"params": state.params_d, **state.extras_d}
    reverter = Reverter.from_config(cfg)
    from gea.cli.train_r_separate import create_r_state

    rstate = create_r_state(cfg, reverter, tx, 0)
    step_adv = jax.jit(
        build_r_separate_step(
            cfg, g, reverter, frozen_g, tx,
            discriminator=d, frozen_d_variables=frozen_d,
        )
    )
    dummy = jnp.zeros((1,))
    s, m = step_adv(rstate, dummy)
    assert float(m["loss_r_adv"]) > 0.0
    assert np.isfinite(float(m["loss_r"]))
    # total = mse_weight * mse + adv_weight * adv (mining reweights mse,
    # so compare the composition identity on the reported terms)
    np.testing.assert_allclose(
        float(m["loss_r"]),
        cfg.r_mse_weight * float(m["loss_r_mse"])
        + cfg.r_adv_weight * float(m["loss_r_adv"]),
        rtol=1e-5,
    )
    for _ in range(10):
        s, m = step_adv(s, dummy)
        assert np.isfinite(float(m["loss_r"]))

    # without D, the adv metric is exactly zero (pure-MSE round-1 path)
    step_mse = jax.jit(
        build_r_separate_step(cfg, g, reverter, frozen_g, tx)
    )
    _, m0 = step_mse(rstate, dummy)
    assert float(m0["loss_r_adv"]) == 0.0


def test_r_separate_d_feedback_with_spatial_code():
    """The adversarial re-render must pass the SAME spatial noise as the
    defective render: a --spatial_code generator rejects a render without
    it (regression — the adv term made R-separate untrainable for every
    spatial-code G)."""
    cfg = tiny_cfg(
        TrainRSeparateConfig, g_path="unused", r_hidden=16,
        r_adv_weight=0.5, spatial_code=2,
    )
    g, d, tx, state = make_state(cfg)
    frozen_g = {"params": state.params_g, **state.extras_g}
    frozen_d = {"params": state.params_d, **state.extras_d}
    reverter = Reverter.from_config(cfg)
    from gea.cli.train_r_separate import create_r_state

    rstate = create_r_state(cfg, reverter, tx, 0)
    step = jax.jit(
        build_r_separate_step(
            cfg, g, reverter, frozen_g, tx,
            discriminator=d, frozen_d_variables=frozen_d,
        )
    )
    s, m = step(rstate, jnp.zeros((1,)))
    assert float(m["loss_r_adv"]) > 0.0
    assert np.isfinite(float(m["loss_r"]))
