"""--lr_schedule (round 5): cosine/linear decay from --lr to
--lr_final * --lr over --niter optimizer updates, riding optax's
checkpointed update count so resume continues the schedule exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gea.train.state import make_optimizer


def _update_scale(tx, n_updates):
    """Magnitude of the n-th Adam update for a constant gradient."""
    params = {"w": jnp.zeros((3,))}
    grads = {"w": jnp.ones((3,))}
    state = tx.init(params)
    upd = None
    for _ in range(n_updates):
        upd, state = tx.update(grads, state, params)
    return float(jnp.abs(upd["w"]).max()), state


def test_linear_schedule_decays_to_floor():
    tx = make_optimizer(
        1e-3, 0.5, 0.999, schedule="linear", total_steps=10, lr_final=0.1
    )
    first, _ = _update_scale(tx, 1)
    last, _ = _update_scale(tx, 11)
    # Adam's unit-scale update times the schedule: ~lr at step 0,
    # ~0.1*lr once past total_steps.
    assert first > 5 * last
    np.testing.assert_allclose(last, 1e-4, rtol=0.2)


def test_cosine_schedule_monotone_and_bounded():
    tx = make_optimizer(
        1e-3, 0.5, 0.999, schedule="cosine", total_steps=8, lr_final=0.0
    )
    scales = [_update_scale(tx, n)[0] for n in (1, 4, 9)]
    assert scales[0] > scales[1] > scales[2]
    assert scales[2] < 1e-4  # decayed essentially to zero


def test_constant_is_default_and_identical():
    a = make_optimizer(1e-3, 0.5, 0.999)
    b = make_optimizer(
        1e-3, 0.5, 0.999, schedule="constant", total_steps=100, lr_final=0.5
    )
    sa, _ = _update_scale(a, 3)
    sb, _ = _update_scale(b, 3)
    np.testing.assert_allclose(sa, sb, rtol=1e-7)


def test_schedule_continues_across_state_roundtrip():
    """The schedule reads the opt-state count, so a save/restore of the
    state (what checkpoints do) continues the decay instead of
    restarting it."""
    tx = make_optimizer(
        1e-3, 0.5, 0.999, schedule="linear", total_steps=10, lr_final=0.0
    )
    params = {"w": jnp.zeros((3,))}
    grads = {"w": jnp.ones((3,))}
    state = tx.init(params)
    for _ in range(5):
        _, state = tx.update(grads, state, params)
    # Round-trip through host memory, as orbax restore does.
    restored = jax.tree_util.tree_map(
        lambda x: jnp.asarray(np.asarray(x)), state
    )
    upd_restored, _ = tx.update(grads, restored, params)
    upd_direct, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(
        np.asarray(upd_restored["w"]), np.asarray(upd_direct["w"]), rtol=1e-7
    )


def test_cli_accepts_schedule_flags():
    from gea.config import TrainGLISConfig, TrainRSeparateConfig

    cfg = TrainGLISConfig.from_args(
        ["--lr_schedule", "cosine", "--lr_final", "0.05"]
    )
    assert cfg.lr_schedule == "cosine" and cfg.lr_final == 0.05
    cfg_r = TrainRSeparateConfig.from_args(["--lr_schedule", "linear"])
    assert cfg_r.lr_schedule == "linear"
