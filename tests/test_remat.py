"""--remat tests: rematerialization (jax.checkpoint) must never change
the math — only WHERE activations come from during the backward pass
(recompute vs saved). Every trainer's remat step is checked against the
plain step on identical state/data, and composition with --grad_accum is
pinned. SURVEY.md §4 'Integration'; the flag itself is beyond-reference
TPU-native surface (HBM is the bottleneck — trade FLOPs for memory)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gea.config import (
    TrainGLISConfig,
    TrainRIterativeConfig,
    TrainRSeparateConfig,
)
from gea.models import Discriminator, GeneratorLIS, Reverter
from gea.train.state import add_reverter, create_glis_state, make_optimizer
from gea.train.steps import build_glis_train_step
from gea.train.steps_r import build_r_iterative_step, build_r_separate_step


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


def build(cfg, **step_kw):
    g = GeneratorLIS.from_config(cfg)
    d = Discriminator.from_config(cfg)
    tx_g = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    tx_d = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    state = create_glis_state(cfg, g, d, tx_g, tx_d, 0)
    step = build_glis_train_step(cfg, g, d, tx_g, tx_d, **step_kw)
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
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), atol=atol, rtol=rtol
        )


def _glis_equivalence(extra_cfg, steps=2, atol=5e-6):
    results = []
    for remat in (False, True):
        cfg = tiny_cfg(remat=remat, **extra_cfg)
        state, step = build(cfg)
        jstep = jax.jit(step)
        real = fake_real_batch(cfg, cfg.batch_size)
        for _ in range(steps):
            state, m = jstep(state, real)
        results.append((state, m))
    (s0, m0), (s1, m1) = results
    for k in m0:
        np.testing.assert_allclose(
            float(m0[k]), float(m1[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )
    assert_trees_close(s0.params_g, s1.params_g, atol)
    assert_trees_close(s0.params_d, s1.params_d, atol)
    return results


def test_remat_matches_plain_glis():
    """Shared-vjp path: the pullback recomputes G's forward under remat."""
    _glis_equivalence({})


def test_remat_matches_plain_glis_batch_norm():
    """Batch norm forces the two-forward path; remat wraps the generator
    forward including its mutated batch_stats output."""
    _glis_equivalence({"norm": "batch"}, atol=2e-5)


def test_remat_composes_with_grad_accum():
    """--remat --grad_accum 2 must still equal the plain K=1 step."""
    cfg_plain = tiny_cfg()
    cfg_both = tiny_cfg(remat=True, grad_accum=2)
    s0, step0 = build(cfg_plain)
    s1, step1 = build(cfg_both)
    real = fake_real_batch(cfg_plain, 8)
    for _ in range(2):
        s0, m0 = jax.jit(step0)(s0, real)
        s1, m1 = jax.jit(step1)(s1, real)
    for k in m0:
        np.testing.assert_allclose(
            float(m0[k]), float(m1[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )
    assert_trees_close(s0.params_g, s1.params_g, 5e-6)
    assert_trees_close(s0.params_d, s1.params_d, 5e-6)


@pytest.mark.parametrize("grad_accum", [1, 2])
def test_remat_matches_plain_r_separate(grad_accum):
    """R-separate remat wraps the corrected frozen-G render (the
    D-feedback segment, the memory hog of this trainer) — on both the
    full-batch path and the --grad_accum scan path (which uses the
    prevent_cse=False wrapping)."""
    from gea.cli.train_r_separate import create_r_state

    results = []
    for remat in (False, True):
        rcfg = TrainRSeparateConfig(
            grad_accum=grad_accum if remat else 1,
            image_size=16,
            code_size=16,
            r_iterations=1,
            norm="weight",
            num_features=4,
            max_features=16,
            dtype="float32",
            batch_size=8,
            g_path="unused",
            r_hidden=16,
            lr=2e-3,
            r_adv_weight=0.3,
            r_mine_weight=0.5,
            remat=remat,
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
    (s0, m0), (s1, m1) = results
    for k in m0:
        np.testing.assert_allclose(
            float(m0[k]), float(m1[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )
    assert_trees_close(s0.params_r, s1.params_r, 5e-6)


def test_remat_matches_plain_r_iterative():
    """R-iterative remat checkpoints each chain link; the unrolled chain
    is exactly where per-link recompute buys ~(T+1) x activation memory."""
    results = []
    for remat in (False, True):
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
            remat=remat,
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
    (s0, m0), (s1, m1) = results
    for k in m0:
        np.testing.assert_allclose(
            float(m0[k]), float(m1[k]), rtol=1e-4, atol=1e-6, err_msg=k
        )
    assert_trees_close(s0.params_g, s1.params_g, 5e-6)
    assert_trees_close(s0.params_d, s1.params_d, 5e-6)
    assert_trees_close(s0.params_r, s1.params_r, 5e-6)


def test_remat_composes_with_shard_map():
    """Under the 8-device DP mesh, --remat must match the plain step on
    identical shards: checkpointing changes where activations come from,
    never the per-device gradients entering the pmean."""
    from gea.parallel import make_mesh, make_parallel_step, shard_batch
    from gea.parallel.dp import replicate_state
    from gea.parallel.mesh import DATA_AXIS

    mesh = make_mesh(8)
    real = fake_real_batch(tiny_cfg(), 16)

    results = []
    for remat in (False, True):
        cfg = tiny_cfg(batch_size=16, remat=remat)
        state, step = build(cfg, axis_name=DATA_AXIS)
        pstep = make_parallel_step(step, mesh)
        new_state, metrics = pstep(
            replicate_state(state, mesh), shard_batch(real, mesh)
        )
        results.append((new_state, metrics))
    (s0, m0), (s1, m1) = results
    np.testing.assert_allclose(
        float(m0["loss_d"]), float(m1["loss_d"]), rtol=1e-5
    )
    assert_trees_close(s0.params_g, s1.params_g, 5e-6)
    assert_trees_close(s0.params_d, s1.params_d, 5e-6)
    for leaf in jax.tree_util.tree_leaves(s1.params_g):
        assert leaf.sharding.is_fully_replicated


def _lowered(remat):
    cfg = tiny_cfg(remat=remat, image_size=64, code_size=64, num_features=16,
                   max_features=64, batch_size=32, r_iterations=3)
    state, step = build(cfg)
    real = jnp.zeros((32, 64, 64, 3), jnp.float32)
    return jax.jit(step, donate_argnums=0).lower(state, real)


def test_remat_recomputes_generator_forward():
    """Structural proof the checkpoint engaged: the lowered remat step
    contains MORE convolutions (the recomputed G forward inside the
    pullback) than the plain step. The memory claim itself is only
    meaningful on the TPU compiler's liveness analysis — the CPU backend
    models buffer reuse differently (measured: no temp-size delta there) —
    so the byte assertion lives in the tpu-marked test below and the
    hardware probe (benchmarks/grad_accum_probe.py remat cells)."""
    plain = _lowered(False).as_text().count("stablehlo.convolution")
    remat = _lowered(True).as_text().count("stablehlo.convolution")
    assert remat > plain, (plain, remat)


@pytest.mark.tpu
def test_remat_reduces_compiled_peak_memory_tpu():
    """On the real TPU compiler, remat must shrink the step's peak
    allocation (the whole point of the flag). Uses peak_memory_in_bytes:
    the tunneled axon runtime reports temp_size_in_bytes=0, but peak is
    populated (measured 297 MB -> 138 MB at batch 256 / 64x64)."""
    peaks = {}
    for remat in (False, True):
        compiled = _lowered(remat).compile()
        ma = compiled.memory_analysis()
        peaks[remat] = int(ma.peak_memory_in_bytes)
    assert peaks[False] > 0, peaks
    assert peaks[True] < peaks[False], peaks
