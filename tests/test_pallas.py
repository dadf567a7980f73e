"""Pallas kernel tests (SURVEY.md §4 'Kernel tests': each kernel vs its
jnp reference under allclose, interpret mode on CPU) + the subpixel
conv-transpose decomposition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gea.ops.layers import conv_transpose2d_subpixel, conv_transpose2d_torch
from gea.ops.pallas.lis import lis_residual_mlp, lis_residual_mlp_reference
from gea.ops.pallas.tprelu import fused_tprelu, fused_tprelu_reference


@pytest.mark.parametrize("shape", [(16, 128), (8, 4, 4, 128), (33, 256)])
def test_fused_tprelu_matches_reference(rng, shape):
    c = shape[-1]
    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    a = jnp.asarray(rng.random(c, dtype=np.float32) * 0.5)
    b = jnp.asarray(rng.standard_normal(c, dtype=np.float32))
    got = fused_tprelu(x, a, b, True)
    want = fused_tprelu_reference(x, a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_fused_tprelu_grads_match(rng):
    x = jnp.asarray(rng.standard_normal((8, 128), dtype=np.float32))
    a = jnp.asarray(rng.random(128, dtype=np.float32) * 0.5)
    b = jnp.asarray(rng.standard_normal(128, dtype=np.float32))

    def loss_kernel(x, a, b):
        return jnp.sum(fused_tprelu(x, a, b, True) ** 2)

    def loss_ref(x, a, b):
        return jnp.sum(fused_tprelu_reference(x, a, b) ** 2)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, a, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, a, b)
    for k, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(k), np.asarray(r), atol=1e-4)


@pytest.mark.parametrize("batch,code,hidden", [(16, 128, 128), (30, 256, 512)])
def test_lis_kernel_matches_reference(rng, batch, code, hidden):
    z = jnp.asarray(rng.standard_normal((batch, code), dtype=np.float32))
    w1 = jnp.asarray(rng.standard_normal((code, hidden), dtype=np.float32) * 0.1)
    b1 = jnp.asarray(rng.standard_normal(hidden, dtype=np.float32) * 0.1)
    a = jnp.asarray(rng.random(hidden, dtype=np.float32) * 0.5)
    t = jnp.asarray(rng.standard_normal(hidden, dtype=np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((hidden, code), dtype=np.float32) * 0.1)
    b2 = jnp.asarray(rng.standard_normal(code, dtype=np.float32) * 0.1)
    got = lis_residual_mlp(z, w1, b1, a, t, w2, b2, True)
    want = lis_residual_mlp_reference(z, w1, b1, a, t, w2, b2)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_lis_kernel_grads_match(rng):
    code, hidden = 128, 128
    z = jnp.asarray(rng.standard_normal((8, code), dtype=np.float32))
    params = [
        jnp.asarray(rng.standard_normal((code, hidden), dtype=np.float32) * 0.1),
        jnp.asarray(rng.standard_normal(hidden, dtype=np.float32) * 0.1),
        jnp.asarray(rng.random(hidden, dtype=np.float32) * 0.5),
        jnp.asarray(rng.standard_normal(hidden, dtype=np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((hidden, code), dtype=np.float32) * 0.1),
        jnp.asarray(rng.standard_normal(code, dtype=np.float32) * 0.1),
    ]

    def lk(z, *p):
        return jnp.sum(lis_residual_mlp(z, *p, True) ** 2)

    def lr(z, *p):
        return jnp.sum(lis_residual_mlp_reference(z, *p) ** 2)

    argnums = tuple(range(7))
    gk = jax.grad(lk, argnums=argnums)(z, *params)
    gr = jax.grad(lr, argnums=argnums)(z, *params)
    for k, r in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(k), np.asarray(r), rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize("cin,cout,size", [(8, 4, 5), (3, 7, 10), (5, 5, 4)])
def test_subpixel_conv_transpose_exact(rng, cin, cout, size):
    x = jnp.asarray(rng.standard_normal((2, size, size, cin), dtype=np.float32))
    w = jnp.asarray(
        rng.standard_normal((4, 4, cin, cout), dtype=np.float32)
    )
    a = conv_transpose2d_torch(x, w, stride=2, padding=1)
    b = conv_transpose2d_subpixel(x, w)
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
    )


def test_lis_module_pallas_param_tree_compatible(rng):
    """The pallas and XLA LIS paths must share one parameter tree so
    checkpoints are interchangeable (gea/models/generator.py LISModule)."""
    from gea.models.generator import LISModule

    z = jnp.asarray(rng.standard_normal((4, 32), dtype=np.float32))
    m_x = LISModule(code_size=32, use_pallas=False)
    m_p = LISModule(code_size=32, use_pallas=True)
    v_x = m_x.init(jax.random.PRNGKey(0), z)
    v_p = m_p.init(jax.random.PRNGKey(0), z)
    tx = jax.tree_util.tree_structure(v_x)
    tp = jax.tree_util.tree_structure(v_p)
    assert tx == tp
    # On CPU pallas_available() is False, so both apply the XLA path and
    # must agree exactly.
    np.testing.assert_allclose(
        np.asarray(m_x.apply(v_x, z)), np.asarray(m_p.apply(v_p, z)), atol=1e-6
    )
