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


# ----------------------------------------------------------- fused seed


@pytest.mark.parametrize(
    "s0,c0,c1,batch,code",
    [(5, 64, 32, 7, 16), (4, 128, 64, 33, 32)],
)
def test_fused_seed_matches_reference(rng, s0, c0, c1, batch, code):
    """The fused project+TPReLU+ConvT(4,2,1) kernel vs its XLA reference
    (interpret mode on CPU), including non-tile-multiple batches."""
    from gea.ops.pallas.seed import fused_seed, fused_seed_reference

    z = jnp.asarray(rng.standard_normal((batch, code), dtype=np.float32))
    wp = jnp.asarray(
        rng.standard_normal((code, s0 * s0 * c0), dtype=np.float32) * 0.05
    )
    bp = jnp.asarray(rng.standard_normal(s0 * s0 * c0, dtype=np.float32) * 0.1)
    slope = jnp.asarray(rng.random(c0, dtype=np.float32) * 0.4 + 0.1)
    trans = jnp.asarray(rng.standard_normal(c0, dtype=np.float32) * 0.1)
    wc = jnp.asarray(
        rng.standard_normal((4, 4, c0, c1), dtype=np.float32) * 0.05
    )
    bc = jnp.asarray(rng.standard_normal(c1, dtype=np.float32) * 0.1)
    want = fused_seed_reference(z, wp, bp, slope, trans, wc, bc, s0)
    got = fused_seed(z, wp, bp, slope, trans, wc, bc, s0, True)
    assert got.shape == (batch, 2 * s0, 2 * s0, c1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-4
    )


def test_fused_seed_grads_match(rng):
    """custom_vjp of the fused seed kernel == grads of the reference
    composite, for every differentiable input."""
    from gea.ops.pallas.seed import fused_seed, fused_seed_reference

    s0, c0, c1, batch, code = 5, 32, 16, 8, 16
    args = [
        jnp.asarray(rng.standard_normal((batch, code), dtype=np.float32)),
        jnp.asarray(
            rng.standard_normal((code, s0 * s0 * c0), dtype=np.float32) * 0.05
        ),
        jnp.asarray(rng.standard_normal(s0 * s0 * c0, dtype=np.float32) * 0.1),
        jnp.asarray(rng.random(c0, dtype=np.float32) * 0.4 + 0.1),
        jnp.asarray(rng.standard_normal(c0, dtype=np.float32) * 0.1),
        jnp.asarray(
            rng.standard_normal((4, 4, c0, c1), dtype=np.float32) * 0.05
        ),
        jnp.asarray(rng.standard_normal(c1, dtype=np.float32) * 0.1),
    ]
    gk = jax.grad(
        lambda *a: jnp.sum(fused_seed(*a, s0, True) ** 2),
        argnums=tuple(range(7)),
    )(*args)
    gr = jax.grad(
        lambda *a: jnp.sum(fused_seed_reference(*a, s0) ** 2),
        argnums=tuple(range(7)),
    )(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3
        )


def test_fused_seed_bf16_cotangent(rng):
    """The training step runs the network in bf16, so the cotangent that
    reaches fused_seed's custom VJP can be NARROWER than the f32 reference
    forward's output; the backward must cast it before invoking the
    reference vjp (regression: ValueError 'unexpected JAX type' in the
    first on-chip full-step A/B)."""
    from gea.ops.pallas.seed import fused_seed

    s0, c0, c1, batch, code = 5, 32, 16, 8, 16
    args = [
        jnp.asarray(rng.standard_normal((batch, code), dtype=np.float32)),
        jnp.asarray(
            rng.standard_normal((code, s0 * s0 * c0), dtype=np.float32) * 0.05
        ),
        jnp.asarray(rng.standard_normal(s0 * s0 * c0, dtype=np.float32) * 0.1),
        jnp.asarray(rng.random(c0, dtype=np.float32) * 0.4 + 0.1),
        jnp.asarray(rng.standard_normal(c0, dtype=np.float32) * 0.1),
        jnp.asarray(
            rng.standard_normal((4, 4, c0, c1), dtype=np.float32) * 0.05
        ),
        jnp.asarray(rng.standard_normal(c1, dtype=np.float32) * 0.1),
    ]
    # bf16 downstream consumer: the pullback's incoming cotangent is bf16.
    grads = jax.grad(
        lambda *a: jnp.sum(
            fused_seed(*a, s0, True).astype(jnp.bfloat16) ** 2
        ).astype(jnp.float32),
        argnums=tuple(range(7)),
    )(*args)
    for g in grads:
        assert np.isfinite(np.asarray(g, dtype=np.float32)).all()


@pytest.mark.parametrize("norm", ["weight", "none"])
def test_generator_fused_seed_param_tree_and_output(rng, norm):
    """GeneratorLIS(fused_seed=True) shares one param tree with the
    default lowering (checkpoints interchangeable) and produces the same
    images on CPU (where the fused path runs its XLA reference)."""
    from gea.models import GeneratorLIS

    kw = dict(
        image_size=32, code_size=16, r_iterations=1, norm=norm,
        num_features=8, max_features=32, dtype=jnp.float32,
    )
    g_x = GeneratorLIS(**kw)
    g_f = GeneratorLIS(**kw, fused_seed=True)
    z = jnp.asarray(rng.standard_normal((4, 16), dtype=np.float32))
    v_x = g_x.init(jax.random.PRNGKey(0), z, train=False)
    v_f = g_f.init(jax.random.PRNGKey(0), z, train=False)
    assert jax.tree_util.tree_structure(v_x) == jax.tree_util.tree_structure(
        v_f
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(v_x), jax.tree_util.tree_leaves(v_f)
    ):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    img_x, _ = g_x.apply(v_x, z, train=False, render_all_stages=True)
    img_f, _ = g_f.apply(v_x, z, train=False, render_all_stages=True)
    np.testing.assert_allclose(
        np.asarray(img_x), np.asarray(img_f), atol=2e-5, rtol=1e-4
    )


def test_generator_fused_seed_batch_norm_falls_back(rng):
    """norm=batch cannot fold its normalization into the fused kernel —
    the flag must quietly keep the standard lowering."""
    from gea.models import GeneratorLIS

    g = GeneratorLIS(
        image_size=16, code_size=8, r_iterations=0, norm="batch",
        num_features=4, max_features=8, dtype=jnp.float32, fused_seed=True,
    )
    z = jnp.asarray(rng.standard_normal((2, 8), dtype=np.float32))
    v = g.init(jax.random.PRNGKey(0), z, train=False)
    img, _ = g.apply(v, z, train=False)
    assert img.shape == (1, 2, 16, 16, 3)
