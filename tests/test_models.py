"""Shape/semantics tests for the model family (SURVEY.md §4 'Unit')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gea.models import Discriminator, GeneratorLIS, Reverter
from gea.models.generator import generator_plan


def small_gen(**kw):
    defaults = dict(
        image_size=32,
        code_size=32,
        r_iterations=2,
        norm="weight",
        num_features=8,
        max_features=64,
        dtype=jnp.float32,
    )
    defaults.update(kw)
    return GeneratorLIS(**defaults)


@pytest.mark.parametrize(
    "size,expected",
    [(64, (4, 4)), (80, (5, 4)), (160, (5, 5)), (32, (4, 3)), (48, (6, 3))],
)
def test_generator_plan(size, expected):
    assert generator_plan(size) == expected


@pytest.mark.parametrize("r_iters,include_init,n_stages", [
    (0, True, 1), (1, True, 2), (3, True, 4), (3, False, 3),
])
def test_generator_stage_shapes(r_iters, include_init, n_stages):
    g = small_gen(r_iterations=r_iters, include_initial_image=include_init)
    z = jnp.ones((4, 32))
    variables = g.init(jax.random.PRNGKey(0), z)
    images, zs = g.apply(variables, z)
    assert images.shape == (n_stages, 4, 32, 32, 3)
    assert zs.shape == (r_iters + 1, 4, 32)
    assert np.all(np.abs(np.asarray(images)) <= 1.0)


def test_generator_render_all_stages():
    g = small_gen(r_iterations=2, include_initial_image=False)
    z = jnp.ones((3, 32))
    variables = g.init(jax.random.PRNGKey(0), z)
    # Training view excludes the initial render...
    images, _ = g.apply(variables, z)
    assert images.shape[0] == 2
    # ...but the sampler's progression view shows all 3 (z0, z1, z2).
    images_all, _ = g.render(variables, z)
    assert images_all.shape[0] == 3


def test_lis_chain_is_residual():
    """With zeroed LIS params the chain must be an exact identity."""
    g = small_gen(r_iterations=2)
    z = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    variables = g.init(jax.random.PRNGKey(0), z)
    params = jax.tree_util.tree_map(jnp.zeros_like, variables["params"])
    # restore core params so rendering still works
    params["core"] = variables["params"]["core"]
    _, zs = g.apply({"params": params}, z)
    np.testing.assert_allclose(np.asarray(zs[0]), np.asarray(zs[2]), atol=1e-6)


def test_spatial_noise_generator():
    g = small_gen(spatial_code=4)
    z = jnp.ones((2, 32))
    sn_shape = g.spatial_noise_shape(2)
    assert sn_shape == (2, 8, 8, 4)
    sn = jnp.zeros(sn_shape)
    variables = g.init(jax.random.PRNGKey(0), z, spatial_noise=sn)
    images, _ = g.apply(variables, z, spatial_noise=sn)
    assert images.shape[-3:] == (32, 32, 3)


@pytest.mark.parametrize("norm", ["weight", "batch", "none"])
def test_discriminator_norm_variants(norm):
    d = Discriminator(
        image_size=32, norm=norm, num_features=8, max_features=64,
        dtype=jnp.float32,
    )
    x = jnp.ones((4, 32, 32, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    if norm == "batch":
        assert "batch_stats" in variables
        logits, _ = d.apply(variables, x, mutable=["batch_stats"])
    else:
        logits = d.apply(variables, x)
    assert logits.shape == (4,)


def test_reverter_shapes():
    r = Reverter(
        image_size=32, code_size=32, norm="weight", num_features=8,
        max_features=64, hidden=32, dtype=jnp.float32,
    )
    x = jnp.ones((4, 32, 32, 3))
    variables = r.init(jax.random.PRNGKey(0), x)
    delta = r.apply(variables, x)
    assert delta.shape == (4, 32)


def test_generator_batch_norm_variant():
    g = small_gen(norm="batch", r_iterations=1)
    z = jnp.ones((4, 32))
    variables = g.init(jax.random.PRNGKey(0), z)
    assert "batch_stats" in variables
    (images, _), new_vars = g.apply(
        variables, z, mutable=["batch_stats"]
    )
    assert images.shape == (2, 4, 32, 32, 3)


@pytest.mark.parametrize("bad_size", [17, 9, 7])
def test_generator_plan_rejects_unsupported(bad_size):
    with pytest.raises(ValueError, match="unsupported image_size"):
        generator_plan(bad_size)


def test_generator_requires_spatial_noise_when_configured():
    g = small_gen(spatial_code=2, r_iterations=0)
    z = jnp.ones((2, 32))
    with pytest.raises(ValueError, match="spatial_noise"):
        g.init(jax.random.PRNGKey(0), z)


def test_subpixel_mode_matches_default_lowering():
    """GeneratorCore(subpixel_mode=...) must be numerically identical to the
    default dilated-conv lowering for the same params (it is a pure
    re-lowering of ConvT(4,2,1) — benchmarks/mfu_probe.py knob)."""
    g0 = small_gen()
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 32)), jnp.float32)
    variables = g0.init(jax.random.PRNGKey(0), z)
    ref, _ = g0.apply(variables, z)
    for mode in ("seed", "all"):
        gm = small_gen(subpixel_mode=mode)
        out, _ = gm.apply(variables, z)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5
        )


def test_rgb_pad_slices_to_three_channels():
    """rgb_pad renders extra to_rgb channels then slices to RGB: output
    shape is unchanged; the param tree widens (perf knob, not a checkpoint-
    compatible option)."""
    g = small_gen(rgb_pad=16)
    z = jnp.ones((2, 32))
    variables = g.init(jax.random.PRNGKey(0), z)
    images, _ = g.apply(variables, z)
    assert images.shape == (3, 2, 32, 32, 3)
    k = variables["params"]["core"]["to_rgb"]["kernel"]
    assert k.shape[-1] == 16
