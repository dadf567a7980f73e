"""Golden parity vs torch-CPU for the layer semantics the reference pins
(SURVEY.md §4 'Unit' + §7 hard part #1: PyTorch conv-transpose padding /
output-size rules, weight-norm parametrization, BCE-with-sigmoid numerics).

Weights are generated in torch, copied into our NHWC/HWIO layouts, and
outputs compared elementwise."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gea.ops.layers import conv2d_torch, conv_transpose2d_torch, normalize_weight
from gea.train.losses import bce_with_logits


def _np(x):
    return np.asarray(x)


@pytest.mark.parametrize(
    "cin,cout,k,s,p,size",
    [
        (3, 8, 4, 2, 1, 16),   # DCGAN downsample block
        (8, 4, 3, 1, 1, 10),   # same-size conv
        (5, 7, 4, 2, 1, 10),   # odd channels
        (4, 6, 5, 3, 2, 17),   # non-square-friendly stride
    ],
)
def test_conv2d_matches_torch(rng, cin, cout, k, s, p, size):
    x = rng.standard_normal((2, cin, size, size), dtype=np.float32)
    w = rng.standard_normal((cout, cin, k, k), dtype=np.float32)
    ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=s, padding=p)
    # NCHW -> NHWC, OIHW -> HWIO
    got = conv2d_torch(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 1, 0)),
        stride=s,
        padding=p,
    )
    got_nchw = _np(got).transpose(0, 3, 1, 2)
    assert got_nchw.shape == tuple(ref.shape)
    np.testing.assert_allclose(got_nchw, ref.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize(
    "cin,cout,k,s,p,op,size",
    [
        (8, 4, 4, 2, 1, 0, 5),    # DCGAN upsample: 5 -> 10
        (8, 4, 4, 2, 1, 0, 4),    # 4 -> 8
        (6, 3, 3, 1, 1, 0, 9),    # same-size
        (5, 7, 4, 2, 1, 1, 7),    # output_padding
        (4, 4, 5, 3, 2, 0, 6),    # odd kernel/stride mix
    ],
)
def test_conv_transpose2d_matches_torch(rng, cin, cout, k, s, p, op, size):
    x = rng.standard_normal((2, cin, size, size), dtype=np.float32)
    w = rng.standard_normal((cin, cout, k, k), dtype=np.float32)
    ref = F.conv_transpose2d(
        torch.from_numpy(x),
        torch.from_numpy(w),
        stride=s,
        padding=p,
        output_padding=op,
    )
    got = conv_transpose2d_torch(
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(w.transpose(2, 3, 0, 1)),  # (in,out,kh,kw) -> (kh,kw,in,out)
        stride=s,
        padding=p,
        output_padding=op,
    )
    got_nchw = _np(got).transpose(0, 3, 1, 2)
    assert got_nchw.shape == tuple(ref.shape)
    np.testing.assert_allclose(got_nchw, ref.numpy(), rtol=1e-4, atol=1e-4)


def test_weight_norm_matches_torch_dense(rng):
    """torch weight_norm(dim=0) on Linear == per-output-column norm on our
    (in, out) kernels."""
    lin = torch.nn.Linear(12, 7, bias=False)
    lin = torch.nn.utils.weight_norm(lin, dim=0)
    with torch.no_grad():
        lin.weight_g.copy_(torch.rand(7, 1) + 0.5)
    x = rng.standard_normal((3, 12), dtype=np.float32)
    ref = lin(torch.from_numpy(x)).detach().numpy()

    v = lin.weight_v.detach().numpy().T  # (in, out)
    g = lin.weight_g.detach().numpy().squeeze(-1)  # (out,)
    w = normalize_weight(jnp.asarray(v), jnp.asarray(g), reduce_axes=(0,))
    got = _np(jnp.dot(jnp.asarray(x), w))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_weight_norm_matches_torch_conv(rng):
    conv = torch.nn.Conv2d(5, 9, 4, stride=2, padding=1, bias=False)
    conv = torch.nn.utils.weight_norm(conv, dim=0)
    with torch.no_grad():
        conv.weight_g.copy_(torch.rand(9, 1, 1, 1) + 0.5)
    x = rng.standard_normal((2, 5, 12, 12), dtype=np.float32)
    ref = conv(torch.from_numpy(x)).detach().numpy()

    v = conv.weight_v.detach().numpy().transpose(2, 3, 1, 0)  # HWIO
    g = conv.weight_g.detach().numpy().reshape(-1)
    w = normalize_weight(jnp.asarray(v), jnp.asarray(g), reduce_axes=(0, 1, 2))
    got = conv2d_torch(
        jnp.asarray(x.transpose(0, 2, 3, 1)), w, stride=2, padding=1
    )
    np.testing.assert_allclose(
        _np(got).transpose(0, 3, 1, 2), ref, rtol=1e-4, atol=1e-4
    )


def test_bce_with_logits_matches_torch(rng):
    logits = rng.standard_normal(64, dtype=np.float32) * 4
    targets = (rng.random(64) > 0.5).astype(np.float32)
    ref = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).item()
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_tprelu_semantics(rng):
    """TPReLU: y = PReLU_a(x - b) + b — check against a direct torch
    composition of the same definition."""
    from flax import linen as nn_flax
    from gea.ops.layers import TPReLU

    x = rng.standard_normal((4, 6), dtype=np.float32)
    mod = TPReLU()
    variables = mod.init(__import__("jax").random.PRNGKey(0), jnp.asarray(x))
    a = rng.random(6, dtype=np.float32) * 0.5
    b = rng.standard_normal(6, dtype=np.float32)
    variables = {
        "params": {"slope": jnp.asarray(a), "translation": jnp.asarray(b)}
    }
    got = _np(mod.apply(variables, jnp.asarray(x)))

    xt = torch.from_numpy(x)
    at = torch.from_numpy(a)
    bt = torch.from_numpy(b)
    shifted = xt - bt
    ref = (torch.where(shifted >= 0, shifted, at * shifted) + bt).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
