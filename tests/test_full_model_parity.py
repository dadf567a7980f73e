"""Full-model golden parity: the composed GeneratorLIS / Discriminator
(weight norm + TPReLU + torch conv/conv-transpose semantics + tanh) must
match a hand-built PyTorch mirror with identical weights to float
tolerance — validates the composition, not just the individual layers
(SURVEY.md §4 'golden-value parity tests against torch')."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gea.models import Discriminator, GeneratorLIS

CODE, NF, CAP, SIZE = 16, 4, 16, 16  # plan(16) = (4, 2): 4x4 seed, 2 ups


def norm_w(v, g, dims):
    n = torch.sqrt((v**2).sum(dim=dims, keepdim=True) + 1e-12)
    return v / n * g


def torch_tprelu(x, a, b):
    shape = (1, -1) + (1,) * (x.dim() - 2)
    a = a.view(shape)
    b = b.view(shape)
    s = x - b
    return torch.where(s >= 0, s, a * s) + b


class TorchGeneratorMirror:
    """Replays gea's generator math in torch from a jax param tree."""

    def __init__(self, params):
        def t(x):
            return torch.from_numpy(np.asarray(x, np.float32))

        self.p = jax.tree_util.tree_map(t, params)

    def lis(self, z, lp):
        w1 = norm_w(lp["fc1_kernel"].T, lp["fc1_scale"].view(-1, 1), (1,))
        h = F.linear(z, w1, lp["fc1_bias"])
        h = torch_tprelu(h, lp["slope"], lp["translation"])
        w2 = norm_w(lp["fc2_kernel"].T, lp["fc2_scale"].view(-1, 1), (1,))
        return z + F.linear(h, w2, lp["fc2_bias"])

    def norm_conv_t(self, cp):
        # jax HWIO (kh,kw,in,out), norm over (0,1,2) -> torch (in,out,kh,kw)
        v = cp["kernel"].permute(2, 3, 0, 1)
        g = cp["scale"].view(1, -1, 1, 1)
        n = torch.sqrt((v**2).sum(dim=(0, 2, 3), keepdim=True) + 1e-12)
        return v / n * g

    def forward(self, z_np):
        p = self.p
        z = torch.from_numpy(z_np)
        zs = [z]
        i = 0
        while f"lis{i}" in p:
            zs.append(self.lis(zs[-1], p[f"lis{i}"]))
            i += 1
        core = p["core"]
        render = zs if i > 0 else [zs[0]]
        stacked = torch.cat(render, dim=0)
        w = norm_w(
            core["project"]["kernel"].T,
            core["project"]["scale"].view(-1, 1),
            (1,),
        )
        x = F.linear(stacked, w, core["project"]["bias"])
        c0 = min(NF * 2, CAP)
        # jax reshape (B, s0, s0, C) NHWC -> torch NCHW
        x = x.view(x.shape[0], 4, 4, c0).permute(0, 3, 1, 2)
        act = core["project_act"]["TPReLU_0"]
        x = torch_tprelu(x, act["slope"], act["translation"])
        up = core["up1"]
        x = F.conv_transpose2d(
            x, self.norm_conv_t(up), up["bias"], stride=2, padding=1
        )
        act = core["up1_act"]["TPReLU_0"]
        x = torch_tprelu(x, act["slope"], act["translation"])
        rgb = core["to_rgb"]
        x = F.conv_transpose2d(
            x, self.norm_conv_t(rgb), rgb["bias"], stride=2, padding=1
        )
        x = torch.tanh(x)
        # NCHW -> NHWC, split stages
        x = x.permute(0, 2, 3, 1)
        return x.view(len(render), -1, SIZE, SIZE, 3).numpy()


def test_generator_matches_torch_mirror(rng):
    g = GeneratorLIS(
        image_size=SIZE, code_size=CODE, r_iterations=2, norm="weight",
        num_features=NF, max_features=CAP, dtype=jnp.float32,
    )
    z = rng.standard_normal((3, CODE)).astype(np.float32)
    variables = g.init(jax.random.PRNGKey(0), jnp.asarray(z))
    # randomize scales/biases so the parity is non-trivial
    def jitter(path, x):
        key = jax.random.PRNGKey(hash(str(path)) % (2**31))
        return x + 0.1 * jax.random.normal(key, x.shape, x.dtype)

    params = jax.tree_util.tree_map_with_path(jitter, variables["params"])
    ours, _ = g.apply({"params": params}, jnp.asarray(z))

    mirror = TorchGeneratorMirror(params)
    ref = mirror.forward(z)
    assert ref.shape == tuple(ours.shape)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4, atol=2e-4)
