"""Torch-checkpoint interop golden tests (VERDICT r2 #6): converting a gea
checkpoint to a torch state_dict and loading it into the torch mirrors must
render the SAME images — and the conversion must round-trip exactly.
Makes BASELINE.json's "checkpoints bit-for-intent" a tested property
(upstream C10: `torch.save(state_dict)` in `*/train*.py`)."""

import json
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from gea.config import TrainGLISConfig
from gea.interop import (
    TorchDiscriminator,
    TorchGeneratorLIS,
    TorchReverter,
    discriminator_params_from_torch,
    discriminator_to_torch_state,
    generator_params_from_torch,
    generator_to_torch_state,
    reverter_params_from_torch,
    reverter_to_torch_state,
)
from gea.models import Discriminator, GeneratorLIS, Reverter

SIZE, CODE, NF, CAP = 16, 16, 4, 16


def tiny_cfg(**kw):
    base = dict(
        image_size=SIZE,
        code_size=CODE,
        r_iterations=2,
        norm="weight",
        num_features=NF,
        max_features=CAP,
        dtype="float32",
        dataset="synthetic",
    )
    base.update(kw)
    return TrainGLISConfig(**base)


def jitter(params):
    def f(path, x):
        key = jax.random.PRNGKey(hash(str(path)) % (2**31))
        return x + 0.1 * jax.random.normal(key, x.shape, x.dtype)

    return jax.tree_util.tree_map_with_path(f, params)


def tree_allclose(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7
        ),
        a,
        b,
    )


@pytest.mark.parametrize("norm", ["weight", "none"])
def test_generator_golden_and_roundtrip(rng, norm):
    cfg = tiny_cfg(norm=norm)
    g = GeneratorLIS.from_config(cfg)
    z = rng.standard_normal((3, CODE)).astype(np.float32)
    params = jitter(g.init(jax.random.PRNGKey(0), jnp.asarray(z))["params"])
    ours, _ = g.apply({"params": params}, jnp.asarray(z))

    sd = generator_to_torch_state(params, cfg)
    tg = TorchGeneratorLIS(cfg)
    tg.load_state_dict(sd)
    with torch.no_grad():
        imgs, _ = tg(torch.from_numpy(z))
    theirs = imgs.permute(0, 1, 3, 4, 2).numpy()  # NCHW -> NHWC per stage
    np.testing.assert_allclose(
        np.asarray(ours), theirs, rtol=2e-4, atol=2e-4
    )

    back = generator_params_from_torch(
        {k: v for k, v in tg.state_dict().items()}, cfg
    )
    tree_allclose(params, back)


def test_discriminator_golden_and_roundtrip(rng):
    cfg = tiny_cfg()
    d = Discriminator.from_config(cfg)
    x = rng.uniform(-1, 1, (4, SIZE, SIZE, 3)).astype(np.float32)
    params = jitter(d.init(jax.random.PRNGKey(1), jnp.asarray(x))["params"])
    ours = d.apply({"params": params}, jnp.asarray(x), train=False)

    sd = discriminator_to_torch_state(params, cfg)
    td = TorchDiscriminator(cfg)
    td.load_state_dict(sd)
    with torch.no_grad():
        theirs = td(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)

    back = discriminator_params_from_torch(dict(td.state_dict()), cfg)
    tree_allclose(params, back)


def test_reverter_golden_and_roundtrip(rng):
    cfg = tiny_cfg()
    r = Reverter.from_config(cfg)
    x = rng.uniform(-1, 1, (4, SIZE, SIZE, 3)).astype(np.float32)
    params = jitter(r.init(jax.random.PRNGKey(2), jnp.asarray(x))["params"])
    ours = r.apply({"params": params}, jnp.asarray(x), train=False)

    sd = reverter_to_torch_state(params, cfg)
    tr = TorchReverter(cfg)
    tr.load_state_dict(sd)
    with torch.no_grad():
        theirs = tr(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)

    back = reverter_params_from_torch(dict(tr.state_dict()), cfg)
    tree_allclose(params, back)


def test_batch_norm_conversion_rejected():
    cfg = tiny_cfg(norm="batch")
    with pytest.raises(ValueError, match="batch"):
        generator_to_torch_state({}, cfg)


def test_cli_export_import_same_images(rng, tmp_path):
    """Full cross-tool contract: run dir -> .pt -> new run dir; the sampler
    contract (load_generator) on the imported dir renders identical images."""
    from gea.cli.convert_checkpoint import main as convert
    from gea.cli.sample import load_generator
    from gea.train.state import create_glis_state, make_optimizer
    from gea.utils.checkpoint import save_checkpoint

    cfg = tiny_cfg(save_path=str(tmp_path / "run"))
    g = GeneratorLIS.from_config(cfg)
    d = Discriminator.from_config(cfg)
    tx = make_optimizer(cfg.lr, cfg.beta1, cfg.beta2)
    state = create_glis_state(cfg, g, d, tx, tx, seed=3)
    state = state.replace(
        params_g=jitter(state.params_g), step=jnp.asarray(7, jnp.int32)
    )
    run = str(tmp_path / "run")
    os.makedirs(run, exist_ok=True)
    cfg.save(os.path.join(run, "config.json"))
    save_checkpoint(run, 7, state)

    pt = str(tmp_path / "export.pt")
    convert(["--load_path", run, "--out", pt])
    payload = torch.load(pt, weights_only=False)
    assert payload["format"] == "gea-torch-v1"
    assert payload["step"] == 7
    assert "generator" in payload and "discriminator" in payload

    imported = str(tmp_path / "imported")
    convert(["--from_torch", pt, "--out_run", imported])

    z = jnp.asarray(rng.standard_normal((2, CODE)).astype(np.float32))
    gen_a, vars_a, _ = load_generator(run)
    gen_b, vars_b, _ = load_generator(imported)
    img_a, _ = gen_a.render(vars_a, z)
    img_b, _ = gen_b.render(vars_b, z)
    np.testing.assert_allclose(
        np.asarray(img_a), np.asarray(img_b), rtol=1e-5, atol=1e-6
    )
