"""docs/API.md is executable documentation: every ```python block in it
runs verbatim, in order, in ONE shared namespace. The only things the
harness supplies are the free variables the prose explicitly hands to the
reader ("your data", a frozen `art` dir, a z batch) — if a documented
import, signature, or call drifts from the library, this test fails.
(The reference has no library API to document — SURVEY.md §1 L4 — so this
surface is rebuild-new and the doc is its contract.)"""

import os
import re

import numpy as np
import pytest

DOC = os.path.join(os.path.dirname(__file__), os.pardir, "docs", "API.md")

TINY_RUN = [
    "--dataset", "synthetic", "--image_size", "16", "--code_size", "16",
    "--num_features", "4", "--max_features", "16", "--batch_size", "4",
    "--dtype", "float32", "--log_interval", "1", "--vis_rows", "2",
    "--num_devices", "1", "--r_iterations", "1", "--niter", "2",
    "--vis_interval", "2", "--save_interval", "2",
]


def _blocks():
    with open(DOC) as f:
        text = f.read()
    blocks = re.findall(r"```python\n(.*?)```", text, re.S)
    assert len(blocks) >= 6, "API.md lost its code blocks"
    return blocks


@pytest.mark.slow
def test_api_md_blocks_execute(tmp_path, monkeypatch):
    import jax.numpy as jnp

    # The deployment block loads a frozen artifact from ./art exactly as
    # the doc's comment says to create one (export_model on a run dir).
    from gea.cli import export_model, train_glis

    run = str(tmp_path / "run")
    train_glis.main(TINY_RUN + ["--save_path", run])
    export_model.main(
        ["--load_path", run, "--out", str(tmp_path / "art"),
         "--with_scores", "1", "--platforms", "cpu"]
    )
    monkeypatch.chdir(tmp_path)

    ns = {}
    for block in _blocks():
        if "generator.render" in block:
            # "render ... z" / "save_checkpoint(run_dir, ...)": the prose
            # hands the reader their own z batch and run dir.
            ns["z"] = jnp.asarray(
                np.random.default_rng(0)
                .standard_normal((4, ns["cfg"].code_size))
                .astype(np.float32)
            )
            ns["run_dir"] = str(tmp_path / "ckpt")
        if "shard_batch(global_batch" in block:
            ns["global_batch"] = np.zeros(
                (ns["cfg"].batch_size, 64, 64, 3), np.float32
            )
        if 'serve.load("art")' in block:
            code = int(
                __import__("json").load(
                    open(tmp_path / "art" / "manifest.json")
                )["code_size"]
            )
            z = (
                np.random.default_rng(1)
                .standard_normal((4, code))
                .astype(np.float32)
            )
            ns["z"] = z
            ns["z_batches"] = [z, z]
        exec(compile(block, DOC, "exec"), ns)

    # The blocks really exercised the library end to end.
    assert ns["metrics"]["loss_d"].shape == ()
    assert np.asarray(ns["images"]).shape[0] == ns["cfg"].r_iterations + 1
    assert ns["out"]["images"].dtype == np.uint8
