"""In-process smoke for the evaluation/inspection CLIs (compute_fid,
eval_stages, info) against a tiny trained run + tiny image folder."""

import json
import os

import numpy as np
import pytest
from PIL import Image

TINY = [
    "--dataset", "synthetic", "--image_size", "16", "--code_size", "16",
    "--num_features", "4", "--max_features", "16", "--batch_size", "4",
    "--dtype", "float32", "--log_interval", "1", "--vis_rows", "2",
    "--num_devices", "1",
]


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    from gea.cli import train_glis

    run = str(tmp_path_factory.mktemp("run") / "g")
    train_glis.main(
        TINY
        + ["--r_iterations", "1", "--niter", "2", "--vis_interval", "5",
           "--save_interval", "2", "--save_path", run]
    )
    return run


@pytest.fixture(scope="module")
def tiny_folder(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(12):
        Image.fromarray(
            (rng.random((20, 24, 3)) * 255).astype(np.uint8)
        ).save(d / f"x{i}.png")
    return str(d)


@pytest.mark.slow
def test_compute_fid_cli(tiny_run, tiny_folder):
    from gea.cli import compute_fid

    result = compute_fid.main(
        ["--load_path", tiny_run, "--dataset", "folder", "--dataroot",
         tiny_folder, "--num_samples", "8", "--batch_size", "4",
         "--extractor", "random"]
    )
    assert result["metric"] == "proxy-FID(random-cnn)"
    assert np.isfinite(result["value"])


@pytest.mark.slow
def test_compute_fid_cli_d_filter(tiny_run, tiny_folder):
    """--d_filter scores the D-top-k-filtered distribution (the sampler's
    error-avoidance resampling as a first-class FID ablation)."""
    from gea.cli import compute_fid

    result = compute_fid.main(
        ["--load_path", tiny_run, "--dataset", "folder", "--dataroot",
         tiny_folder, "--num_samples", "8", "--batch_size", "4",
         "--extractor", "random", "--d_filter", "--oversample", "2"]
    )
    assert np.isfinite(result["value"])
    assert result["d_filter"] == "oversample=2 d_step=latest"


@pytest.mark.slow
def test_eval_stages_cli(tiny_run, tiny_folder):
    from gea.cli import eval_stages

    result = eval_stages.main(
        ["--load_path", tiny_run, "--dataset", "folder", "--dataroot",
         tiny_folder, "--num_samples", "8", "--batch_size", "4"]
    )
    assert len(result["stages"]) == 2  # r_iterations=1 -> z0, z1
    for s in result["stages"]:
        assert np.isfinite(s["frechet"])
        assert 0.0 <= s["d_score_mean"] <= 1.0


def test_info_cli(tiny_run):
    from gea.cli import info

    result = info.main(["--load_path", tiny_run])
    assert result["checkpoint_steps"] == [2]
    assert result["step"] == 2
    assert result["params"]["params_g"] > 0
    assert result["config"]["image_size"] == 16


@pytest.mark.slow
def test_compute_fid_cli_second_opinion(tiny_run, tiny_folder):
    from gea.cli import compute_fid

    result = compute_fid.main(
        ["--load_path", tiny_run, "--dataset", "folder", "--dataroot",
         tiny_folder, "--num_samples", "8", "--batch_size", "4",
         "--extractor", "random", "--second_opinion"]
    )
    so = result["second_opinion"]
    assert so["metric_b"] == "proxy-FID(random-cnn-b)"
    assert np.isfinite(so["value_b"])
    assert np.isfinite(so["kid_x1000"])


@pytest.mark.slow
def test_eval_stages_cli_second_opinion(tiny_run, tiny_folder):
    from gea.cli import eval_stages

    result = eval_stages.main(
        ["--load_path", tiny_run, "--dataset", "folder", "--dataroot",
         tiny_folder, "--num_samples", "8", "--batch_size", "4",
         "--second_opinion"]
    )
    assert result["metric_b"] == "proxy-FID(random-cnn-b)"
    for s in result["stages"]:
        assert np.isfinite(s["frechet_b"])
        assert np.isfinite(s["kid_x1000"])


@pytest.fixture(scope="module")
def tiny_riter_run(tmp_path_factory):
    from gea.cli import train_r_iterative

    run = str(tmp_path_factory.mktemp("riter") / "r")
    train_r_iterative.main(
        TINY
        + ["--niter", "2", "--r_chain_length", "2", "--vis_interval", "5",
           "--save_interval", "2", "--save_path", run]
    )
    return run


@pytest.mark.slow
def test_eval_chain_cli(tiny_riter_run, tiny_folder):
    """Per-chain-link metrics for R-iterative runs (VERDICT r2 #3)."""
    from gea.cli import eval_chain

    result = eval_chain.main(
        ["--load_path", tiny_riter_run, "--dataset", "folder", "--dataroot",
         tiny_folder, "--num_samples", "8", "--batch_size", "4",
         "--second_opinion"]
    )
    assert len(result["links"]) == 3  # chain 2 -> links 0..2
    assert result["chain_length_trained"] == 2
    for row in result["links"]:
        assert np.isfinite(row["frechet"])
        assert np.isfinite(row["frechet_b"])
        assert np.isfinite(row["kid_x1000"])
        assert 0.0 <= row["d_score_mean"] <= 1.0
