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


@pytest.mark.slow
def test_compute_fid_cli_repeats(tiny_run, tiny_folder):
    """--repeats N (VERDICT r4 order #6): N independent eval draws, mean
    reported as the value, per-draw rows + half-spread recorded so score
    margins can be read against the eval-noise floor."""
    from gea.cli import compute_fid

    result = compute_fid.main(
        ["--load_path", tiny_run, "--dataset", "folder", "--dataroot",
         tiny_folder, "--num_samples", "8", "--batch_size", "4",
         "--extractor", "random", "--repeats", "2"]
    )
    rep = result["repeats"]
    assert rep["n"] == 2 and len(rep["per_draw"]) == 2
    draws = [r["frechet"] for r in rep["per_draw"]]
    # Different seeds -> different draws, and the reported value is
    # their mean with half the spread as the +-.
    assert draws[0] != draws[1]
    np.testing.assert_allclose(
        result["value"], np.mean(draws), atol=1e-3
    )
    np.testing.assert_allclose(
        rep["half_spread"]["frechet"],
        abs(draws[0] - draws[1]) / 2,
        atol=1e-3,
    )


def test_campaign_report_noise_floors(tmp_path, capsys):
    """Margins inside the --noise floor are indecisive: a 4/5 cell whose
    wins are all inside the floor collapses to a tie."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "r4_campaign_report", "benchmarks/r4_campaign_report.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    def so(value, value_b, kid, prec, rec):
        return {
            "value": value,
            "second_opinion": {
                "value_b": value_b, "kid_x1000": kid,
                "precision": prec, "recall": rec,
            },
        }

    data = tmp_path / "data"
    data.mkdir()
    # wgan better on 4 metrics but every margin is tiny.
    cells = {
        ("bce", 1): so(10.0, 5.0, 50.0, 0.70, 0.010),
        ("wgan-gp", 1): so(9.9, 4.95, 49.5, 0.695, 0.012),
    }
    for (obj, seed), payload in cells.items():
        with open(data / f"r4_so_c64_{obj}_s{seed}.json", "w") as f:
            json.dump(payload, f)
    noise = tmp_path / "noise.json"
    with open(noise, "w") as f:
        json.dump(
            {"num_samples": 1024, "floors": {
                "proxy-FID": 0.5, "proxy-FID-b": 0.3, "KIDx1000": 2.0,
                "precision": 0.02, "recall": 0.005,
            }},
            f,
        )

    argv = sys.argv
    try:
        sys.argv = ["x", "--data", str(data), "--runs", str(tmp_path),
                    "--noise", str(noise)]
        mod.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "tie (wgan-gp 0, bce 0, 5 in noise)" in out

    # Without the noise file the same cell is a 4/5 wgan win.
    try:
        sys.argv = ["x", "--data", str(data), "--runs", str(tmp_path)]
        mod.main()
    finally:
        sys.argv = argv
    out = capsys.readouterr().out
    assert "**wgan-gp 4/5**" in out
