"""In-process CLI smoke tests (SURVEY.md §4 'Integration'): every tool's
main() runs a tiny end-to-end flow on CPU — argparse wiring, run-dir
artifacts, cross-tool checkpoint handoff, and the compat shims."""

import os
import sys

import numpy as np
import pytest

# --num_devices 1: the test env exposes 8 virtual CPU devices and the
# trainers default to data-parallel over all of them.
TINY = [
    "--dataset", "synthetic", "--image_size", "16", "--code_size", "16",
    "--num_features", "4", "--max_features", "16", "--batch_size", "4",
    "--dtype", "float32", "--log_interval", "1", "--vis_rows", "2",
    "--num_devices", "1",
]


@pytest.mark.slow
def test_full_cli_flow(tmp_path):
    from gea.cli import (
        sample,
        sample_interpolations,
        sample_r_iterative,
        sample_r_separate,
        train_glis,
        train_r_iterative,
        train_r_separate,
    )

    g_dir = str(tmp_path / "g")
    train_glis.main(
        TINY
        + ["--r_iterations", "1", "--niter", "2", "--vis_interval", "2",
           "--save_interval", "2", "--save_path", g_dir]
    )
    assert os.path.exists(os.path.join(g_dir, "config.json"))
    assert os.path.isdir(os.path.join(g_dir, "checkpoints", "2"))
    assert any(
        f.endswith(".png") for f in os.listdir(os.path.join(g_dir, "samples"))
    )

    # resume contract: running again with higher niter continues
    train_glis.main(
        TINY
        + ["--r_iterations", "1", "--niter", "3", "--vis_interval", "10",
           "--save_interval", "3", "--save_path", g_dir]
    )
    assert os.path.isdir(os.path.join(g_dir, "checkpoints", "3"))

    out = str(tmp_path / "samples")
    sample.main(
        ["--load_path", g_dir, "--save_path_samples", out, "--count", "4",
         "--batch_size", "4", "--grid_rows", "2"]
    )
    assert any(f.endswith(".png") for f in os.listdir(out))

    interp = str(tmp_path / "interp")
    sample_interpolations.main(
        ["--load_path", g_dir, "--save_path_samples", interp,
         "--interp_pairs", "2", "--interp_points", "3"]
    )
    assert any(f.endswith(".png") for f in os.listdir(interp))

    # R-separate consumes the frozen G run dir
    r_dir = str(tmp_path / "r")
    train_r_separate.main(
        TINY
        + ["--g_path", g_dir, "--r_hidden", "8", "--niter", "2",
           "--vis_interval", "2", "--save_interval", "2",
           "--save_path", r_dir]
    )
    assert os.path.isdir(os.path.join(r_dir, "checkpoints", "2"))

    rs_out = str(tmp_path / "rs_samples")
    sample_r_separate.main(
        ["--load_path", r_dir, "--save_path_samples", rs_out, "--count", "4",
         "--batch_size", "4", "--grid_rows", "2", "--correction_steps", "1"]
    )
    assert any(f.endswith(".png") for f in os.listdir(rs_out))

    # R-iterative (joint) + its sampler
    ri_dir = str(tmp_path / "ri")
    train_r_iterative.main(
        TINY
        + ["--r_chain_length", "1", "--r_hidden", "8", "--niter", "2",
           "--vis_interval", "2", "--save_interval", "2",
           "--save_path", ri_dir]
    )
    ri_out = str(tmp_path / "ri_samples")
    sample_r_iterative.main(
        ["--load_path", ri_dir, "--save_path_samples", ri_out, "--count", "4",
         "--batch_size", "4", "--grid_rows", "2", "--chain_length", "1"]
    )
    assert any(f.endswith(".png") for f in os.listdir(ri_out))


@pytest.mark.slow
def test_r_trainers_honor_debug_checks(tmp_path):
    """--debug_checks must instrument the R trainers too (build_step_fn is
    shared): a clean tiny run completes under checkify, and ragged-count
    R sampling pads to the compiled batch instead of recompiling."""
    from gea.cli import sample_r_iterative, train_glis, train_r_iterative, train_r_separate

    g_dir = str(tmp_path / "g")
    train_glis.main(
        TINY + ["--r_iterations", "1", "--niter", "2", "--vis_interval", "2",
                "--save_interval", "2", "--save_path", g_dir]
    )
    train_r_separate.main(
        ["--g_path", g_dir, "--save_path", str(tmp_path / "r"),
         "--niter", "2", "--batch_size", "4", "--vis_interval", "2",
         "--save_interval", "2", "--log_interval", "1", "--vis_rows", "2",
         "--num_devices", "1", "--debug_checks"]
    )
    # R-iterative routes through the same shared build_step_fn (checkify
    # compile of the joint unrolled chain is minutes on CPU, so the
    # sanitizer e2e above stands in for it); run it plain here to feed
    # the ragged-sampler check.
    ri_dir = str(tmp_path / "ri")
    train_r_iterative.main(
        TINY + ["--niter", "2", "--r_chain_length", "1", "--vis_interval",
                "2", "--save_interval", "2", "--save_path", ri_dir]
    )
    # ragged count (5 over batch 4): one full + one padded batch
    sample_r_iterative.main(
        ["--load_path", ri_dir, "--save_path_samples", str(tmp_path / "s"),
         "--count", "5", "--batch_size", "4"]
    )
    assert os.listdir(str(tmp_path / "s"))


def test_compat_shims_exist_and_point_at_cli():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    expected = {
        "compat/g_lis/train.py": "gea.cli.train_glis",
        "compat/g_lis/sample.py": "gea.cli.sample",
        "compat/g_lis/sample_interpolations.py": "gea.cli.sample_interpolations",
        "compat/r_separate/train_r.py": "gea.cli.train_r_separate",
        "compat/r_separate/sample.py": "gea.cli.sample_r_separate",
        "compat/r_iterative/train.py": "gea.cli.train_r_iterative",
        "compat/r_iterative/sample.py": "gea.cli.sample_r_iterative",
    }
    for rel, module in expected.items():
        path = os.path.join(root, rel)
        assert os.path.exists(path), rel
        src = open(path).read()
        assert f"from {module} import main" in src, rel


@pytest.mark.slow
def test_fid_tracking_cli_flow(tmp_path):
    """--fid_interval: fid.jsonl + best.json land in the run dir, the best
    snapshot survives retention, and --step -1 loads it everywhere."""
    import json

    from gea.cli import info, sample, train_glis

    g_dir = str(tmp_path / "g_fid")
    train_glis.main(
        TINY
        + ["--r_iterations", "1", "--niter", "6", "--vis_interval", "10",
           "--save_interval", "2", "--keep_checkpoints", "1",
           "--fid_interval", "2", "--fid_samples", "8",
           "--save_path", g_dir]
    )
    log = [
        json.loads(line)
        for line in open(os.path.join(g_dir, "fid.jsonl"))
    ]
    assert [e["step"] for e in log] == [2, 4, 6]
    best = json.load(open(os.path.join(g_dir, "best.json")))
    assert best["step"] == min(log, key=lambda e: e["fid"])["step"]
    # The best snapshot survives keep=1 retention pruning.
    assert os.path.isdir(
        os.path.join(g_dir, "checkpoints", str(best["step"]))
    )
    assert os.path.exists(os.path.join(g_dir, "plots", "fid.png"))
    out = str(tmp_path / "best_samples")
    sample.main(
        ["--load_path", g_dir, "--save_path_samples", out, "--count", "4",
         "--batch_size", "4", "--grid_rows", "2", "--step", "-1"]
    )
    assert any(f.endswith(".png") for f in os.listdir(out))
    summary = info.main(["--load_path", g_dir])
    assert summary["best"]["step"] == best["step"]

    # Chunked dispatch: fid boundaries fire at chunk end (crossed()),
    # so K=2 with interval 2 still logs every crossing.
    g_dir2 = str(tmp_path / "g_fid_chunked")
    train_glis.main(
        TINY
        + ["--r_iterations", "1", "--niter", "4", "--vis_interval", "10",
           "--save_interval", "4", "--steps_per_dispatch", "2",
           "--fid_interval", "2", "--fid_samples", "8",
           "--save_path", g_dir2]
    )
    chunked_log = [
        json.loads(line)
        for line in open(os.path.join(g_dir2, "fid.jsonl"))
    ]
    assert [e["step"] for e in chunked_log] == [2, 4]

    # R-separate tracks CORRECTED-sample FID against the frozen G's
    # dataset and pins its own best R snapshot.
    from gea.cli import train_r_separate

    r_dir = str(tmp_path / "r_fid")
    train_r_separate.main(
        ["--g_path", g_dir, "--save_path", r_dir, "--niter", "4",
         "--batch_size", "4", "--vis_interval", "10", "--save_interval", "4",
         "--log_interval", "2", "--vis_rows", "2", "--num_devices", "1",
         "--fid_interval", "2", "--fid_samples", "8"]
    )
    r_best = json.load(open(os.path.join(r_dir, "best.json")))
    assert os.path.isdir(
        os.path.join(r_dir, "checkpoints", str(r_best["step"]))
    )


@pytest.mark.slow
def test_ema_and_hinge_cli_flow(tmp_path):
    """--g_ema + --gan_loss hinge train end-to-end; --use_ema samples from
    the EMA shadow and fails loudly on runs without one."""
    from gea.cli import sample, train_glis

    g_dir = str(tmp_path / "g_ema")
    train_glis.main(
        TINY
        + ["--r_iterations", "1", "--niter", "2", "--vis_interval", "2",
           "--save_interval", "2", "--save_path", g_dir,
           "--g_ema", "0.99", "--gan_loss", "hinge"]
    )
    out = str(tmp_path / "ema_samples")
    sample.main(
        ["--load_path", g_dir, "--save_path_samples", out, "--count", "4",
         "--batch_size", "4", "--grid_rows", "2", "--use_ema", "true"]
    )
    assert any(f.endswith(".png") for f in os.listdir(out))

    # d_filter variants on the same run: threshold rejection sampling and
    # an earlier-step D snapshot (reference C13 experiment knobs).
    df_out = str(tmp_path / "df_samples")
    sample.main(
        ["--load_path", g_dir, "--save_path_samples", df_out, "--count", "4",
         "--batch_size", "4", "--grid_rows", "2", "--d_filter", "true",
         "--oversample", "2", "--d_threshold", "0.5",
         "--d_filter_step", "2"]
    )
    assert any(f.endswith(".png") for f in os.listdir(df_out))

    # A run without --g_ema has no EMA params: --use_ema must fail loudly.
    g_plain = str(tmp_path / "g_plain")
    train_glis.main(
        TINY
        + ["--r_iterations", "1", "--niter", "1", "--vis_interval", "5",
           "--save_interval", "1", "--save_path", g_plain]
    )
    with pytest.raises(SystemExit, match="no EMA"):
        sample.main(
            ["--load_path", g_plain, "--save_path_samples", out,
             "--count", "4", "--batch_size", "4", "--use_ema", "true"]
        )


@pytest.mark.slow
def test_host_resize_train_flow(tmp_path):
    """--host_resize streams uint8 at final resolution; the fused step's
    crop/resize become no-ops and training must proceed identically in
    shape/artifact terms (slow-link transport mode, DataConfig.host_resize)."""
    from gea.cli import train_glis

    g_dir = str(tmp_path / "g_hr")
    train_glis.main(
        TINY
        + ["--crop_size", "32", "--host_resize", "true",
           "--r_iterations", "1", "--niter", "2", "--vis_interval", "2",
           "--save_interval", "2", "--save_path", g_dir]
    )
    assert os.path.isdir(os.path.join(g_dir, "checkpoints", "2"))
    assert any(
        f.endswith(".png") for f in os.listdir(os.path.join(g_dir, "samples"))
    )


@pytest.mark.slow
def test_debug_checks_composes_with_chunked_dispatch(tmp_path):
    """--debug_checks + --steps_per_dispatch > 1 through the real trainer
    CLI: the sanitizer accepts chunked dispatch by looping the checked
    single-step program over the chunk on the host (round 4 — checkify
    THROUGH the lax.scan chunk compiled for 10+ minutes on CPU, so the
    dispatcher bounds the compile to the single-step program). A clean
    tiny run completes and writes its periodic artifacts.

    --r_iterations 1 keeps the checkified graph small: checkify compile
    time on XLA-CPU scales steeply with LIS chain depth (~1 min at 1
    module vs ~10+ min at the default 3 for the same 16x16 toy model —
    measured round 4), and this test pins flag COMPOSITION, not depth."""
    from gea.cli import train_glis

    train_glis.main(
        TINY + ["--r_iterations", "1", "--niter", "2",
                "--steps_per_dispatch", "2",
                "--vis_interval", "2", "--save_interval", "2",
                "--save_path", str(tmp_path / "g"), "--debug_checks"]
    )
    assert os.path.isdir(
        os.path.join(str(tmp_path / "g"), "checkpoints", "2")
    )
