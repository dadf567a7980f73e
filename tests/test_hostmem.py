"""Host-RSS guard (gea/utils/hostmem.py): budget resolution, and the
trainer's checkpoint-then-exit-19 behavior when the budget is exceeded —
the framework-side defense against the tunneled-TPU client's
per-transfer host staging leak (reproduced by benchmarks/leak_probe.py;
the 256x256 run was kernel-OOM-killed at 130 GB in round 5)."""

import os

import pytest

from gea.utils.hostmem import (
    EXIT_HOST_RSS,
    host_rss_gb,
    resolve_rss_budget_gb,
    total_ram_gb,
)

TINY = [
    "--dataset", "synthetic", "--image_size", "16", "--code_size", "16",
    "--num_features", "4", "--max_features", "16", "--batch_size", "4",
    "--dtype", "float32", "--log_interval", "1", "--vis_rows", "2",
    "--num_devices", "1",
]


def test_budget_resolution():
    assert resolve_rss_budget_gb(-1.0) == float("inf")
    assert resolve_rss_budget_gb(12.5) == 12.5
    auto = resolve_rss_budget_gb(0.0)
    total = total_ram_gb()
    if total:
        assert auto == pytest.approx(0.85 * total)
    else:
        assert auto == float("inf")


def test_host_rss_reads_something():
    rss = host_rss_gb()
    assert 0.01 < rss < total_ram_gb() + 1


def test_trainer_trips_guard_saves_checkpoint_and_exits_19(tmp_path):
    from gea.cli import train_glis

    run = str(tmp_path / "g")
    argv = TINY + [
        "--r_iterations", "1", "--niter", "4", "--vis_interval", "100",
        "--save_interval", "100", "--save_path", run,
        # Any real process is over 1 MB: trips before the first dispatch.
        "--max_host_rss_gb", "0.001",
    ]
    with pytest.raises(SystemExit) as e:
        train_glis.main(argv)
    assert e.value.code == EXIT_HOST_RSS
    # The guard saved a resumable checkpoint before exiting.
    assert os.path.isdir(os.path.join(run, "checkpoints", "0"))

    # And the run resumes cleanly once the budget is lifted.
    train_glis.main(
        TINY
        + ["--r_iterations", "1", "--niter", "4", "--vis_interval", "100",
           "--save_interval", "4", "--save_path", run,
           "--max_host_rss_gb", "-1"]
    )
    assert os.path.isdir(os.path.join(run, "checkpoints", "4"))
