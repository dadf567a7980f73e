"""Deterministic input-pipeline resume (beyond-reference: the reference
restarts its DataLoader from scratch on --load_path resume, silently
revisiting early batches — SURVEY.md §5 'Checkpoint / resume').

Contract under test: every data backend's batch i is a pure function of
(seed, i) so `batches(start_batch=N)` restarts a stream mid-run in O(1),
and a resumed training run is BIT-IDENTICAL to a never-interrupted one
(data fast-forward in runner.input_iterator + per-step rng keyed by the
global step via fold_in)."""

import os

import numpy as np
import pytest
from PIL import Image

TINY = [
    "--dataset", "synthetic", "--image_size", "16", "--code_size", "16",
    "--num_features", "4", "--max_features", "16", "--batch_size", "4",
    "--dtype", "float32", "--log_interval", "1", "--vis_rows", "2",
    "--num_devices", "1", "--r_iterations", "1", "--vis_interval", "100",
]


def _png_dir(tmp_path, n=7, hw=(40, 40)):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(n):
        arr = (np.random.default_rng(i).random((*hw, 3)) * 255).astype(
            np.uint8
        )
        Image.fromarray(arr).save(d / f"img{i}.png")
    return str(d)


def _take(it, n):
    return [next(it) for _ in range(n)]


def _assert_restart_equivalent(make_stream, total=8, start=5):
    """batches(start_batch=N) must reproduce batch N.. of a fresh stream,
    including across epoch boundaries."""
    full = _take(make_stream(0), total)
    tail = _take(make_stream(start), total - start)
    for a, b in zip(full[start:], tail):
        np.testing.assert_array_equal(a, b)


def test_folder_dataset_restart(tmp_path):
    from gea.data.pipeline import FolderDataset

    root = _png_dir(tmp_path)  # 7 images, batch 2 -> 3 batches/epoch
    ds = FolderDataset(root, batch_size=2, crop_size=36, decode_size=32,
                       workers=2, seed=3)
    # start=5 is mid-epoch-1; total=8 reaches epoch 2.
    _assert_restart_equivalent(lambda s: ds.batches(s))


def test_cached_folder_dataset_restart(tmp_path):
    from gea.data.pipeline import CachedFolderDataset

    root = _png_dir(tmp_path)
    ds = CachedFolderDataset(root, batch_size=2, crop_size=36,
                             decode_size=32, workers=2, seed=3)
    _assert_restart_equivalent(lambda s: ds.batches(s))


def test_synthetic_dataset_restart():
    from gea.data.pipeline import SyntheticDataset

    ds = SyntheticDataset(batch_size=3, decode_size=16, seed=7)
    _assert_restart_equivalent(lambda s: ds.batches(s))


def test_cifar_dataset_restart(tmp_path):
    import pickle

    from gea.config import TrainGLISConfig
    from gea.data.pipeline import make_dataset

    data = (np.random.default_rng(0).random((10, 3, 32, 32)) * 255).astype(
        np.uint8
    )
    with open(tmp_path / "data_batch_1", "wb") as f:
        pickle.dump({b"data": data.reshape(10, -1)}, f)
    cfg = TrainGLISConfig(
        dataset="cifar10", dataroot=str(tmp_path), batch_size=3,
        crop_size=32, image_size=32,
    )
    ds = make_dataset(cfg, seed=5)  # 3 batches/epoch
    _assert_restart_equivalent(lambda s: ds.batches(s))


def test_grain_loader_restart(tmp_path):
    pytest.importorskip("grain")
    from gea.data.grain_loader import GrainFolderLoader
    from gea.data.pipeline import list_images

    root = _png_dir(tmp_path)
    paths = list_images(root)

    def make(s):
        return GrainFolderLoader(
            paths, batch_size=2, crop_size=36, decode_size=32, workers=1,
            seed=3,
        ).batches(s)

    _assert_restart_equivalent(make)


def test_input_iterator_fast_forwards(tmp_path):
    """runner.input_iterator(start_step=N) yields the same device batches
    a fresh iterator yields from position N (the data half of
    deterministic resume)."""
    import jax

    from gea.config import TrainGLISConfig
    from gea.train.runner import input_iterator

    cfg = TrainGLISConfig(
        dataset="synthetic", image_size=16, batch_size=4, num_devices=1,
        seed=11,
    )
    full = _take(input_iterator(cfg, mesh=None, seed=cfg.seed), 6)
    tail = _take(
        input_iterator(cfg, mesh=None, seed=cfg.seed, start_step=4), 2
    )
    for a, b in zip(full[4:], tail):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(a)), np.asarray(jax.device_get(b))
        )


@pytest.mark.slow
def test_resume_is_bit_identical(tmp_path):
    """Train 6 steps straight vs 3 steps + resume to 6: identical params
    bit for bit (orbax round-trip is exact; data + rng are step-keyed)."""
    import jax

    from gea.cli import train_glis

    straight_dir = str(tmp_path / "straight")
    state_a, _ = train_glis.main(
        TINY + ["--niter", "6", "--save_interval", "6",
                "--save_path", straight_dir, "--seed", "42"]
    )

    resumed_dir = str(tmp_path / "resumed")
    train_glis.main(
        TINY + ["--niter", "3", "--save_interval", "3",
                "--save_path", resumed_dir, "--seed", "42"]
    )
    state_b, _ = train_glis.main(
        TINY + ["--niter", "6", "--save_interval", "6",
                "--save_path", resumed_dir, "--seed", "42"]
    )

    leaves_a, treedef_a = jax.tree_util.tree_flatten(
        {"g": state_a.params_g, "d": state_a.params_d}
    )
    leaves_b, treedef_b = jax.tree_util.tree_flatten(
        {"g": state_b.params_g, "d": state_b.params_d}
    )
    assert treedef_a == treedef_b
    assert int(np.asarray(state_a.step)) == int(np.asarray(state_b.step)) == 6
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(la)), np.asarray(jax.device_get(lb))
        )
