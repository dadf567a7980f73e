"""--device_data_cache (gea/data/devicecache.py): the HBM-resident
dataset serves BIT-IDENTICAL batches to the host --data_cache stream
(same epoch_permutation, same decoded bytes, same device preprocess), so
training through it is exactly equivalent; plus restart determinism and
the sharded (2-device DP) path."""

import os

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(24):
        arr = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img{i:03d}.png")
    return str(d)


def _cfg(img_dir, **kw):
    from gea.config import TrainGLISConfig

    base = dict(
        dataset="folder",
        dataroot=img_dir,
        crop_size=32,
        image_size=16,
        code_size=16,
        num_features=4,
        max_features=16,
        batch_size=4,
        dtype="float32",
        r_iterations=1,
        num_devices=1,
        seed=3,
    )
    base.update(kw)
    return TrainGLISConfig(**base)


def test_device_cache_batches_match_host_cache(img_dir):
    """Gathered device batches == the host CachedFolderDataset stream,
    byte for byte, including across an epoch boundary."""
    from gea.data.devicecache import device_cached_iterator
    from gea.data.pipeline import make_dataset

    cfg = _cfg(img_dir)
    host = make_dataset(cfg.replace(data_cache=True), seed=cfg.seed)
    host_it = host.batches(0)
    dev_it = device_cached_iterator(cfg, None, cfg.seed, start_step=0)
    for _ in range(8):  # 24 imgs / batch 4 = 6 bpe -> crosses an epoch
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(next(dev_it))), next(host_it)
        )


def test_device_cache_restart_contract(img_dir):
    """Batch i is a pure function of (seed, i): a stream restarted at
    step 5 replays exactly the batches 5.. of an uninterrupted stream."""
    from gea.data.devicecache import device_cached_iterator

    cfg = _cfg(img_dir)
    full = device_cached_iterator(cfg, None, cfg.seed, start_step=0)
    skipped = [np.asarray(jax.device_get(next(full))) for _ in range(7)]
    resumed = device_cached_iterator(cfg, None, cfg.seed, start_step=5)
    for want in skipped[5:]:
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(next(resumed))), want
        )


def test_device_cache_chunked_stack(img_dir):
    """chunk=K stacks K consecutive batches — same content as K single
    pulls (the steps_per_dispatch contract)."""
    from gea.data.devicecache import device_cached_iterator

    cfg = _cfg(img_dir)
    singles = device_cached_iterator(cfg, None, cfg.seed, start_step=0)
    chunked = device_cached_iterator(
        cfg, None, cfg.seed, start_step=0, chunk=3
    )
    stack = np.asarray(jax.device_get(next(chunked)))
    assert stack.shape[0] == 3
    for j in range(3):
        np.testing.assert_array_equal(
            stack[j], np.asarray(jax.device_get(next(singles)))
        )


@pytest.mark.slow
def test_train_equivalence_and_dp(img_dir, tmp_path):
    """A short train run through --device_data_cache reproduces the
    --data_cache run's final params bit-for-bit (same bytes -> same
    math), and the 2-device DP path runs."""
    from gea.cli import train_glis

    common = [
        "--dataset", "folder", "--dataroot", img_dir, "--crop_size", "32",
        "--image_size", "16", "--code_size", "16", "--num_features", "4",
        "--max_features", "16", "--batch_size", "4", "--dtype", "float32",
        "--r_iterations", "1", "--niter", "3", "--seed", "3",
        "--vis_interval", "100", "--save_interval", "3",
        "--log_interval", "1",
    ]
    a = str(tmp_path / "host")
    b = str(tmp_path / "dev")
    state_a, _ = train_glis.main(
        common + ["--num_devices", "1", "--data_cache", "true",
                  "--save_path", a]
    )
    state_b, _ = train_glis.main(
        common + ["--num_devices", "1", "--device_data_cache", "true",
                  "--save_path", b]
    )
    la, ta = jax.tree_util.tree_flatten(
        {"g": state_a.params_g, "d": state_a.params_d}
    )
    lb, tb = jax.tree_util.tree_flatten(
        {"g": state_b.params_g, "d": state_b.params_d}
    )
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(x)), np.asarray(jax.device_get(y))
        )

    # DP over 2 of the 8 virtual CPU devices, chunked dispatch.
    c = str(tmp_path / "dp")
    train_glis.main(
        common + ["--num_devices", "2", "--device_data_cache", "true",
                  "--steps_per_dispatch", "2", "--save_path", c]
    )
    assert os.path.isdir(os.path.join(c, "checkpoints", "3"))
