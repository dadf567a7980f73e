"""Config round-trips, data pipeline, grids/plotting/meters
(SURVEY.md §4 'Unit'/'Integration')."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gea.config import (
    SampleConfig,
    TrainGLISConfig,
    TrainRIterativeConfig,
    TrainRSeparateConfig,
    stage_weights,
)


def test_config_argparse_roundtrip():
    cfg = TrainGLISConfig.from_args(
        [
            "--dataset", "synthetic", "--image_size", "64", "--code_size", "128",
            "--norm", "batch", "--r_iterations", "2", "--lr", "3e-4",
            "--batch_size", "32", "--save_path", "/tmp/x",
            "--include_initial_image", "false",
        ]
    )
    assert cfg.image_size == 64
    assert cfg.code_size == 128
    assert cfg.norm == "batch"
    assert cfg.r_iterations == 2
    assert cfg.lr == 3e-4
    assert cfg.include_initial_image is False
    assert cfg.n_stages == 2


def test_config_help_renders_for_every_cli_config():
    """argparse --help must not crash on any config class.

    Regression: a bare '%' in a help string ("~5% faster") was parsed by
    argparse's help interpolation as a '% f' format spec and raised
    TypeError, so `train_glis --help` crashed (fixed round 3: '%%').
    """
    import gea.config as config_mod

    classes = [
        obj
        for obj in vars(config_mod).values()
        if isinstance(obj, type)
        and issubclass(obj, config_mod.BaseConfig)
        and obj is not config_mod.BaseConfig
    ]
    assert len(classes) >= 6
    import argparse

    for cls in classes:
        parser = argparse.ArgumentParser(description=cls.__doc__)
        cls.add_args(parser)
        text = parser.format_help()  # raises on bad interpolation
        assert "--" in text


def test_config_json_roundtrip(tmp_path):
    cfg = TrainGLISConfig(image_size=64, r_iterations=1, dataset="synthetic")
    p = str(tmp_path / "config.json")
    cfg.save(p)
    cfg2 = TrainGLISConfig.load(p)
    assert cfg2 == cfg


def test_stage_weights_final_highest():
    cfg = TrainGLISConfig(r_iterations=3)
    w = stage_weights(cfg)
    assert len(w) == cfg.n_stages == 4
    assert abs(sum(w) - 1.0) < 1e-9
    assert w[-1] == max(w)
    assert all(w[i] <= w[i + 1] for i in range(len(w) - 1))
    assert stage_weights(TrainGLISConfig(r_iterations=0)) == (1.0,)


def test_r_configs_have_reference_flags():
    cfg = TrainRSeparateConfig.from_args(["--lambda_r", "0.5", "--g_path", "/x"])
    assert cfg.lambda_r == 0.5 and cfg.g_path == "/x"
    cfg2 = TrainRIterativeConfig.from_args(["--r_chain_length", "3"])
    assert cfg2.r_chain_length == 3


def test_synthetic_dataset_batches():
    from gea.data.pipeline import SyntheticDataset

    ds = SyntheticDataset(batch_size=4, decode_size=32, seed=1)
    it = ds.batches()
    b = next(it)
    assert b.shape == (4, 32, 32, 3) and b.dtype == np.uint8
    b2 = next(it)
    assert not np.array_equal(b, b2)


def test_folder_dataset(tmp_path):
    from PIL import Image

    from gea.data.pipeline import FolderDataset

    for i in range(6):
        arr = (np.random.default_rng(i).random((48, 40, 3)) * 255).astype(
            np.uint8
        )
        Image.fromarray(arr).save(tmp_path / f"img{i}.png")
    ds = FolderDataset(
        str(tmp_path), batch_size=3, crop_size=36, decode_size=32, workers=2
    )
    b = next(ds.batches())
    assert b.shape == (3, 32, 32, 3) and b.dtype == np.uint8

    # fewer images than batch_size must fail fast, not spin an empty
    # shuffle-epoch loop forever while the prefetch consumer blocks
    import pytest

    with pytest.raises(ValueError, match="batch_size"):
        FolderDataset(
            str(tmp_path), batch_size=7, crop_size=36, decode_size=32
        )


def test_preprocess_batch():
    from gea.data.ondevice import preprocess_batch

    raw = jnp.asarray(
        (np.random.default_rng(0).random((4, 48, 48, 3)) * 255).astype(np.uint8)
    )
    out = preprocess_batch(
        raw, jax.random.PRNGKey(0), crop_size=40, image_size=32
    )
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == jnp.float32
    o = np.asarray(out)
    assert o.min() >= -1.0 - 1e-5 and o.max() <= 1.0 + 1e-5


def test_preprocess_no_flip_deterministic():
    from gea.data.ondevice import preprocess_batch

    raw = jnp.asarray(
        (np.random.default_rng(0).random((2, 40, 40, 3)) * 255).astype(np.uint8)
    )
    a = preprocess_batch(
        raw, jax.random.PRNGKey(0), crop_size=40, image_size=40,
        augment_flip=False,
    )
    # identity path: crop==decode size, no resize, no flip
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(raw, np.float32) / 127.5 - 1.0, atol=1e-6
    )


def test_grids_tile_and_save(tmp_path):
    from gea.utils.grids import save_image_grid, tile_grid, to_uint8

    imgs = np.random.default_rng(0).uniform(-1, 1, (9, 8, 8, 3)).astype(
        np.float32
    )
    grid = tile_grid(to_uint8(imgs), rows=3)
    assert grid.shape == (3 * 10 - 2, 3 * 10 - 2, 3)
    p = str(tmp_path / "g.png")
    save_image_grid(imgs, p, rows=3)
    assert os.path.exists(p)


def test_loss_plotter(tmp_path):
    from gea.utils.plotting import LossPlotter

    lp = LossPlotter()
    for i in range(10):
        lp.add(i, loss_d=1.0 / (i + 1), loss_g=0.5)
    p = str(tmp_path / "loss.png")
    lp.plot(p)
    assert os.path.exists(p)


def test_throughput_meter():
    from gea.utils.meters import ThroughputMeter

    m = ThroughputMeter(batch_size=16, warmup_steps=1)
    for _ in range(5):
        m.tick()
    s = m.stats(num_chips=2)
    assert s["images_per_sec"] > 0
    assert s["images_per_sec_per_chip"] == pytest.approx(
        s["images_per_sec"] / 2
    )


def test_device_prefetch_abandoned_iterator_thread_exits():
    """Abandoning the prefetch iterator must release its worker thread."""
    import threading
    import time

    from gea.data.prefetch import device_prefetch

    def slow_batches():
        while True:
            yield np.zeros((2, 4, 4, 3), np.float32)

    before = threading.active_count()
    it = device_prefetch(slow_batches(), depth=1)
    next(it)
    it.close()  # triggers the generator's finally -> stop event
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.1)
    assert threading.active_count() <= before


def test_device_prefetch_finite_stream():
    from gea.data.prefetch import device_prefetch

    def three():
        for _ in range(3):
            yield np.ones((2, 4, 4, 3), np.float32)

    out = list(device_prefetch(three(), depth=2))
    assert len(out) == 3


def test_save_stage_gif(tmp_path):
    from gea.utils.grids import save_stage_gif

    imgs = np.random.default_rng(0).uniform(-1, 1, (3, 4, 8, 8, 3)).astype(
        np.float32
    )
    p = str(tmp_path / "prog.gif")
    save_stage_gif(imgs, p, rows=2)
    from PIL import Image

    with Image.open(p) as im:
        assert im.is_animated and im.n_frames == 3


def test_lsun_dataset_folder_backed(tmp_path):
    """--dataset lsun (SURVEY.md C9 [M]): plain <class>/ image subfolders
    resolve without lmdb; batches flow through the folder backends."""
    from PIL import Image

    from gea.config import TrainGLISConfig
    from gea.data.pipeline import make_dataset

    cls_dir = tmp_path / "bedroom"
    cls_dir.mkdir()
    for i in range(5):
        arr = (np.random.default_rng(i).random((64, 80, 3)) * 255).astype(
            np.uint8
        )
        Image.fromarray(arr).save(cls_dir / f"b{i}.png")
    cfg = TrainGLISConfig(
        dataset="lsun",
        dataroot=str(tmp_path),
        lsun_classes="bedroom",
        batch_size=2,
        crop_size=48,
        image_size=32,
        data_backend="pil",
    )
    ds = make_dataset(cfg, seed=0)
    b = next(ds.batches())
    assert b.shape == (2, 48, 48, 3) and b.dtype == np.uint8


def test_lsun_missing_class_errors(tmp_path):
    from gea.config import TrainGLISConfig
    from gea.data.pipeline import make_dataset

    cfg = TrainGLISConfig(
        dataset="lsun", dataroot=str(tmp_path), lsun_classes="kitchen",
        batch_size=2,
    )
    with pytest.raises(FileNotFoundError):
        make_dataset(cfg, seed=0)


def test_device_crop_size_semantics():
    from gea.config import TrainGLISConfig
    from gea.data.pipeline import device_crop_size

    folder = TrainGLISConfig(dataset="folder", crop_size=160, image_size=80)
    assert device_crop_size(folder) == 160  # decode_size: no second crop
    big = TrainGLISConfig(dataset="folder", crop_size=64, image_size=128)
    assert device_crop_size(big) == 128  # never double-crop upscaled batches
    synth = TrainGLISConfig(dataset="synthetic", crop_size=64, image_size=128)
    assert device_crop_size(synth) == 64


def test_host_downsample_uint8_2x_box_mean():
    """The uint16 shift-add fast path must equal the exact box mean
    (round-half-up), pixel for pixel."""
    from gea.data.hostpre import host_downsample_uint8

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (3, 40, 40, 3), dtype=np.uint8)
    out = host_downsample_uint8(raw, crop_size=32, image_size=16)
    assert out.shape == (3, 16, 16, 3) and out.dtype == np.uint8
    crop = raw[:, 4:36, 4:36, :].astype(np.float64)
    ref = (
        crop[:, 0::2, 0::2] + crop[:, 0::2, 1::2]
        + crop[:, 1::2, 0::2] + crop[:, 1::2, 1::2]
    )
    ref = np.floor((ref + 2) / 4).astype(np.uint8)
    np.testing.assert_array_equal(out, ref)


def test_host_downsample_uint8_other_paths():
    from gea.data.hostpre import host_downsample_uint8

    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, (2, 48, 48, 3), dtype=np.uint8)
    # crop == image_size: pure center crop, bytes untouched
    out = host_downsample_uint8(raw, crop_size=16, image_size=16)
    np.testing.assert_array_equal(out, raw[:, 16:32, 16:32, :])
    # integer ratio > 2: generic box mean, round-half-up like the k==2
    # fast path (a truncating .mean().astype(uint8) would bias ~0.5
    # level darker)
    out4 = host_downsample_uint8(raw, crop_size=48, image_size=12)
    assert out4.shape == (2, 12, 12, 3) and out4.dtype == np.uint8
    box = raw.astype(np.float64).reshape(2, 12, 4, 12, 4, 3).sum(axis=(2, 4))
    np.testing.assert_array_equal(
        out4, np.floor((box + 8) / 16).astype(np.uint8)
    )
    flat = host_downsample_uint8(
        np.full((1, 48, 48, 3), 200, np.uint8), 48, 12
    )
    assert np.all(flat == 200)
    # non-integer ratio: PIL bilinear fallback
    out3 = host_downsample_uint8(raw, crop_size=45, image_size=16)
    assert out3.shape == (2, 16, 16, 3) and out3.dtype == np.uint8


def test_host_resize_iterator_streams_final_resolution():
    """--host_resize: the input iterator must yield uint8 at image_size
    (the whole point: (crop/image)^2 fewer bytes over the device link),
    and the fused step must still train on it (crop becomes a no-op)."""
    from gea.config import TrainGLISConfig
    from gea.train.runner import input_iterator

    cfg = TrainGLISConfig(
        dataset="synthetic", crop_size=32, image_size=16, batch_size=4,
        host_resize=True, num_devices=1,
    )
    it = input_iterator(cfg, mesh=None, seed=0)
    batch = next(it)
    assert batch.shape == (4, 16, 16, 3)
    assert batch.dtype == jnp.uint8
