"""Native C++ data-loader tests (gea/data/native_loader.py — the
TPU-native equivalent of the reference DataLoader's native decode pool)."""

import os

import numpy as np
import pytest
from PIL import Image

native = pytest.importorskip("gea.data.native_loader")
if not native.native_available():
    pytest.skip("native loader toolchain unavailable", allow_module_level=True)


@pytest.fixture
def jpeg_dir(tmp_path, rng):
    paths = []
    for i in range(10):
        yy, xx = np.mgrid[0 : 100 + i, 0:120].astype(np.float32)
        arr = np.stack(
            [yy / (100 + i) * 255, xx / 120 * 255, np.full_like(yy, 30 + i)],
            -1,
        ).astype(np.uint8)
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(arr).save(p, quality=93)
        paths.append(str(p))
    return paths


def test_decode_square_matches_pil(jpeg_dir):
    from gea.data.pipeline import _decode

    a = native.decode_square(jpeg_dir[0], 80, 48).astype(np.float32)
    b = _decode(jpeg_dir[0], 80, 48).astype(np.float32)
    assert a.shape == (48, 48, 3)
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.995
    assert np.abs(a.mean((0, 1)) - b.mean((0, 1))).max() < 3.0


def test_decode_square_integer_crop_on_odd_margins(tmp_path, rng):
    """No-prescale decodes must center-crop at an INTEGER origin like the
    PIL parity path — a fractional (half-pixel) origin bilinearly blurs
    every image whose crop margin is odd (regression)."""
    from gea.data.pipeline import _decode

    arr = (rng.random((97, 113, 3)) * 255).astype(np.uint8)
    p = tmp_path / "odd.jpg"
    Image.fromarray(arr).save(p, quality=95)
    # crop 64 of 113x97: margins 49 and 33, both odd; cs == out_size so
    # no resize and no DCT prescale — both paths decode with libjpeg and
    # must produce (near-)identical pixels.
    a = native.decode_square(str(p), 64, 64).astype(np.int32)
    b = _decode(str(p), 64, 64).astype(np.int32)
    diff = np.abs(a - b)
    assert diff.mean() < 1.0, f"mean diff {diff.mean():.2f} (blurred crop?)"
    assert (diff > 4).mean() < 0.01


def test_decode_rejects_garbage(tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"not a jpeg at all")
    with pytest.raises(ValueError):
        native.decode_square(str(p), 0, 32)


def test_loader_streams_batches(jpeg_dir):
    ld = native.NativeFolderLoader(
        jpeg_dir, batch_size=4, crop_size=64, decode_size=32, workers=3,
        seed=0,
    )
    it = ld.batches()
    batches = [next(it) for _ in range(5)]
    ld.close()
    for b in batches:
        assert b.shape == (4, 32, 32, 3) and b.dtype == np.uint8
        assert b.mean() > 10  # actually decoded, not zero-filled
    assert not np.array_equal(batches[0], batches[1])


def test_cached_folder_dataset(jpeg_dir):
    from gea.data.pipeline import CachedFolderDataset

    ds = CachedFolderDataset(
        os.path.dirname(jpeg_dir[0]), batch_size=4, crop_size=64,
        decode_size=32, workers=2, seed=0,
    )
    assert len(ds) == 10
    it = ds.batches()
    b1, b2 = next(it), next(it)
    assert b1.shape == (4, 32, 32, 3) and b1.dtype == np.uint8
    assert b1.mean() > 10
    assert not np.array_equal(b1, b2)


def test_make_dataset_selects_native(jpeg_dir, tmp_path):
    from gea.config import TrainGLISConfig
    from gea.data.pipeline import make_dataset

    cfg = TrainGLISConfig(
        dataset="folder",
        dataroot=os.path.dirname(jpeg_dir[0]),
        batch_size=4,
        crop_size=32,
        image_size=32,
        data_backend="native",
    )
    ds = make_dataset(cfg, seed=0)
    assert type(ds).__name__ == "NativeFolderLoader"
    b = next(ds.batches())
    assert b.shape == (4, 32, 32, 3)
    ds.close()


def test_make_dataset_selects_grain(jpeg_dir):
    from gea.config import TrainGLISConfig
    from gea.data.pipeline import make_dataset

    cfg = TrainGLISConfig(
        dataset="folder",
        dataroot=os.path.dirname(jpeg_dir[0]),
        batch_size=4,
        crop_size=32,
        image_size=32,
        data_backend="grain",
    )
    ds = make_dataset(cfg, seed=0)
    assert type(ds).__name__ == "GrainFolderLoader"
    b = next(ds.batches())
    assert b.shape == (4, 32, 32, 3) and b.dtype == np.uint8


def test_decode_field_of_view_is_native_crop(tmp_path):
    """CenterCrop(crop) must happen at NATIVE resolution before any resize
    (ADVICE.md r1 medium): with a white 60x60 center on a black 200x240
    canvas, crop_size=60 must see only white. The old resize-then-crop
    order would shrink first and leak black border into the crop."""
    from gea.data.pipeline import _decode

    arr = np.zeros((240, 200, 3), np.uint8)
    arr[90:150, 70:130] = 255
    p = tmp_path / "fov.jpg"
    Image.fromarray(arr).save(p, quality=98)

    for decoded in (
        _decode(str(p), 60, 48),
        native.decode_square(str(p), 60, 48),
    ):
        assert decoded.mean() > 245, decoded.mean()

    # and crop_size=0 / crop >= short side falls back to the largest
    # centered square (mixed black/white)
    full = _decode(str(p), 0, 48).astype(np.float32)
    assert 10 < full.mean() < 120


def test_decode_matches_torchvision_oracle(tmp_path):
    """PIL path bit-parity with the reference transform: CenterCrop(cs)
    (integer box) then Resize(out) — on an even-offset crop the box-resize
    is the identical PIL op."""
    from PIL import Image as PILImage

    from gea.data.pipeline import _decode

    rng = np.random.default_rng(3)
    arr = (rng.random((218, 178, 3)) * 255).astype(np.uint8)
    p = tmp_path / "face.png"
    PILImage.fromarray(arr).save(p)

    ours = _decode(str(p), 160, 96)
    with PILImage.open(p) as im:
        im = im.convert("RGB")
        w, h = im.size
        left, top = (w - 160) // 2, (h - 160) // 2
        oracle = np.asarray(
            im.crop((left, top, left + 160, top + 160)).resize(
                (96, 96), PILImage.BILINEAR
            ),
            dtype=np.uint8,
        )
    assert np.array_equal(ours, oracle)


def test_loader_deterministic_and_restartable(jpeg_dir):
    """Batch composition is a pure function of (seed, batch index): paths
    are assigned at ticket issuance in the C++ pool, so worker count and
    wake order do not change the stream, and start_batch fast-forwards it
    (deterministic resume, gea/data/pipeline.py contract)."""
    def take(workers, start, n):
        ld = native.NativeFolderLoader(
            jpeg_dir, batch_size=4, crop_size=64, decode_size=32,
            workers=workers, seed=9,
        )
        it = ld.batches(start)
        out = [next(it).copy() for _ in range(n)]
        ld.close()
        return out

    # 10 images, batch 4: batches straddle the reshuffle at 10/20/... draws
    full = take(workers=3, start=0, n=7)
    again = take(workers=1, start=0, n=7)  # worker count must not matter
    for a, b in zip(full, again):
        np.testing.assert_array_equal(a, b)
    tail = take(workers=2, start=5, n=2)
    for a, b in zip(full[5:], tail):
        np.testing.assert_array_equal(a, b)


def test_loader_rejects_conflicting_restart(jpeg_dir):
    ld = native.NativeFolderLoader(
        jpeg_dir, batch_size=4, crop_size=64, decode_size=32, workers=1,
        seed=0,
    )
    next(ld.batches(2))
    with pytest.raises(ValueError, match="cannot restart"):
        next(ld.batches(0))
    ld.close()
