"""Host-side dataset iteration (reference C9: `ImageFolder` +
`DataLoader(num_workers=N)`, SURVEY.md §2/§3.1 — the reference's only
concurrency is DataLoader worker processes decoding JPEG).

TPU-native equivalent: a thread pool decodes images to uint8 (PIL releases
the GIL inside decode), batches are handed to the device as uint8 and the
crop/resize/flip/normalize runs jitted on device (gea/data/ondevice.py).
A `synthetic` mode yields deterministic pseudo-images for tests and
benchmarks (SURVEY.md §4 'Integration').
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def list_images(root: str) -> List[str]:
    out: List[str] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in sorted(filenames):
            if fn.lower().endswith(IMG_EXTENSIONS):
                out.append(os.path.join(dirpath, fn))
    if not out:
        raise FileNotFoundError(f"no images found under {root!r}")
    return out


def _decode(path: str, decode_size: int) -> np.ndarray:
    """Decode to RGB uint8 and pre-shrink on host to a uniform square
    `decode_size` (>= crop region) so device batches have a static shape.

    The host does the minimum work with a static output contract; the
    quality-affecting crop/resize happen on device.
    """
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        w, h = im.size
        # Scale the short side to decode_size, keeping aspect, then center
        # crop to a square — cheap host ops on the already-decoded buffer.
        scale = decode_size / min(w, h)
        if scale != 1.0:
            im = im.resize(
                (max(decode_size, round(w * scale)), max(decode_size, round(h * scale))),
                Image.BILINEAR,
            )
        w, h = im.size
        left = (w - decode_size) // 2
        top = (h - decode_size) // 2
        im = im.crop((left, top, left + decode_size, top + decode_size))
        return np.asarray(im, dtype=np.uint8)


class FolderDataset:
    """Endless shuffled batch iterator over an image folder; yields uint8
    batches of shape (batch_size, decode_size, decode_size, 3), dropping
    each epoch's ragged remainder."""

    def __init__(
        self,
        root: str,
        batch_size: int,
        decode_size: int,
        workers: int = 4,
        seed: int = 0,
    ):
        self.paths = list_images(root)
        self.batch_size = batch_size
        self.decode_size = decode_size
        self.rng = np.random.default_rng(seed)
        self.pool = ThreadPoolExecutor(max_workers=max(1, workers))

    def __len__(self) -> int:
        return len(self.paths)

    def batches(self) -> Iterator[np.ndarray]:
        order = np.arange(len(self.paths))
        while True:
            self.rng.shuffle(order)
            for i in range(0, len(order) - self.batch_size + 1, self.batch_size):
                idx = order[i : i + self.batch_size]
                arrs = list(
                    self.pool.map(
                        lambda j: _decode(self.paths[j], self.decode_size), idx
                    )
                )
                yield np.stack(arrs)


class SyntheticDataset:
    """Deterministic pseudo-image stream: smooth colored gradients + noise.

    Stands in for CelebA in tests/benchmarks (BASELINE.json config 1 is the
    CPU-runnable reference point; SURVEY.md §4 'synthetic-data mode').
    """

    def __init__(self, batch_size: int, decode_size: int, seed: int = 0):
        self.batch_size = batch_size
        self.decode_size = decode_size
        self.seed = seed

    def __len__(self) -> int:
        return 10_000

    def batches(self) -> Iterator[np.ndarray]:
        rng = np.random.default_rng(self.seed)
        s = self.decode_size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        while True:
            phase = rng.random((self.batch_size, 1, 1, 3), dtype=np.float32)
            base = (
                0.5
                + 0.5
                * np.sin(
                    2 * np.pi * (yy[None, :, :, None] * phase + xx[None, :, :, None])
                )
            )
            noise = rng.random(base.shape, dtype=np.float32) * 0.1
            img = np.clip(base + noise, 0, 1) * 255
            yield img.astype(np.uint8)


def make_dataset(cfg, seed: int = 0):
    """Build the host iterator for a Train*Config (dataset/dataroot/
    batch_size/crop_size/data_workers fields)."""
    decode_size = max(cfg.crop_size, cfg.image_size)
    if cfg.dataset == "synthetic":
        return SyntheticDataset(cfg.batch_size, decode_size, seed=seed)
    if cfg.dataset == "folder":
        if getattr(cfg, "data_cache", False):
            return CachedFolderDataset(
                cfg.dataroot,
                cfg.batch_size,
                decode_size,
                workers=cfg.data_workers,
                seed=seed,
            )
        backend = getattr(cfg, "data_backend", "auto")
        if backend == "grain":
            from gea.data.grain_loader import GrainFolderLoader

            return GrainFolderLoader(
                list_images(cfg.dataroot),
                cfg.batch_size,
                decode_size,
                workers=cfg.data_workers,
                seed=seed,
            )
        if backend in ("auto", "native"):
            loader = _try_native_loader(cfg, decode_size, seed)
            if loader is not None:
                return loader
            if backend == "native":
                raise RuntimeError(
                    "native data backend requested but unavailable "
                    "(no toolchain/libjpeg, or non-JPEG files in folder)"
                )
        return FolderDataset(
            cfg.dataroot,
            cfg.batch_size,
            decode_size,
            workers=cfg.data_workers,
            seed=seed,
        )
    if cfg.dataset == "cifar10":
        return _cifar10_dataset(cfg, seed)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


class CachedFolderDataset:
    """Decode the whole folder once (native pool when available, else PIL
    threads) into one pinned uint8 array, then serve shuffled batches at
    memcpy speed. For datasets that fit host RAM (CelebA at decode size
    96-160 is 5-15 GB) this removes JPEG decode from the steady-state path
    entirely — the train step becomes compute-bound (BASELINE.json: the
    alternating step 'never stalls on input')."""

    def __init__(
        self,
        root: str,
        batch_size: int,
        decode_size: int,
        workers: int = 4,
        seed: int = 0,
    ):
        self.batch_size = batch_size
        self.decode_size = decode_size
        self.rng = np.random.default_rng(seed)
        paths = list_images(root)
        self.data = np.empty(
            (len(paths), decode_size, decode_size, 3), np.uint8
        )
        native = None
        try:
            from gea.data import native_loader

            if native_loader.native_available() and all(
                p.lower().endswith((".jpg", ".jpeg")) for p in paths
            ):
                native = native_loader.decode_square
        except Exception:
            pass
        decode = native or (lambda p, s: _decode(p, s))
        with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
            for i, arr in enumerate(
                pool.map(lambda p: decode(p, decode_size), paths)
            ):
                self.data[i] = arr

    def __len__(self) -> int:
        return len(self.data)

    def batches(self) -> Iterator[np.ndarray]:
        n = len(self.data)
        order = np.arange(n)
        while True:
            self.rng.shuffle(order)
            for i in range(0, n - self.batch_size + 1, self.batch_size):
                yield self.data[order[i : i + self.batch_size]]


def _try_native_loader(cfg, decode_size: int, seed: int):
    """C++ decode pool (gea/data/native_loader.py) when every file is a
    JPEG and the library builds; None otherwise."""
    try:
        from gea.data.native_loader import NativeFolderLoader, native_available
    except Exception:
        return None
    if not native_available():
        return None
    paths = list_images(cfg.dataroot)
    if not all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
        return None
    try:
        return NativeFolderLoader(
            paths,
            cfg.batch_size,
            decode_size,
            workers=cfg.data_workers,
            seed=seed,
        )
    except RuntimeError:
        return None


def _cifar10_dataset(cfg, seed: int):
    """CIFAR-10 from a local extracted copy (no network in this image);
    expects the standard python pickle batches under cfg.dataroot."""
    import pickle

    arrays = []
    for name in sorted(os.listdir(cfg.dataroot)):
        if name.startswith("data_batch"):
            with open(os.path.join(cfg.dataroot, name), "rb") as f:
                d = pickle.load(f, encoding="bytes")
            arrays.append(
                d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
            )
    if not arrays:
        raise FileNotFoundError(
            f"no CIFAR-10 data_batch files under {cfg.dataroot!r}"
        )
    data = np.concatenate(arrays).astype(np.uint8)

    class _Cifar:
        batch_size = cfg.batch_size

        def __len__(self):
            return len(data)

        def batches(self):
            rng = np.random.default_rng(seed)
            order = np.arange(len(data))
            while True:
                rng.shuffle(order)
                for i in range(
                    0, len(order) - cfg.batch_size + 1, cfg.batch_size
                ):
                    yield data[order[i : i + cfg.batch_size]]

    return _Cifar()
