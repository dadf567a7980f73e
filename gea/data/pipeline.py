"""Host-side dataset iteration (reference C9: `ImageFolder` +
`DataLoader(num_workers=N)`, SURVEY.md §2/§3.1 — the reference's only
concurrency is DataLoader worker processes decoding JPEG).

TPU-native equivalent: a thread pool decodes images to uint8 (PIL releases
the GIL inside decode), batches are handed to the device as uint8 and the
crop/resize/flip/normalize runs jitted on device (gea/data/ondevice.py).
A `synthetic` mode yields deterministic pseudo-images for tests and
benchmarks (SURVEY.md §4 'Integration').

Every backend's stream is COUNTER-BASED (the grain design): batch i of a
seeded stream is a pure function of (seed, i) — epoch e's shuffle is
`default_rng([seed, e]).permutation(n)`, never an evolving generator — so
`batches(start_batch=N)` restarts mid-stream in O(1) without decoding the
skipped prefix. The trainers use this to fast-forward the input pipeline
to the resumed step, making checkpoint resume bit-deterministic (the
reference restarts its DataLoader from scratch on resume, silently
revisiting early batches)."""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Tuple

import numpy as np

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def require_enough_images(n: int, batch_size: int, what: str) -> None:
    """Fail fast when a dataset cannot fill one batch — the shuffle-epoch
    generators below would otherwise spin forever yielding nothing while
    the prefetch consumer blocks silently."""
    if n < batch_size:
        raise ValueError(
            f"{what} has {n} images but batch_size is {batch_size}; "
            "reduce --batch_size or provide more data"
        )


def epoch_permutation(seed: int, epoch: int, n: int) -> np.ndarray:
    """Shuffle order for epoch `epoch` of a seeded stream — a pure
    function of (seed, epoch), so any batch index can be reconstructed
    without replaying the stream (deterministic restart)."""
    return np.random.default_rng([seed, epoch]).permutation(n)


def list_images(root: str) -> List[str]:
    out: List[str] = []
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in sorted(filenames):
            if fn.lower().endswith(IMG_EXTENSIONS):
                out.append(os.path.join(dirpath, fn))
    if not out:
        raise FileNotFoundError(f"no images found under {root!r}")
    return out


def _decode(path: str, crop_size: int, out_size: int) -> np.ndarray:
    """Decode to RGB uint8, center-crop ``crop_size`` pixels at NATIVE
    resolution, and resize the crop to a static ``out_size`` square.

    The crop-then-resize order matches the reference transform chain
    (CenterCrop(crop_size) -> Resize(image_size), SURVEY.md C9): the field
    of view is exactly crop_size source pixels. crop_size <= 0, or images
    smaller than crop_size, fall back to the largest centered square. The
    crop+resize is one bilinear pass (PIL box-resize); a JPEG DCT draft
    prescale kicks in only when the crop region still retains >= out_size
    pixels afterwards, so no output detail is lost.
    """
    from PIL import Image

    with Image.open(path) as im:
        w0, h0 = im.size
        cs = min(w0, h0) if crop_size <= 0 else min(crop_size, w0, h0)
        if im.format == "JPEG" and cs >= 2 * out_size:
            im.draft(
                "RGB",
                (max(1, w0 * out_size // cs), max(1, h0 * out_size // cs)),
            )
        im = im.convert("RGB")
        w, h = im.size  # draft may have shrunk the decode resolution
        if (w, h) == (w0, h0):
            # Exact reference parity: integer center crop (torchvision
            # rounding) then bilinear resize.
            left = int(round((w0 - cs) / 2.0))
            top = int(round((h0 - cs) / 2.0))
            im = im.crop((left, top, left + cs, top + cs))
            if cs != out_size:
                im = im.resize((out_size, out_size), Image.BILINEAR)
        else:
            # Prescaled decode: the crop box is fractional in decoded
            # coords — crop+resize in one bilinear box-resize pass.
            sx, sy = w / w0, h / h0
            left, top = (w0 - cs) / 2 * sx, (h0 - cs) / 2 * sy
            im = im.resize(
                (out_size, out_size),
                Image.BILINEAR,
                box=(left, top, left + cs * sx, top + cs * sy),
            )
        return np.asarray(im, dtype=np.uint8)


class FolderDataset:
    """Endless shuffled batch iterator over an image folder; yields uint8
    batches of shape (batch_size, decode_size, decode_size, 3) whose
    content is already the native-resolution center crop,
    dropping each epoch's ragged remainder. Batch i is a pure function of
    (seed, i): `batches(start_batch=N)` resumes the stream mid-epoch."""


    def __init__(
        self,
        root: str,
        batch_size: int,
        crop_size: int,
        decode_size: int,
        workers: int = 4,
        seed: int = 0,
    ):
        self.paths = list_images(root)
        require_enough_images(len(self.paths), batch_size, root)
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.decode_size = decode_size
        self.seed = seed
        self.pool = ThreadPoolExecutor(max_workers=max(1, workers))

    def __len__(self) -> int:
        return len(self.paths)

    def batches(self, start_batch: int = 0) -> Iterator[np.ndarray]:
        bpe = len(self.paths) // self.batch_size
        i = start_batch
        epoch, order = -1, None
        while True:
            e, off = divmod(i, bpe)
            if e != epoch:
                epoch, order = e, epoch_permutation(
                    self.seed, e, len(self.paths)
                )
            idx = order[off * self.batch_size : (off + 1) * self.batch_size]
            arrs = list(
                self.pool.map(
                    lambda j: _decode(
                        self.paths[j], self.crop_size, self.decode_size
                    ),
                    idx,
                )
            )
            yield np.stack(arrs)
            i += 1


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

    def batches(self, start_batch: int = 0) -> Iterator[np.ndarray]:
        s = self.decode_size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        i = start_batch
        while True:
            # Batch i is a pure function of (seed, i) — restartable.
            rng = np.random.default_rng([self.seed, i])
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
            i += 1


def device_crop_size(cfg) -> int:
    """Crop the device/host preprocess should apply AFTER decode.

    Folder-backed datasets already center-crop crop_size pixels at native
    resolution inside decode (the reference's CenterCrop field of view), so
    the post-decode crop must be a no-op (decode_size) — cropping again
    would narrow the field of view twice. synthetic/cifar10 batches are
    native content, so the configured crop still applies to them.
    """
    decode_size = max(cfg.crop_size, cfg.image_size)
    return decode_size if cfg.dataset in ("folder", "lsun") else cfg.crop_size


def make_dataset(cfg, seed: int = 0):
    """Build the host iterator for a Train*Config (dataset/dataroot/
    batch_size/crop_size/data_workers fields)."""
    decode_size = max(cfg.crop_size, cfg.image_size)
    if cfg.dataset == "synthetic":
        return SyntheticDataset(cfg.batch_size, decode_size, seed=seed)
    if cfg.dataset in ("folder", "lsun"):
        dataroot = cfg.dataroot
        if cfg.dataset == "lsun":
            from gea.data.lsun import resolve_lsun_root

            dataroot = resolve_lsun_root(cfg)
        if getattr(cfg, "data_cache", False):
            return CachedFolderDataset(
                dataroot,
                cfg.batch_size,
                cfg.crop_size,
                decode_size,
                workers=cfg.data_workers,
                seed=seed,
            )
        backend = getattr(cfg, "data_backend", "auto")
        if backend == "grain":
            from gea.data.grain_loader import GrainFolderLoader

            return GrainFolderLoader(
                list_images(dataroot),
                cfg.batch_size,
                cfg.crop_size,
                decode_size,
                workers=cfg.data_workers,
                seed=seed,
            )
        if backend in ("auto", "native"):
            loader = _try_native_loader(cfg, dataroot, decode_size, seed)
            if loader is not None:
                return loader
            if backend == "native":
                raise RuntimeError(
                    "native data backend requested but unavailable "
                    "(no toolchain/libjpeg, or non-JPEG files in folder)"
                )
        return FolderDataset(
            dataroot,
            cfg.batch_size,
            cfg.crop_size,
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
        crop_size: int,
        decode_size: int,
        workers: int = 4,
        seed: int = 0,
    ):
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.decode_size = decode_size
        self.seed = seed
        paths = list_images(root)
        require_enough_images(len(paths), batch_size, root)
        self.data = np.empty(
            (len(paths), decode_size, decode_size, 3), np.uint8
        )
        decode = _decode
        try:
            from gea.data import native_loader

            if native_loader.native_available() and all(
                p.lower().endswith((".jpg", ".jpeg")) for p in paths
            ):
                decode = native_loader.decode_square
        except Exception:
            pass
        with ThreadPoolExecutor(max_workers=max(1, workers)) as pool:
            for i, arr in enumerate(
                pool.map(lambda p: decode(p, crop_size, decode_size), paths)
            ):
                self.data[i] = arr

    def __len__(self) -> int:
        return len(self.data)

    def batches(self, start_batch: int = 0) -> Iterator[np.ndarray]:
        n = len(self.data)
        bpe = n // self.batch_size
        i = start_batch
        epoch, order = -1, None
        while True:
            e, off = divmod(i, bpe)
            if e != epoch:
                epoch, order = e, epoch_permutation(self.seed, e, n)
            yield self.data[
                order[off * self.batch_size : (off + 1) * self.batch_size]
            ]
            i += 1


def _try_native_loader(cfg, dataroot: str, decode_size: int, seed: int):
    """C++ decode pool (gea/data/native_loader.py) when every file is a
    JPEG and the library builds; None otherwise."""
    try:
        from gea.data.native_loader import NativeFolderLoader, native_available
    except Exception:
        return None
    if not native_available():
        return None
    paths = list_images(dataroot)
    if not all(p.lower().endswith((".jpg", ".jpeg")) for p in paths):
        return None
    try:
        return NativeFolderLoader(
            paths,
            cfg.batch_size,
            cfg.crop_size,
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

    require_enough_images(len(data), cfg.batch_size, "cifar10")

    class _Cifar:
        batch_size = cfg.batch_size

        def __len__(self):
            return len(data)

        def batches(self, start_batch: int = 0):
            bpe = len(data) // cfg.batch_size
            i = start_batch
            epoch, order = -1, None
            while True:
                e, off = divmod(i, bpe)
                if e != epoch:
                    epoch, order = e, epoch_permutation(seed, e, len(data))
                yield data[
                    order[off * cfg.batch_size : (off + 1) * cfg.batch_size]
                ]
                i += 1

    return _Cifar()
