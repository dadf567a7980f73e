"""Python wrapper over the native C++ JPEG loader (TPU-native equivalent
of the reference's `DataLoader(num_workers=N)` fork-based decode pool,
SURVEY.md §2 C9 / §3.1). A C++ worker pool decodes + prescales + center-
crops JPEGs into a ring of pre-allocated uint8 batch buffers; Python only
memcpy-views the ready batch, so the GIL never gates decode throughput."""

from __future__ import annotations

import ctypes
from typing import Iterator, List, Optional, Sequence

import numpy as np

from gea.data.native_build import load_library


def native_available() -> bool:
    return load_library() is not None


def decode_square(path: str, crop_size: int, out_size: int) -> np.ndarray:
    """Single-image decode -> center-crop crop_size px at native res ->
    (out_size, out_size, 3) uint8 (reference CenterCrop->Resize order)."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    out = np.empty((out_size, out_size, 3), np.uint8)
    rc = lib.gea_decode_square(
        path.encode(), crop_size, out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"native decode failed for {path!r}")
    return out


class NativeFolderLoader:
    """Endless shuffled uint8 batch stream backed by the C++ pool; batches
    are already the native-resolution center crop (device_crop_size
    makes the post-decode crop a no-op for folder-backed datasets).

    The C++ pool assigns paths in ticket order under the pool lock, so
    batch composition is a deterministic function of (seed, batch index)
    and `batches(start_batch=N)` restarts the stream mid-run without
    decoding the skipped prefix (the shared counter-based contract,
    gea/data/pipeline.py). The pool starts lazily at the first batches()
    call so the skip happens before any decode work is scheduled."""

    def __init__(
        self,
        paths: Sequence[str],
        batch_size: int,
        crop_size: int,
        decode_size: int,
        workers: int = 4,
        seed: int = 0,
    ):
        from gea.data.pipeline import require_enough_images

        require_enough_images(len(paths), batch_size, "native loader input")
        lib = load_library()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self.batch_size = batch_size
        self.crop_size = crop_size
        self.decode_size = decode_size
        self.workers = workers
        self.seed = seed
        self.paths: List[bytes] = [p.encode() for p in paths]
        self._handle = None
        self._start_batch: Optional[int] = None

    def __len__(self) -> int:
        return len(self.paths)

    def _ensure_handle(self, start_batch: int) -> None:
        if self._handle is not None:
            if start_batch != self._start_batch:
                raise ValueError(
                    "NativeFolderLoader streams from one shared C++ pool; "
                    f"it was started at batch {self._start_batch} and "
                    f"cannot restart at {start_batch}"
                )
            return
        arr = (ctypes.c_char_p * len(self.paths))(*self.paths)
        self._handle = self._lib.gea_loader_create(
            arr, len(self.paths), self.batch_size, self.crop_size,
            self.decode_size, self.workers, self.seed, start_batch,
        )
        if not self._handle:
            self._handle = None
            raise RuntimeError("gea_loader_create failed")
        self._start_batch = start_batch

    def batches(self, start_batch: int = 0) -> Iterator[np.ndarray]:
        self._ensure_handle(start_batch)
        s = self.decode_size
        while True:
            out = np.empty((self.batch_size, s, s, 3), np.uint8)
            rc = self._lib.gea_loader_next(
                self._handle,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
            if rc != 0:
                return
            yield out

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.gea_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - best effort
        try:
            self.close()
        except Exception:
            pass
