"""Host input-pipeline benchmark: native C++ pool vs PIL threads vs RAM
cache, in decoded images/sec (SURVEY.md §3 'Where time goes': host-side
JPEG decode is the reference's secondary hot spot after the conv kernels).

Run: python benchmarks/loader_bench.py [--dataroot DIR] [--batches 30]
(with no --dataroot a throwaway JPEG set is generated in /tmp).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_dataset(root: str, n: int = 512) -> str:
    if root:
        return root
    from PIL import Image

    out = os.path.join(tempfile.gettempdir(), "gea_loader_bench")
    if os.path.isdir(out) and len(os.listdir(out)) >= n:
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:178, 0:218].astype(np.float32)  # CelebA-ish dims
    for i in range(n):
        ph = rng.random(3)
        img = np.stack(
            [
                0.5 + 0.5 * np.sin(2 * np.pi * (yy / 178 * 3 * ph[0])),
                0.5 + 0.5 * np.sin(2 * np.pi * (xx / 218 * 3 * ph[1])),
                np.full_like(yy, ph[2]),
            ],
            -1,
        )

        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(out, f"b{i:04d}.jpg"), quality=92
        )
    return out


def bench(it, batches: int, batch_size: int) -> float:
    next(it)  # warm
    t0 = time.perf_counter()
    for _ in range(batches):
        next(it)
    return batches * batch_size / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", default="")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--decode_size", type=int, default=96)
    ap.add_argument("--crop_size", type=int, default=0)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batches", type=int, default=30)
    a = ap.parse_args()
    root = ensure_dataset(a.dataroot)

    from gea.data.pipeline import CachedFolderDataset, FolderDataset, list_images

    results = {}
    paths = list_images(root)

    try:
        from gea.data.native_loader import NativeFolderLoader, native_available

        if native_available():
            ld = NativeFolderLoader(
                paths, a.batch_size, a.crop_size, a.decode_size,
                workers=a.workers, seed=0,
            )
            results["native_cpp_pool"] = round(
                bench(ld.batches(), a.batches, a.batch_size), 1
            )
            ld.close()
    except Exception as e:
        results["native_cpp_pool"] = f"unavailable: {e}"

    pil = FolderDataset(
        root, a.batch_size, a.crop_size, a.decode_size, workers=a.workers
    )
    results["pil_threads"] = round(
        bench(pil.batches(), a.batches, a.batch_size), 1
    )

    t0 = time.perf_counter()
    cache = CachedFolderDataset(
        root, a.batch_size, a.crop_size, a.decode_size, workers=a.workers
    )
    results["ram_cache_build_sec"] = round(time.perf_counter() - t0, 2)
    results["ram_cache_serve"] = round(
        bench(cache.batches(), a.batches, a.batch_size), 1
    )
    results["unit"] = "decoded images/sec"
    results["config"] = (
        f"batch={a.batch_size} decode={a.decode_size} workers={a.workers} "
        f"files={len(paths)}"
    )
    print(json.dumps(results))


if __name__ == "__main__":
    main()
