"""Sample-grid writer (reference C11: fixed eval-noise batch tiled into a
PNG every `--vis_interval`, one grid per LIS stage — the reference's real
observability surface, SURVEY.md §5 'Metrics/observability')."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def to_uint8(images: np.ndarray) -> np.ndarray:
    """[-1, 1] float (B, H, W, 3) -> uint8."""
    images = np.asarray(images, dtype=np.float32)
    return np.clip((images + 1.0) * 127.5, 0, 255).astype(np.uint8)


def tile_grid(images: np.ndarray, rows: int, pad: int = 2) -> np.ndarray:
    """(B, H, W, 3) uint8 -> one tiled grid image, row-major."""
    b, h, w, c = images.shape
    cols = (b + rows - 1) // rows
    grid = np.full(
        (rows * (h + pad) - pad, cols * (w + pad) - pad, c), 255, np.uint8
    )
    for i in range(b):
        r, col = divmod(i, cols)
        if r >= rows:
            break
        grid[
            r * (h + pad) : r * (h + pad) + h,
            col * (w + pad) : col * (w + pad) + w,
        ] = images[i]
    return grid


def save_image_grid(
    images: np.ndarray,
    path: str,
    rows: int = 8,
    already_uint8: bool = False,
) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = images if already_uint8 else to_uint8(images)
    Image.fromarray(tile_grid(arr, rows)).save(path)


def save_stage_gif(
    stage_images: np.ndarray,
    path: str,
    rows: int = 8,
    duration_ms: int = 600,
) -> None:
    """Animated GIF cycling through the LIS stages for a fixed noise batch
    (the reference README's per-stage progression GIFs, C14): frame s is
    the grid of stage-s renders, so the error-avoidance correction plays
    as an animation."""
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = [
        Image.fromarray(tile_grid(to_uint8(stage_images[s]), rows))
        for s in range(stage_images.shape[0])
    ]
    frames[0].save(
        path,
        save_all=True,
        append_images=frames[1:],
        duration=duration_ms,
        loop=0,
    )


def save_stage_grids(
    stage_images: np.ndarray, out_dir: str, step: int, rows: int = 8
) -> None:
    """(S, B, H, W, 3) in [-1,1] -> one grid PNG per LIS stage, named like
    the reference's per-stage progression outputs."""
    for s in range(stage_images.shape[0]):
        save_image_grid(
            stage_images[s],
            os.path.join(out_dir, f"samples_{step:08d}_stage{s}.png"),
            rows=rows,
        )
