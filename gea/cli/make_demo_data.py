"""Generate the procedural demo dataset used by docs/RESULTS.md runs.

No real CelebA dump exists in this offline image, so hardware demo runs
train on a procedurally generated JPEG folder: smooth two-color background
gradients with a soft-edged central ellipse "face" blob of varying color,
size, position, and eccentricity, plus light sensor noise. The distribution
is deliberately simple enough for a small GAN to learn in ~10k steps yet
diverse enough that raw-z renders show visible defects for the
error-avoidance chain to fix (the per-stage FID tables in docs/RESULTS.md).

This replaces the ad-hoc generation of round 1 with a reproducible tool:

    python -m gea.cli.make_demo_data --out /tmp/demo_faces --count 2000

Images are written at --size (default 200) so the reference transform chain
CenterCrop(160) -> Resize(80) (SURVEY.md C9) applies unchanged.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def render_image(rng: np.random.Generator, size: int) -> np.ndarray:
    """One sample: gradient background + soft central ellipse, uint8 HWC."""
    s = size
    yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s

    # Two-color linear gradient background at a random angle.
    c0 = rng.uniform(0.1, 0.9, 3).astype(np.float32)
    c1 = rng.uniform(0.1, 0.9, 3).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi)
    t = (xx * np.cos(ang) + yy * np.sin(ang) + 1) / 2
    img = c0 * (1 - t[..., None]) + c1 * t[..., None]

    # Soft-edged ellipse blob near the center (the "face").
    cx = 0.5 + rng.uniform(-0.08, 0.08)
    cy = 0.5 + rng.uniform(-0.08, 0.08)
    rx = rng.uniform(0.16, 0.30)
    ry = rx * rng.uniform(0.8, 1.35)
    theta = rng.uniform(-0.5, 0.5)
    dx, dy = xx - cx, yy - cy
    u = dx * np.cos(theta) + dy * np.sin(theta)
    v = -dx * np.sin(theta) + dy * np.cos(theta)
    d = np.sqrt((u / rx) ** 2 + (v / ry) ** 2)
    mask = np.clip((1.15 - d) / 0.3, 0, 1)[..., None]
    blob = rng.uniform(0.2, 1.0, 3).astype(np.float32)
    img = img * (1 - mask) + blob * mask

    # Two small darker "eye" dots make orientation learnable.
    for sx in (-1, 1):
        ex, ey = cx + sx * rx * 0.4, cy - ry * 0.25
        de = np.sqrt((xx - ex) ** 2 + (yy - ey) ** 2)
        em = np.clip((0.035 - de) / 0.015, 0, 1)[..., None]
        img = img * (1 - em * 0.8)

    img += rng.normal(0, 0.015, img.shape).astype(np.float32)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main(argv=None) -> None:
    from PIL import Image

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", required=True, help="output folder")
    p.add_argument("--count", type=int, default=2000)
    p.add_argument("--size", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--quality", type=int, default=92)
    a = p.parse_args(argv)

    os.makedirs(a.out, exist_ok=True)
    rng = np.random.default_rng(a.seed)
    for i in range(a.count):
        Image.fromarray(render_image(rng, a.size)).save(
            os.path.join(a.out, f"img{i:05d}.jpg"), quality=a.quality
        )
    print(f"[gea] wrote {a.count} {a.size}x{a.size} JPEGs to {a.out}")


if __name__ == "__main__":
    main()
