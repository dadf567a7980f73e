"""On-device image preprocessing (BASELINE.json config 5 / north star:
"the CelebA image pipeline (decode, face-crop, resize, flip, [-1,1]
normalize) moves on-device").

The reference does all of this on host CPU inside torchvision transforms
(CenterCrop -> Resize -> RandomHorizontalFlip -> ToTensor -> Normalize,
SURVEY.md §2 C9). Here the host decodes to fixed-size uint8 arrays — for
folder datasets the decode already applies the reference CenterCrop at
NATIVE resolution (gea/data/pipeline._decode), so callers pass
crop_size=decode_size (no-op) via pipeline.device_crop_size; everything
else is a jitted device function that XLA fuses into a single pass over
the batch:

* center crop to `crop_size` (static slice; no-op for pre-cropped
  folder batches),
* bilinear resize to `image_size` (jax.image.resize — lowers to two
  matmul-like gathers that ride the MXU/VPU),
* per-sample random horizontal flip (`jnp.where` on a reversed view —
  no data-dependent control flow, so one compiled program serves every
  batch),
* uint8 -> [-1, 1] float normalize.

Decode stays on host because TPUs have no JPEG unit; the transfer is uint8
(3 bytes/pixel) rather than float32, quartering PCIe/host-link traffic.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def synthetic_batch(
    rng: jax.Array, batch: int, size: int
) -> jnp.ndarray:
    """On-device synthetic images in [-1, 1]: same smooth-gradient+noise
    family as pipeline.SyntheticDataset, generated INSIDE the jitted step
    so benchmarks/tests need zero host->device input transfer (the tunnel
    link here moves ~16-21 MB/s, which otherwise bottlenecks e2e training
    far below the compiled step's throughput)."""
    phase_rng, noise_rng = jax.random.split(rng)
    yy, xx = jnp.mgrid[0:size, 0:size].astype(jnp.float32) / size
    phase = jax.random.uniform(phase_rng, (batch, 1, 1, 3))
    base = 0.5 + 0.5 * jnp.sin(
        2 * jnp.pi * (yy[None, :, :, None] * phase + xx[None, :, :, None])
    )
    noise = jax.random.uniform(noise_rng, base.shape) * 0.1
    return jnp.clip(base + noise, 0.0, 1.0) * 2.0 - 1.0


@functools.partial(
    jax.jit, static_argnames=("crop_size", "image_size", "augment_flip")
)
def preprocess_batch(
    raw: jnp.ndarray,
    rng: jax.Array,
    crop_size: int,
    image_size: int,
    augment_flip: bool = True,
) -> jnp.ndarray:
    """(B, H, W, 3) uint8 -> (B, image_size, image_size, 3) float32 in [-1,1]."""
    b, h, w, _ = raw.shape
    cs = min(crop_size, h, w)
    top = (h - cs) // 2
    left = (w - cs) // 2
    x = raw[:, top : top + cs, left : left + cs, :]
    x = x.astype(jnp.float32) / 127.5 - 1.0
    if cs != image_size:
        x = jax.image.resize(
            x, (b, image_size, image_size, 3), method="bilinear", antialias=cs > image_size
        )
    if augment_flip:
        flip = jax.random.bernoulli(rng, 0.5, (b, 1, 1, 1))
        x = jnp.where(flip, x[:, :, ::-1, :], x)
    return x
