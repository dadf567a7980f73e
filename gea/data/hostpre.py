"""Host-side preprocessing path (the reference's torchvision-transform
equivalent, C9): center-crop -> resize -> random-flip -> [-1,1] normalize
entirely on CPU. Selected with ``--on_device_pipeline false``; the default
on-device path (gea/data/ondevice.py) is the TPU-native fast path, this one
exists for parity/debugging and machines where host cycles are free."""

from __future__ import annotations

import numpy as np


def host_preprocess(
    raw: np.ndarray,
    rng: np.random.Generator,
    crop_size: int,
    image_size: int,
    augment_flip: bool = True,
) -> np.ndarray:
    """(B, H, W, 3) uint8 -> (B, image_size, image_size, 3) float32 [-1,1]."""
    from PIL import Image

    b, h, w, _ = raw.shape
    cs = min(crop_size, h, w)
    top, left = (h - cs) // 2, (w - cs) // 2
    cropped = raw[:, top : top + cs, left : left + cs, :]
    if cs != image_size:
        out = np.empty((b, image_size, image_size, 3), np.uint8)
        for i in range(b):
            out[i] = np.asarray(
                Image.fromarray(cropped[i]).resize(
                    (image_size, image_size), Image.BILINEAR
                )
            )
    else:
        out = cropped
    x = out.astype(np.float32) / 127.5 - 1.0
    if augment_flip:
        flip = rng.random(b) < 0.5
        x[flip] = x[flip, :, ::-1, :]
    return x


def host_downsample_uint8(
    raw: np.ndarray, crop_size: int, image_size: int
) -> np.ndarray:
    """(B, H, W, 3) uint8 -> (B, image_size, image_size, 3) uint8: center
    crop + downsample on HOST, for `--host_resize` transport mode.

    Rationale (docs/RESULTS.md round-3 e2e analysis): on hosts with a slow
    device link (the tunneled single-chip here moves ~20-40 MB/s), the
    input transfer is the e2e bottleneck; streaming uint8 at the FINAL
    resolution instead of the decode resolution cuts bytes/step by
    (crop/image)^2 (4x for the 160->80 flagship). Integer ratios use a
    vectorized box-mean (one numpy pass, matching bilinear+antialias
    closely for 2x); other ratios fall back to per-image PIL bilinear.
    Flip/normalize stay on device (gea/data/ondevice.py).
    """
    b, h, w, _ = raw.shape
    cs = min(crop_size, h, w)
    top, left = (h - cs) // 2, (w - cs) // 2
    x = raw[:, top : top + cs, left : left + cs, :]
    if cs == image_size:
        return np.ascontiguousarray(x)
    if cs % image_size == 0:
        k = cs // image_size
        if k == 2:
            # Fast path for the flagship 160->80: integer shift-add box
            # mean in uint16 (np.mean would round-trip through float64
            # and pace the single-core host below the transfer rate).
            a = x.astype(np.uint16)
            s = (
                a[:, 0::2, 0::2]
                + a[:, 0::2, 1::2]
                + a[:, 1::2, 0::2]
                + a[:, 1::2, 1::2]
            )
            return ((s + 2) >> 2).astype(np.uint8)
        # General k: integer box sum with round-half-up (+k²/2 before the
        # divide) — a bare .mean().astype(uint8) would truncate and bias
        # every pixel ~0.5 level darker than the k==2 path above.
        s = x.reshape(b, image_size, k, image_size, k, 3).astype(np.uint32)
        s = s.sum(axis=(2, 4))
        return ((s + k * k // 2) // (k * k)).astype(np.uint8)
    from PIL import Image

    out = np.empty((b, image_size, image_size, 3), np.uint8)
    for i in range(b):
        out[i] = np.asarray(
            Image.fromarray(x[i]).resize(
                (image_size, image_size), Image.BILINEAR
            )
        )
    return out
