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
