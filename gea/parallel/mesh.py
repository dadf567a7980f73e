"""Device mesh construction.

One `data` axis carries batch sharding for the GAN trainers (the models are
small — tens of MB — so parameters replicate and gradients reduce with psum
over ICI; BASELINE.json: 'Replicated data-parallel training uses psum
gradient reduction over ICI'). The helper leaves room for extra axes
('model') as seams for tensor parallelism, per SURVEY.md §2 ('leave seams
(mesh axes) but do not build').

Multi-host pods: call `jax.distributed.initialize()` before `make_mesh`;
`jax.devices()` then spans hosts and the same mesh code rides DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"


def make_mesh(
    num_devices: int = 0, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """1-D data-parallel mesh over `num_devices` (0 = all visible)."""
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices but only {len(devs)} visible"
            )
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))
