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
MODEL_AXIS = "model"


def make_mesh(
    num_devices: int = 0,
    devices: Optional[Sequence[jax.Device]] = None,
    model_shards: int = 1,
) -> Mesh:
    """Data-parallel mesh over `num_devices` (0 = all visible).

    With `model_shards > 1` the same devices form a 2-D ('data', 'model')
    mesh for GSPMD dp x tp (gea/parallel/tp.py); model_shards must divide
    the device count. The 'model' axis is innermost so TP collectives ride
    the fastest ICI hops between physically-adjacent chips.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices and num_devices > 0:
        if num_devices > len(devs):
            raise ValueError(
                f"requested {num_devices} devices but only {len(devs)} visible"
            )
        devs = devs[:num_devices]
    if model_shards > 1:
        if len(devs) % model_shards:
            raise ValueError(
                f"model_shards {model_shards} must divide the device count "
                f"{len(devs)}"
            )
        grid = np.asarray(devs).reshape(-1, model_shards)
        return Mesh(grid, (DATA_AXIS, MODEL_AXIS))
    return Mesh(np.asarray(devs), (DATA_AXIS,))
