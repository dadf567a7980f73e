"""Run-directory utilities: checkpointing (reference C10), sample grids
(C11), loss plots (C2), throughput meters and profiling (TPU-native
additions per SURVEY.md §5)."""

from gea.utils.checkpoint import (  # noqa: F401
    latest_step,
    restore_checkpoint,
    save_checkpoint,
)
from gea.utils.grids import save_image_grid, to_uint8  # noqa: F401
from gea.utils.plotting import LossPlotter  # noqa: F401
from gea.utils.meters import ThroughputMeter  # noqa: F401
