"""Training machinery (reference C5/C7/C8: the `train*.py` scripts'
alternating-step loops, SURVEY.md §3) — jitted G/D steps, R trainers,
train state and host loop utilities."""

from gea.train.losses import bce_with_logits  # noqa: F401
from gea.train.state import GANTrainState  # noqa: F401
