"""Input pipelines (reference C9: torchvision ImageFolder + transforms
inline in each trainer, SURVEY.md §2) rebuilt for TPU: host-side decode
workers feeding an on-device jitted preprocess (crop/resize/flip/normalize)
with double-buffered device prefetch, plus a synthetic mode for tests."""

from gea.data.pipeline import make_dataset  # noqa: F401
from gea.data.ondevice import preprocess_batch  # noqa: F401
