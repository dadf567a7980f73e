"""NN building blocks (reference C1: `common/model.py`-style weight-norm
layer library) rebuilt as Flax modules over TPU-friendly NHWC/HWIO layouts,
plus Pallas kernels in `gea.ops.pallas`."""

from gea.ops.layers import (  # noqa: F401
    Conv,
    ConvTranspose,
    Dense,
    TPReLU,
    conv2d_torch,
    conv_transpose2d_torch,
    normalize_weight,
)
