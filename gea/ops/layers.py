"""Building-block layers (reference C1, SURVEY.md §2).

The reference's layer library (`common/model.py`-style, adapted from
stormraiser/GAN-weight-norm) provides weight-normalized Linear / Conv2d /
ConvTranspose2d and the TPReLU activation. This module rebuilds those
semantics TPU-first:

* **Layout**: NHWC activations, HWIO kernels — the layouts XLA:TPU tiles
  directly onto the MXU without transposes (the reference's NCHW is a GPU
  convention).
* **Conv / ConvTranspose semantics**: exact PyTorch output-size and padding
  rules (SURVEY.md §7 "hard part #1"), pinned by golden parity tests vs
  torch-CPU in tests/test_torch_parity.py.
* **Weight norm**: w = g * v / ||v||, norm per *output channel* (torch
  `weight_norm(dim=0)` semantics for Linear/Conv; output-channel norm for
  ConvTranspose as in the reference's custom layers).
* **TPReLU** ("translated PReLU"): y = PReLU_a(x - b) + b with learnable
  per-channel slope `a` and bias `b`.
* **Mixed precision**: params live in float32; compute runs in a configurable
  dtype (bfloat16 on TPU) — weights are normalized in float32 then cast, so
  the normalization itself never loses precision.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any
Initializer = Callable[..., jnp.ndarray]

# --------------------------------------------------------------------------
# Functional conv primitives with PyTorch semantics (NHWC / HWIO)
# --------------------------------------------------------------------------

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d_torch(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """``torch.nn.functional.conv2d`` on NHWC input / HWIO kernel.

    out = floor((in + 2*padding - kernel) / stride) + 1
    """
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMENSION_NUMBERS,
    )


def conv_transpose2d_torch(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
    output_padding: int = 0,
) -> jnp.ndarray:
    """``torch.nn.functional.conv_transpose2d`` on NHWC input / HWIO kernel.

    The kernel is stored as (kh, kw, in_ch, out_ch); PyTorch stores
    ConvTranspose2d weights as (in, out, kh, kw) — same association, HWIO
    layout. Output size matches torch exactly:

        out = (in - 1) * stride - 2 * padding + kernel + output_padding

    Implementation: a transposed conv is a regular conv over the
    input dilated by `stride`, against the spatially-flipped kernel, with
    `kernel - 1 - padding` edge padding. XLA lowers this to the same MXU
    path as a forward conv (lhs_dilation), so no explicit upsampling buffer
    is materialized in HBM.
    """
    kh, kw = w.shape[0], w.shape[1]
    pad_h = (kh - 1 - padding, kh - 1 - padding + output_padding)
    pad_w = (kw - 1 - padding, kw - 1 - padding + output_padding)
    return lax.conv_general_dilated(
        x,
        w[::-1, ::-1, :, :],
        window_strides=(1, 1),
        padding=(pad_h, pad_w),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMENSION_NUMBERS,
    )


def conv_transpose2d_subpixel(
    x: jnp.ndarray,
    w: jnp.ndarray,
) -> jnp.ndarray:
    """ConvTranspose2d(kernel=4, stride=2, padding=1) as a dense stride-1
    conv + pixel interleave — numerically identical to
    ``conv_transpose2d_torch(x, w, 2, 1)`` but ~4x fewer real FLOPs.

    Why: XLA lowers a stride-2 transposed conv via input dilation, so the
    MXU multiplies a 75%-zeros operand. Decomposing by output-pixel parity
    gives each of the 4 output phases its own 2x2 tap subset of the 4x4
    kernel; one k=2 stride-1 conv with 4*C_out channels computes all
    phases densely, and a reshape interleaves them. This is the
    transposed-conv analogue of the sub-pixel/pixel-shuffle trick and is
    the main Pallas/XLA-level optimization of the generator hot path
    (SURVEY.md §7 hard part #4: fuse/optimize where the FLOPs are).

    Derivation: y[2i+du, 2j+dv] = sum_{a,b in taps(du,dv)}
    xpad[i+du + ...] Wf[a, b] with Wf the spatially flipped kernel;
    parity du selects taps a in {du, du+2}, ditto dv.
    """
    kh, kw, cin, cout = w.shape
    if (kh, kw) != (4, 4):
        raise ValueError("subpixel path requires a 4x4 kernel")
    wf = w[::-1, ::-1, :, :]
    # Phase-major weight: (2, 2, cin, 4*cout), k=2 taps per phase.
    taps = []
    for du in (0, 1):
        for dv in (0, 1):
            taps.append(wf[du::2, dv::2, :, :])  # (2, 2, cin, cout)
    wsub = jnp.concatenate(taps, axis=-1)  # (2, 2, cin, 4*cout)

    b, h, wdt, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y_all = lax.conv_general_dilated(
        xp,
        wsub,
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=_DIMENSION_NUMBERS,
    )  # (b, h+1, w+1, 4*cout)
    p00 = y_all[:, 0:h, 0:wdt, 0 * cout : 1 * cout]
    p01 = y_all[:, 0:h, 1 : wdt + 1, 1 * cout : 2 * cout]
    p10 = y_all[:, 1 : h + 1, 0:wdt, 2 * cout : 3 * cout]
    p11 = y_all[:, 1 : h + 1, 1 : wdt + 1, 3 * cout : 4 * cout]
    y = jnp.stack([p00, p01, p10, p11], axis=-2)  # (b, h, w, 4, cout)
    y = y.reshape(b, h, wdt, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (b, h, 2, w, 2, cout)
    return y.reshape(b, 2 * h, 2 * wdt, cout)


def normalize_weight(
    v: jnp.ndarray, g: jnp.ndarray, reduce_axes: Sequence[int]
) -> jnp.ndarray:
    """w = g * v / ||v||  with the norm over `reduce_axes` (all axes except
    the output-channel axis), computed in float32 regardless of v's dtype."""
    v32 = v.astype(jnp.float32)
    norm = jnp.sqrt(
        jnp.sum(jnp.square(v32), axis=tuple(reduce_axes), keepdims=True)
        + 1e-12
    )
    return (v32 / norm) * g.astype(jnp.float32)


# --------------------------------------------------------------------------
# Flax modules
# --------------------------------------------------------------------------


class Dense(nn.Module):
    """Linear layer with optional weight normalization.

    weight_norm=True reproduces the reference's WeightNormalizedLinear
    (`common/model.py`, approximate — see SURVEY.md §0 provenance note):
    w = g * v/||v|| with per-output-feature norm.
    """

    features: int
    use_bias: bool = True
    weight_norm: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        """return_params=True creates the SAME params (names, shapes,
        init) but returns the normalized (w, b) instead of applying them
        — the hook fused composite kernels (gea.ops.pallas.seed) use to
        consume module-owned weights while keeping checkpoints
        bit-interchangeable between lowerings. `x` then only supplies the
        input width (pass a dummy)."""
        in_features = x.shape[-1]
        v = self.param(
            "kernel", self.kernel_init, (in_features, self.features), jnp.float32
        )
        if self.weight_norm:
            g = self.param(
                "scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            w = normalize_weight(v, g, reduce_axes=(0,))
        else:
            w = v
        b = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        if return_params:
            return w, b
        y = jnp.dot(
            x.astype(self.dtype),
            w.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        if b is not None:
            y = y + b.astype(self.dtype)
        return y


class Conv(nn.Module):
    """Strided conv with PyTorch padding semantics + optional weight norm.

    Mirrors the reference's WeightNormalizedConv2d used in the
    discriminator's downsampling stack (k=4, s=2, p=1 halves resolution).
    """

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        shape = (self.kernel_size, self.kernel_size, in_ch, self.features)
        v = self.param("kernel", self.kernel_init, shape, jnp.float32)
        if self.weight_norm:
            g = self.param(
                "scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            w = normalize_weight(v, g, reduce_axes=(0, 1, 2))
        else:
            w = v
        y = conv2d_torch(
            x.astype(self.dtype),
            w.astype(self.dtype),
            stride=self.stride,
            padding=self.padding,
        )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(self.dtype)
        return y


class ConvTranspose(nn.Module):
    """Transposed conv with PyTorch output-size semantics + optional weight
    norm. Mirrors the reference's WeightNormalizedConvTranspose2d used in the
    generator's upsampling stack (k=4, s=2, p=1 doubles resolution)."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    padding: int = 1
    output_padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    # Optionally lower the (4,2,1) upsample through the dense subpixel
    # decomposition (conv_transpose2d_subpixel). Measured on v5e: XLA's
    # native transposed-conv lowering already avoids the dilated-zero
    # waste (27.0ms/step vs 32.6ms with the decomposition at batch 256),
    # so this stays off by default; kept as a validated option for
    # backends where the dilated path is naive.
    subpixel: bool = False
    dtype: Dtype = jnp.float32
    kernel_init: Initializer = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        in_ch = x.shape[-1]
        # HWIO: (kh, kw, in, out) — matches torch's (in, out, kh, kw) pairing.
        shape = (self.kernel_size, self.kernel_size, in_ch, self.features)
        v = self.param("kernel", self.kernel_init, shape, jnp.float32)
        if self.weight_norm:
            g = self.param(
                "scale", nn.initializers.ones, (self.features,), jnp.float32
            )
            w = normalize_weight(v, g, reduce_axes=(0, 1, 2))
        else:
            w = v
        if return_params:
            # Same param-tree contract as Dense(return_params=True).
            b = (
                self.param(
                    "bias", nn.initializers.zeros, (self.features,),
                    jnp.float32,
                )
                if self.use_bias
                else None
            )
            return w, b
        if (
            self.subpixel
            and (self.kernel_size, self.stride, self.padding, self.output_padding)
            == (4, 2, 1, 0)
        ):
            y = conv_transpose2d_subpixel(
                x.astype(self.dtype), w.astype(self.dtype)
            )
        else:
            y = conv_transpose2d_torch(
                x.astype(self.dtype),
                w.astype(self.dtype),
                stride=self.stride,
                padding=self.padding,
                output_padding=self.output_padding,
            )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(self.dtype)
        return y


class TPReLU(nn.Module):
    """Translated PReLU (reference C1): y = PReLU_a(x - b) + b.

    `a` (slope for the negative part) and `b` (translation) are learnable
    per-channel. With a=0.25, b=0 at init this starts as a standard PReLU.
    A pure VPU op — XLA fuses it into the preceding conv's epilogue; the
    Pallas fused variant lives in gea.ops.pallas.
    """

    negative_slope_init: float = 0.25
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_params: bool = False):
        ch = x.shape[-1]
        a = self.param(
            "slope",
            nn.initializers.constant(self.negative_slope_init),
            (ch,),
            jnp.float32,
        )
        b = self.param("translation", nn.initializers.zeros, (ch,), jnp.float32)
        if return_params:
            return a, b
        x = x.astype(self.dtype)
        if self.use_pallas:
            from gea.ops.pallas import pallas_available
            from gea.ops.pallas.tprelu import fused_tprelu

            if pallas_available():
                return fused_tprelu(x, a, b)
        a = a.astype(self.dtype)
        b = b.astype(self.dtype)
        shifted = x - b
        return jnp.where(shifted >= 0, shifted, a * shifted) + b


class NormAct(nn.Module):
    """Norm-scheme-selectable post-conv block (reference `--norm
    weight|batch|none`, SURVEY.md §0):

    * ``weight``: the conv itself was weight-normalized; activation TPReLU.
    * ``batch``:  BatchNorm + LeakyReLU(0.2) (DCGAN convention).
    * ``none``:   LeakyReLU(0.2) only.
    """

    norm: str
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        return_params: bool = False,
    ):
        if return_params:
            # (slope, translation) of the activation as a TPReLU-formula
            # pair — fused kernels apply max(s,0)+a*min(s,0)+b. Valid for
            # the weight (learned TPReLU) and none (LeakyReLU == TPReLU
            # with a=0.2, b=0) schemes; batch norm cannot be folded this
            # way and callers must not request it.
            if self.norm == "batch":
                raise ValueError("return_params unsupported for norm=batch")
            if self.norm == "weight":
                return TPReLU(dtype=self.dtype, use_pallas=self.use_pallas)(
                    x, return_params=True
                )
            ch = x.shape[-1]
            return (
                jnp.full((ch,), 0.2, jnp.float32),
                jnp.zeros((ch,), jnp.float32),
            )
        if self.norm == "batch":
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
            )(x)
            return nn.leaky_relu(x, negative_slope=0.2)
        if self.norm == "weight":
            return TPReLU(dtype=self.dtype, use_pallas=self.use_pallas)(x)
        return nn.leaky_relu(x, negative_slope=0.2)
