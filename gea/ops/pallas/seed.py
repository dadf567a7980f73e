"""Fused seed-resolution generator forward (round 5, VERDICT r4 order #7).

The generator's component micro-profile pins its FORWARD as the weakest
unit (~60 TFLOPS vs ~96-101 for the grads, benchmarks/KERNELS.md), and
the weakness concentrates in the seed-resolution layers: the projection
``z -> s0*s0*c0`` plus the first ConvTranspose(4,2,1) operate on 5x5/4x4
spatial maps whose tiles XLA schedules poorly (dilated-conv lowering over
a tiny spatial extent). This kernel fuses the whole seed segment

    h   = tprelu(z @ Wp + bp)          # projection + activation
    out = conv_transpose2d(h, Wc, stride=2, pad=1) + bc

into ONE Pallas program: h never visits HBM, and the transposed conv is
computed as 16 dense (TB*s0^2, c0) @ (c0, c1) matmuls — the output-parity
(subpixel) decomposition, which in XLA lost to pad/slice/interleave
overhead (KERNELS.md round-2) but inside VMEM costs only register
shuffles. Weight normalization stays outside in XLA (O(C*H) per step).

Derivation of the phase decomposition (same algebra as
gea.ops.layers.conv_transpose2d_subpixel): with Wf the spatially flipped
kernel and hp = pad(h, 1),

    out[2i+du, 2j+dv] = sum_{a,b in {0,1}} hp[i+du+a, j+dv+b] @ Wf[du+2a, dv+2b]

so each of the 4 output phases is a 2x2-tap dense conv, i.e. 4 shifted
slices of hp matmul'd against 4 (c0, c1) tap matrices and accumulated.

The custom VJP runs the backward through the XLA reference composite
(recomputing h, like remat): the hypothesis under test is the FORWARD
(the profiled weak unit); the grads already run at ~96-101 TFLOPS on
XLA's standard path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gea.ops.layers import conv_transpose2d_torch

_TILE_B = 32


def fused_seed_reference(
    z: jnp.ndarray,
    wp: jnp.ndarray,
    bp: jnp.ndarray,
    slope: jnp.ndarray,
    trans: jnp.ndarray,
    wc: jnp.ndarray,
    bc: jnp.ndarray,
    s0: int,
) -> jnp.ndarray:
    """Pure-XLA reference: exactly the model's project -> TPReLU -> up1.

    z (B, C); wp (C, s0*s0*c0); bp (s0*s0*c0,); slope/trans (c0,)
    per-channel TPReLU params; wc (4, 4, c0, c1) HWIO; bc (c1,).
    Returns (B, 2*s0, 2*s0, c1).
    """
    c0 = wc.shape[2]
    h = z @ wp + bp
    h = h.reshape(h.shape[0], s0, s0, c0)
    s = h - trans
    h = jnp.where(s >= 0, s, slope * s) + trans
    y = conv_transpose2d_torch(h, wc, stride=2, padding=1)
    return y + bc


def _kernel(z_ref, wp_ref, bp_ref, a_ref, t_ref, wf_ref, bc_ref, o_ref):
    tb = z_ref.shape[0]
    c0, c1 = wf_ref.shape[2], wf_ref.shape[3]
    # Infer s0 from the output block: (TB, 2*s0, 2*s0, c1).
    s0 = o_ref.shape[1] // 2

    # ---- projection + TPReLU, resident in VMEM --------------------------
    h = (
        jnp.dot(z_ref[...], wp_ref[...], preferred_element_type=jnp.float32)
        + bp_ref[...]
    )
    h = h.reshape(tb, s0, s0, c0)
    s = h - t_ref[...]
    # max/min instead of a compare: v5e Mosaic lacks vector bf16 cmpf
    # (same form as the LIS kernel).
    h = jnp.maximum(s, 0.0) + a_ref[...] * jnp.minimum(s, 0.0) + t_ref[...]
    h = h.astype(z_ref.dtype)
    hp = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # ---- transposed conv as 4 phases x 4 dense taps ---------------------
    # wf_ref holds the PRE-FLIPPED kernel (flip done outside in XLA).
    rows = tb * s0 * s0
    phases = []
    for du in (0, 1):
        for dv in (0, 1):
            acc = jnp.zeros((rows, c1), jnp.float32)
            for a in (0, 1):
                for b in (0, 1):
                    x_sl = hp[
                        :, du + a : du + a + s0, dv + b : dv + b + s0, :
                    ].reshape(rows, c0)
                    acc = acc + jnp.dot(
                        x_sl,
                        wf_ref[du + 2 * a, dv + 2 * b],
                        preferred_element_type=jnp.float32,
                    )
            phases.append(acc + bc_ref[...])
    # Interleave phases: out[2i+du, 2j+dv] = phase[du][dv][i, j].
    y = jnp.stack(phases, axis=-2)  # (rows, 4, c1), phase-major (du, dv)
    y = y.reshape(tb, s0, s0, 2, 2, c1)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (tb, s0, 2, s0, 2, c1)
    o_ref[...] = y.reshape(tb, 2 * s0, 2 * s0, c1).astype(o_ref.dtype)


def _forward(
    z, wp, bp, slope, trans, wc, bc, s0: int, interpret: bool = False
):
    batch, code = z.shape
    c0, c1 = wc.shape[2], wc.shape[3]
    tile = min(_TILE_B, batch)
    padded = pl.cdiv(batch, tile) * tile
    if padded != batch:
        z = jnp.pad(z, ((0, padded - batch), (0, 0)))
    dtype = z.dtype
    grid = (padded // tile,)
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((padded, 2 * s0, 2 * s0, c1), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (tile, code), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (code, s0 * s0 * c0), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, s0 * s0 * c0), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, 1, c0), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, c0), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 4, c0, c1), lambda i: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, c1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, 2 * s0, 2 * s0, c1),
            lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * padded * code * s0 * s0 * c0
            + 2 * padded * (2 * s0) ** 2 * 4 * c0 * c1,
            bytes_accessed=(
                padded * code * 2
                + code * s0 * s0 * c0 * 2
                + 16 * c0 * c1 * 2
                + padded * (2 * s0) ** 2 * c1 * 2
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        z,
        wp.astype(dtype),
        bp.reshape(1, -1).astype(jnp.float32),
        slope.reshape(1, 1, 1, -1).astype(jnp.float32),
        trans.reshape(1, 1, 1, -1).astype(jnp.float32),
        wc[::-1, ::-1, :, :].astype(dtype),  # pre-flip in XLA
        bc.reshape(1, -1).astype(jnp.float32),
    )
    return out[:batch]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def fused_seed(
    z, wp, bp, slope, trans, wc, bc, s0: int, interpret: bool = False
):
    """Fused project+TPReLU+ConvT(4,2,1) seed segment (see module doc)."""
    return _forward(z, wp, bp, slope, trans, wc, bc, s0, interpret)


def _fwd(z, wp, bp, slope, trans, wc, bc, s0, interpret):
    out = _forward(z, wp, bp, slope, trans, wc, bc, s0, interpret)
    return out, (z, wp, bp, slope, trans, wc, bc)


def _bwd(s0, interpret, res, g):
    z, wp, bp, slope, trans, wc, bc = res
    # Backward through the XLA reference composite (h recomputed, remat
    # style): grads take the standard ~96-101 TFLOPS conv paths.
    out_ref, vjp = jax.vjp(
        lambda *args: fused_seed_reference(*args, s0), z, wp, bp, slope,
        trans, wc, bc,
    )
    # The bf16 training step casts the primal downstream, so the cotangent
    # can arrive in a narrower dtype than the reference forward's output;
    # jax.vjp requires an exact JAX-type match.
    return vjp(g.astype(out_ref.dtype))


fused_seed.defvjp(_fwd, _bwd)


def seed_params_fit_vmem(
    code: int, s0: int, c0: int, c1: int, bytes_per_el: int = 2
) -> bool:
    """Static feasibility check: resident weights + a TB=32 activation set
    must fit the ~16 MB v5e VMEM with headroom for double buffering."""
    weights = code * s0 * s0 * c0 + 16 * c0 * c1
    tile_act = (
        _TILE_B * s0 * s0 * c0 * 3  # h + padded copy (+ slack)
        + _TILE_B * (2 * s0) ** 2 * c1 * 3  # phase accs (f32) + out
    )
    return (weights + tile_act) * bytes_per_el < 14 * 1024 * 1024
