"""Fused LIS residual-MLP kernel: one learned-input-space link

    z_out = z + W2 @ tprelu(W1 @ z + b1) + b2

in a single VMEM round-trip (BASELINE.json north star: 'fused Pallas
kernels for ... the LIS residual noise updates'; reference semantics:
the LIS modules of `g_lis/common.py`, SURVEY.md §3.5).

Why fuse: each link is two small matmuls (code_size is 128-512) with an
elementwise activation and a residual add between them. Left to XLA these
are separate HBM-visiting ops with tiny MXU tiles; the kernel keeps z, the
hidden activation, and both (already weight-normalized) weight matrices
resident in VMEM, hits the MXU twice back-to-back, and writes only the
final refined z. Weight normalization (w = g * v/||v||) happens outside in
XLA — it is O(C*H) per step and amortizes over the batch.

The custom VJP recomputes the (cheap) hidden activation in XLA for the
backward; matmul grads then run on the standard MXU path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_B = 512


def lis_residual_mlp_reference(
    z: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    slope: jnp.ndarray,
    trans: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
) -> jnp.ndarray:
    """Pure-jnp reference. z (B, C); w1 (C, H); w2 (H, C)."""
    h = z @ w1 + b1
    s = h - trans
    h = jnp.where(s >= 0, s, slope * s) + trans
    return z + h @ w2 + b2


def _kernel(z_ref, w1_ref, b1_ref, a_ref, t_ref, w2_ref, b2_ref, o_ref):
    z = z_ref[...]
    h = (
        jnp.dot(z, w1_ref[...], preferred_element_type=jnp.float32)
        + b1_ref[...]
    )
    s = h - t_ref[...]
    # max/min instead of a compare: v5e Mosaic lacks vector bf16 cmpf.
    h = (
        jnp.maximum(s, 0.0)
        + a_ref[...] * jnp.minimum(s, 0.0)
        + t_ref[...]
    )
    out = (
        jnp.dot(
            h.astype(z.dtype), w2_ref[...], preferred_element_type=jnp.float32
        )
        + b2_ref[...]
    )
    o_ref[...] = z + out.astype(z.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def lis_residual_mlp(
    z: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    slope: jnp.ndarray,
    trans: jnp.ndarray,
    w2: jnp.ndarray,
    b2: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    b, c = z.shape
    h_dim = w1.shape[1]
    rows = min(_TILE_B, b)
    grid = (pl.cdiv(b, rows),)
    dt = z.dtype
    vec = lambda v, n: v.reshape(1, n).astype(jnp.float32)  # noqa: E731
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, c), dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, h_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h_dim, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        z,
        w1.astype(dt),
        vec(b1, h_dim),
        vec(slope, h_dim),
        vec(trans, h_dim),
        w2.astype(dt),
        vec(b2, c),
    )


def _fwd(z, w1, b1, slope, trans, w2, b2, interpret):
    out = lis_residual_mlp(z, w1, b1, slope, trans, w2, b2, interpret)
    return out, (z, w1, b1, slope, trans, w2)


def _bwd(interpret, res, g):
    z, w1, b1, slope, trans, w2 = res
    dt = lambda ref: lambda x: x.astype(ref.dtype)  # noqa: E731
    gf = g.astype(jnp.float32)
    zf = z.astype(jnp.float32)
    w1f = w1.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    # Recompute the hidden activation (cheap: one small matmul).
    h_pre = zf @ w1f + b1
    s = h_pre - trans
    neg = s < 0
    h = jnp.where(neg, slope * s, s) + trans

    # out = z + h @ w2 + b2
    dh = gf @ w2f.T
    dw2 = h.T @ gf
    db2 = jnp.sum(gf, axis=0)

    fprime = jnp.where(neg, slope, jnp.ones_like(s))
    dh_pre = dh * fprime
    dslope = jnp.sum(jnp.where(neg, dh * s, jnp.zeros_like(s)), axis=0)
    dtrans = jnp.sum(dh * (1.0 - fprime), axis=0)

    dz = gf + dh_pre @ w1f.T
    dw1 = zf.T @ dh_pre
    db1 = jnp.sum(dh_pre, axis=0)
    return (
        dt(z)(dz),
        dt(w1)(dw1),
        db1,
        dslope,
        dtrans,
        dt(w2)(dw2),
        db2,
    )


lis_residual_mlp.defvjp(_fwd, _bwd)
