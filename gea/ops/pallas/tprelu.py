"""Fused TPReLU kernel: y = PReLU_a(x - b) + b in one VPU pass.

The reference applies TPReLU as a separate op after each (weight-normalized)
conv (`common/model.py`-style TPReLU, SURVEY.md §2 C1). XLA usually fuses
such elementwise tails into the conv epilogue on its own; this kernel makes
the fusion explicit and guaranteed — one HBM read, one HBM write, no
intermediate buffer — and is benchmarked against the XLA path in
benchmarks/kernel_bench.py (SURVEY.md §7 hard part #4: 'benchmark vs
pure-XLA each time').

The custom VJP keeps the backward on the (cheap, fully-fused) XLA path:
the elementwise gradient re-derives the sign mask from saved inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_ROWS = 1024


def fused_tprelu_reference(
    x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """Pure-jnp reference: x (..., C), a (C,), b (C,)."""
    s = x - b
    return jnp.where(s >= 0, s, a * s) + b


def _kernel(x_ref, a_ref, b_ref, o_ref):
    # max/min formulation instead of where(s >= 0, ...): Mosaic on v5e has
    # no vector bf16 compare, but bf16 max/min lower fine.
    x = x_ref[...]
    a = a_ref[...]
    b = b_ref[...]
    s = x - b
    zero = jnp.zeros((), x.dtype)
    o_ref[...] = jnp.maximum(s, zero) + a * jnp.minimum(s, zero) + b


def _forward_2d(x2: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, interpret: bool):
    m, c = x2.shape
    rows = min(_TILE_ROWS, m)
    grid = (pl.cdiv(m, rows),)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((m, c), x2.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (rows, c), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x2, a.reshape(1, c).astype(x2.dtype), b.reshape(1, c).astype(x2.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_tprelu(
    x: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """TPReLU over the trailing channel axis of x; a/b are per-channel."""
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    return _forward_2d(x2, a, b, interpret).reshape(x.shape)


def _fwd(x, a, b, interpret):
    return fused_tprelu(x, a, b, interpret), (x, a, b)


def _bwd(interpret, res, g):
    x, a, b = res
    s = x - b.astype(x.dtype)
    neg = s < 0
    fprime = jnp.where(neg, a.astype(x.dtype), jnp.ones_like(x))
    dx = g * fprime
    reduce_axes = tuple(range(x.ndim - 1))
    da = jnp.sum(
        jnp.where(neg, g * s, jnp.zeros_like(x)), axis=reduce_axes
    ).astype(a.dtype)
    db = jnp.sum(g * (1.0 - fprime), axis=reduce_axes).astype(b.dtype)
    return dx, da, db


fused_tprelu.defvjp(_fwd, _bwd)
