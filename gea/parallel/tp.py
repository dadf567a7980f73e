"""GSPMD tensor parallelism: dp x tp over a ('data', 'model') mesh.

The reference is a single-GPU 2017 codebase with no model-parallel story
(rebuild-new surface, SURVEY.md §2 'leave seams'). Round 3 turns the seam
into an implementation the TPU-native way: instead of hand-writing
collectives, the train step stays the SAME single-program function
(gea/train/steps.py built with axis_name=None) and is `jit`-compiled with
sharding annotations — parameters whose output-channel axis is wide enough
shard over the 'model' axis, the batch shards over 'data', and XLA's SPMD
partitioner inserts the all-gathers/reduce-scatters/all-reduces that ride
ICI. Semantics are exactly the unpartitioned program's (same RNG draws,
same updates), which is what makes the single-device equivalence test
possible (tests/test_tp.py).

Sharding rule: every state leaf (params, EMA shadow, Adam mu/nu — the
optimizer mirrors the param tree, so one shape-based rule covers it)
shards its LAST axis over 'model' when that axis is divisible by the
model-shard count and at least `min_width` wide. For this layer library
the last axis is the output-channel axis everywhere: Dense kernels are
(in, out), conv/conv-transpose kernels (kh, kw, in, out), weight-norm `g`
and biases (out,). Weight-norm stays communication-free under this
sharding: `g * v/||v||` reduces over (kh, kw, in), all unsharded.

Single-host scope: TP placement uses plain `jax.device_put`; combining
`--model_shards` with `--multihost` is rejected at config time (the DP
path covers pods).
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gea.parallel.mesh import DATA_AXIS, MODEL_AXIS


def leaf_spec(shape, model_shards: int, min_width: int) -> P:
    """PartitionSpec for one state leaf: last axis on 'model' if it tiles."""
    if (
        len(shape) >= 1
        and shape[-1] >= min_width
        and shape[-1] % model_shards == 0
    ):
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    return P()


def state_shardings(state: Any, mesh: Mesh, min_width: int = 64) -> Any:
    """NamedSharding pytree matching `state` (params/opt/EMA share shapes,
    so the one shape rule shards them consistently; scalars, RNG keys and
    narrow leaves replicate)."""
    model_shards = mesh.shape[MODEL_AXIS]

    def f(x):
        return NamedSharding(
            mesh, leaf_spec(np.shape(x), model_shards, min_width)
        )

    return jax.tree_util.tree_map(f, state)


def shard_state(state: Any, shardings: Any) -> Any:
    """Place the state pytree according to its sharding tree."""
    return jax.tree_util.tree_map(jax.device_put, state, shardings)


def sharded_param_fraction(shardings: Any) -> float:
    """Fraction of state leaves that actually shard over 'model' — used by
    callers to warn when a tiny model leaves TP idle."""
    leaves = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    if not leaves:
        return 0.0
    n_sharded = sum(1 for s in leaves if s.spec != P())
    return n_sharded / len(leaves)


def make_gspmd_input_step(
    step_fn: Callable[[Any, jax.Array, jax.Array], Tuple[Any, Any]],
    mesh: Mesh,
    shardings: Any,
    chunked: bool = False,
) -> Callable[[Any, jax.Array, jax.Array], Tuple[Any, Any]]:
    """Compile step(state, raw, rng) with dp x tp shardings.

    `raw` shards its batch dim over 'data' (axis 1 for chunked (K, B, ...)
    stacks), the rng key replicates, state in/out use `shardings` (donated,
    so in- and out-shardings must match for in-place buffer reuse), and
    metrics replicate. XLA GSPMD propagates the annotations through the
    whole step and places the collectives.
    """
    repl = NamedSharding(mesh, P())
    raw_sh = NamedSharding(
        mesh, P(None, DATA_AXIS) if chunked else P(DATA_AXIS)
    )
    return jax.jit(
        step_fn,
        in_shardings=(shardings, raw_sh, repl),
        out_shardings=(shardings, repl),
        donate_argnums=0,
    )
