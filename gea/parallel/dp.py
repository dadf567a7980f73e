"""shard_map data-parallel wrapper for the train steps.

The step function (gea/train/steps.py) is built with `axis_name="data"`:
inside, gradients and metrics are `lax.pmean`'d over the axis — XLA lowers
that to a psum all-reduce over ICI. Here we wrap it in shard_map over the
1-axis mesh: the state pytree is replicated (PartitionSpec()) and the real
batch is sharded on its leading dim (PartitionSpec("data")). The wrapped
step is jitted with the state donated, so parameter/optimizer buffers
update in place in HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gea.parallel.mesh import DATA_AXIS


def _shard_map(fn, mesh, in_specs, out_specs):
    """jax.shard_map across jax versions (experimental fallback)."""
    try:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:
        pass
    try:
        return jax.shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )
    except (TypeError, AttributeError):
        from jax.experimental.shard_map import shard_map as sm

        return sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)


def make_parallel_step(
    step_fn: Callable[[Any, jax.Array], Tuple[Any, Any]],
    mesh: Mesh,
) -> Callable[[Any, jax.Array], Tuple[Any, Any]]:
    """step(state, global_batch) -> (state, metrics), compiled over mesh."""
    mapped = _shard_map(
        step_fn,
        mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped, donate_argnums=0)


def make_parallel_input_step(
    step_fn: Callable[[Any, jax.Array, jax.Array], Tuple[Any, Any]],
    mesh: Mesh,
    chunked: bool = False,
) -> Callable[[Any, jax.Array, jax.Array], Tuple[Any, Any]]:
    """Like make_parallel_step but for fused-input steps
    step(state, raw_batch, rng): raw sharded over the data axis, the rng
    key replicated (the step folds in the device index itself). With
    chunked=True the raw input is a K-step stack (K, B, ...) — the batch
    dim is axis 1, so the data axis shards axis 1 and the scan inside the
    step walks axis 0 locally on every device."""
    raw_spec = P(None, DATA_AXIS) if chunked else P(DATA_AXIS)
    mapped = _shard_map(
        step_fn,
        mesh,
        in_specs=(P(), raw_spec, P()),
        out_specs=(P(), P()),
    )
    return jax.jit(mapped, donate_argnums=0)


def batch_sharding(mesh: Mesh, chunked: bool = False) -> NamedSharding:
    """Leading-dim batch sharding; chunked stacks shard axis 1 (K, B, ...)."""
    return NamedSharding(mesh, P(None, DATA_AXIS) if chunked else P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: np.ndarray, mesh: Mesh) -> jax.Array:
    """Place a host batch with its leading dim sharded over the data axis.
    Multihost: `batch` is this process's local slab of the global batch."""
    sh = batch_sharding(mesh)
    if not sh.is_fully_addressable:
        return jax.make_array_from_process_local_data(sh, np.asarray(batch))
    return jax.device_put(batch, sh)


def local_copy(tree: Any) -> Any:
    """Host-local numpy copy of a fully-replicated global pytree.

    Multihost vis/eval runs on the lead process only, so it cannot feed
    global (non-fully-addressable) arrays into a single-process jit;
    fully-replicated arrays can be fetched host-side from any process and
    re-placed on local devices by the computation."""

    def f(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # Read THIS process's replica shard (full value for replicated
            # arrays). jax.device_get on a global array would open a
            # cross-process transfer context, which hangs when only the
            # lead process is fetching (vis/fid/checkpoint are lead-only).
            return np.asarray(x.addressable_data(0))
        return x

    return jax.tree_util.tree_map(f, tree)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Replicate the state pytree over the mesh. Multihost: every process
    holds an identical host copy (same init seed / same restored
    checkpoint), assembled into fully-replicated global arrays."""
    sh = replicated_sharding(mesh)
    if not sh.is_fully_addressable:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(jax.device_get(x))
            ),
            state,
        )
    return jax.device_put(state, sh)
