"""Numerical-sanitizer mode (SURVEY.md §5 'Race detection / sanitizers':
the TPU-native analogue of the reference's nonexistent debugging story is
jit purity + checkify float checks).

`checked(fn)` instruments every float op in `fn` with NaN/Inf checks via
jax.experimental.checkify and raises at the FIRST offending op with its
source location — unlike the train loop's coarse non-finite-loss guard,
which only tells you the step went bad. Enabled per-run with
``--debug_checks``; `make_checked_parallel_input_step` extends it to the
shard_map DP path (checkify inside the per-device region) and
`make_checked_gspmd_input_step` to the --model_shards GSPMD path
(checkify composes with plain jit + sharding annotations, so the error
state is just one more replicated output). Chunked dispatch
(--steps_per_dispatch K) is covered too, but NOT by checkifying the
lax.scan chunk — that compiles pathologically (10+ minutes for a 2-step
toy config on CPU, measured round 4). Instead the dispatcher
(runner.make_step_dispatcher) drives the checked single-step program K
times from the host, so the first bad op is reported with the exact
step it occurred on. Costs roughly 2x step time plus per-step dispatch
— a debugging tool, not a production mode.
"""

from __future__ import annotations

from typing import Any, Callable

import jax


def checked(fn: Callable[..., Any], jit: bool = True) -> Callable[..., Any]:
    """Wrap `fn` so it raises checkify.JaxRuntimeError on NaN/Inf/div0 at
    the producing op."""
    from jax.experimental import checkify

    instrumented = checkify.checkify(fn, errors=checkify.float_checks)
    if jit:
        instrumented = jax.jit(instrumented)

    def wrapped(*args, **kw):
        err, out = instrumented(*args, **kw)
        checkify.check_error(err)
        return out

    return wrapped


def make_checked_gspmd_input_step(step_fn, mesh, shardings, chunked: bool = False):
    """``--debug_checks`` for the --model_shards GSPMD path (round 3;
    closes the 'sanitizer excludes --model_shards' debt).

    Unlike shard_map, GSPMD keeps the step a single logical program, so
    checkify composes directly: the instrumented function's error state
    becomes one extra (replicated) jit output and XLA's SPMD partitioner
    propagates the dp x tp shardings through it untouched. No per-device
    localization here — under GSPMD there is no per-device program to
    attribute to — but the producing op + source line still surface.

    Same signature/contract as tp.make_gspmd_input_step; no buffer
    donation (debug mode).
    """
    from jax.experimental import checkify
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gea.parallel.mesh import DATA_AXIS

    repl = NamedSharding(mesh, P())
    raw_sh = NamedSharding(
        mesh, P(None, DATA_AXIS) if chunked else P(DATA_AXIS)
    )
    instrumented = jax.jit(
        checkify.checkify(step_fn, errors=checkify.float_checks),
        in_shardings=(shardings, raw_sh, repl),
        out_shardings=(repl, (shardings, repl)),
    )

    def wrapped(state, raw, rng):
        err, out = instrumented(state, raw, rng)
        checkify.check_error(err)
        return out

    return wrapped


def make_checked_parallel_input_step(step_fn, mesh, chunked: bool = False):
    """``--debug_checks`` for the shard_map DP path (round 3; closes the
    'checkify does not compose with shard_map' debt).

    Wrapping checkify AROUND shard_map fails (its error plumbing cannot
    cross the shard_map boundary), so the instrumentation goes INSIDE:
    each device runs the checkified per-device step and ships its error
    state out as stacked leaves (the Error pytree's treedef — which
    embeds static source-location metadata — is captured at trace time).
    The host then re-raises the FIRST device's error, so a NaN born on
    one replica reports its producing op and device index, while the
    peers only see it arrive via psum — which localizes data-dependent
    blowups (a bad shard, device-unique noise) that the single-device
    mode cannot.

    Same signature/contract as dp.make_parallel_input_step: wraps
    step(state, raw, rng) with raw sharded over 'data'. No buffer
    donation (debug mode — ~2x step cost already).
    """
    import numpy as np
    from jax.experimental import checkify
    from jax.sharding import PartitionSpec as P

    from gea.parallel.dp import _shard_map
    from gea.parallel.mesh import DATA_AXIS

    box = {}

    def local(state, raw, rng):
        err, out = checkify.checkify(
            step_fn, errors=checkify.float_checks
        )(state, raw, rng)
        leaves, treedef = jax.tree_util.tree_flatten(err)
        box["treedef"] = treedef
        # () leaves -> (1,) so the 'data' out-spec stacks one per device.
        return tuple(leaf[None] for leaf in leaves), out

    raw_spec = P(None, DATA_AXIS) if chunked else P(DATA_AXIS)
    mapped = jax.jit(
        _shard_map(
            local,
            mesh,
            in_specs=(P(), raw_spec, P()),
            out_specs=(P(DATA_AXIS), (P(), P())),
        )
    )

    def wrapped(state, raw, rng):
        err_leaves, out = mapped(state, raw, rng)
        host = [np.asarray(leaf) for leaf in err_leaves]
        n_dev = host[0].shape[0] if host else 0
        failures = []
        for i in range(n_dev):
            err = jax.tree_util.tree_unflatten(
                box["treedef"], [leaf[i] for leaf in host]
            )
            try:
                checkify.check_error(err)
            except Exception as e:  # checkify.JaxRuntimeError
                failures.append((i, e))
        if failures:
            # A NaN spreads to every replica through the gradient psum, so
            # most devices report the collective as their first bad op.
            # The SOURCE is the device whose first error is NOT a
            # collective — prefer it for the re-raise.
            collectives = ("psum", "pmean", "all_gather", "all_reduce")
            i, e = next(
                (
                    f
                    for f in failures
                    if not any(c in str(f[1]) for c in collectives)
                ),
                failures[0],
            )
            raise type(e)(
                f"[debug_checks] error on {len(failures)}/{n_dev} devices; "
                f"source device {i}: {e}"
            ) from e
        return out

    return wrapped
