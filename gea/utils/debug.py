"""Numerical-sanitizer mode (SURVEY.md §5 'Race detection / sanitizers':
the TPU-native analogue of the reference's nonexistent debugging story is
jit purity + checkify float checks).

`checked(fn)` instruments every float op in `fn` with NaN/Inf checks via
jax.experimental.checkify and raises at the FIRST offending op with its
source location — unlike the train loop's coarse non-finite-loss guard,
which only tells you the step went bad. Enabled per-run with
``--debug_checks`` (single-device; checkify's error plumbing does not
compose with shard_map here). Costs roughly 2x step time — a debugging
tool, not a production mode.
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
