"""Driver-contract regression tests for __graft_entry__ (the driver
compile-checks entry() single-chip and runs dryrun_multichip on a virtual
CPU mesh; these keep both paths from rotting between rounds)."""

import jax
import pytest


@pytest.mark.slow
def test_entry_compiles_and_runs():
    from __graft_entry__ import entry

    fn, args = entry()
    images, logits = jax.jit(fn)(*args)
    assert images.shape == (4, 8, 80, 80, 3)
    assert logits.shape == (4, 8)


@pytest.mark.slow
def test_dryrun_multichip_two_devices():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(2)
