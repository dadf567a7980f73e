"""Driver-contract regression tests for __graft_entry__ (the driver
compile-checks entry() single-chip and runs dryrun_multichip on a virtual
CPU mesh; these keep both paths from rotting between rounds)."""

import os
import subprocess
import sys

import jax
import pytest

import conftest


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


@pytest.mark.slow
def test_dryrun_multichip_driver_env():
    """Round-1 regression (VERDICT.md 'weak' #1): the driver invokes
    dryrun_multichip in the AMBIENT environment — no conftest CPU forcing,
    JAX_PLATFORMS possibly pinning a 1-chip platform, no
    xla_force_host_platform_device_count. dryrun_multichip must
    self-provision the virtual CPU mesh. Run it in a subprocess with the
    ambient env restored (conftest mutates os.environ, so children would
    otherwise inherit the test forcing and never exercise the fix)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    for key, ambient in (
        ("JAX_PLATFORMS", conftest.AMBIENT_JAX_PLATFORMS),
        ("XLA_FLAGS", conftest.AMBIENT_XLA_FLAGS),
    ):
        if ambient is None:
            env.pop(key, None)
        else:
            env[key] = ambient
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) ok" in proc.stdout
