"""Test environment: force JAX onto CPU with 8 virtual devices so the
data-parallel (mesh/shard_map/psum) paths are exercised without TPU hardware
(SURVEY.md §4 'Distributed without a cluster'). Must run before jax imports."""

import os

# Force CPU even when the ambient environment selects a TPU platform
# (JAX_PLATFORMS=axon): tests need the 8-virtual-device CPU mesh, and must
# not hold the single real TPU chip. Override with GEA_TEST_PLATFORM=tpu to
# run the suite on hardware.
# Preserve the ambient (pre-conftest) env so driver-simulation tests can
# reproduce the environment __graft_entry__ actually runs under.
AMBIENT_JAX_PLATFORMS = os.environ.get("JAX_PLATFORMS")
AMBIENT_XLA_FLAGS = os.environ.get("XLA_FLAGS")

os.environ["JAX_PLATFORMS"] = os.environ.get("GEA_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize imports jax before conftest runs, so the
# env var alone is too late — update the live config too.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
if os.environ["JAX_PLATFORMS"] == "cpu":
    # Deterministic f32 matmuls for the torch-parity tolerances. CPU-only:
    # on the tunneled TPU (GEA_TEST_PLATFORM=axon) precision=highest blows
    # the step compile up from ~30s to >400s (3-pass emulation), wedging
    # any tpu-marked test.
    jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """tpu-marked tests need the real chip (GEA_TEST_PLATFORM=tpu)."""
    if os.environ["JAX_PLATFORMS"] not in ("cpu",):
        return
    skip = pytest.mark.skip(reason="needs real TPU; set GEA_TEST_PLATFORM")
    for item in items:
        if "tpu" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
