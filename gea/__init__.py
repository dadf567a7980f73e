"""gea — TPU-native rebuild of the `aleju/gan-error-avoidance` capability set.

A from-scratch JAX / XLA / Pallas framework implementing the three
error-avoidance techniques of "Learning to Avoid Errors in GANs by
Manipulating Input Spaces" (arXiv:1707.00768):

* **G-LIS** — a generator with a chain of learned-input-space (LIS) residual
  noise-refinement modules (reference: ``g_lis/``).
* **R-iterative** — a reverser network trained jointly with G/D and applied
  iteratively at inference (reference: ``r_iterative/``).
* **R-separate** — a reverser trained post-hoc against a frozen generator
  (reference: ``r_separate/``).

Layout (reference layer map in SURVEY.md §1 → TPU-native layers):

=============  ==========================================================
``gea.config``  frozen config dataclasses + argparse shims (reference CLI)
``gea.ops``     NN building blocks (weight norm, TPReLU, torch-compatible
                conv/conv-transpose) + Pallas kernels (``gea.ops.pallas``)
``gea.models``  GeneratorLIS / Discriminator / Reverter
``gea.data``    CelebA-style folder pipeline, on-device preprocessing,
                synthetic data for tests
``gea.train``   jitted alternating G/D train steps, R trainers
``gea.parallel`` device mesh + shard_map data parallelism (psum over ICI)
``gea.utils``   checkpointing (orbax), sample grids, loss plots, meters
``gea.cli``     entry points mirroring the reference scripts
=============  ==========================================================
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("GEA_PLATFORM"):
    # Deployment escape hatch: some managed runtimes pin JAX to their
    # accelerator plugin from sitecustomize AFTER the JAX_PLATFORMS env
    # var is read (observed with the axon TPU tunnel), so the env var
    # alone cannot force a CLI onto CPU. GEA_PLATFORM=cpu re-applies the
    # platform choice through the live config at package import, before
    # any backend is used. (XLA_FLAGS such as
    # --xla_force_host_platform_device_count still apply: the CPU client
    # initializes lazily, after this runs.)
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["GEA_PLATFORM"])

if _os.environ.get("GEA_COMPILE_CACHE"):
    # Persistent XLA compilation cache shared by every gea process
    # (trainers, samplers, eval CLIs, bench.py): a production workflow
    # touches the same programs from several processes, and each remote
    # TPU compile costs 20-40s on a tunneled runtime. Keyed by HLO +
    # compiler version, so it is always safe to share/keep. The low
    # min-compile-time floor also caches the small sampler/eval programs.
    import jax as _jax

    _cache_dir = _os.path.abspath(_os.environ["GEA_COMPILE_CACHE"])
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(_os.environ.get("GEA_COMPILE_CACHE_MIN_SECS", "0.5")),
    )
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
