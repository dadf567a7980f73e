"""Pallas TPU kernels (BASELINE.json north star: "fused Pallas kernels for
the conv/BN/LeakyReLU blocks and the LIS residual noise updates").

The reference has NO native components (SURVEY.md §2: Python 100%); the
TPU-native compiled layer here is XLA jit graphs + these kernels:

* ``lis_residual_mlp`` — the full LIS noise-refinement link
  (dense -> TPReLU -> dense -> residual add) in one VMEM round-trip.
* ``fused_tprelu`` — the TPReLU activation as a single VPU pass, used as
  the conv-epilogue fusion.

Every kernel has a pure-jnp reference implementation, a custom VJP (so the
training step can differentiate through it), and interpret-mode CPU tests
(tests/test_pallas.py). Model code calls these through ``maybe_*`` wrappers
that fall back to the jnp path off-TPU.
"""

from gea.ops.pallas.lis import (  # noqa: F401
    lis_residual_mlp,
    lis_residual_mlp_reference,
)
from gea.ops.pallas.tprelu import (  # noqa: F401
    fused_tprelu,
    fused_tprelu_reference,
)


def pallas_available() -> bool:
    """True when compiled Pallas kernels can run (TPU backend)."""
    import jax

    return jax.default_backend() == "tpu"
