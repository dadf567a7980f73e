"""Data parallelism over a jax.sharding.Mesh (SURVEY.md §2 'Parallelism
strategies': the reference has NONE of this — single-process single-GPU —
so the distributed story here is a new TPU-native capability, not a port)."""

from gea.parallel.mesh import make_mesh  # noqa: F401
from gea.parallel.dp import make_parallel_step, shard_batch  # noqa: F401
