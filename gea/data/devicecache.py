"""HBM-resident dataset cache (``--device_data_cache``, round 5).

`--data_cache` removed JPEG decode from the steady-state path; this mode
removes the host->device input transfer too. The whole decoded dataset
(the same ``[N, decode, decode, 3]`` uint8 array CachedFolderDataset
builds) is placed in device memory ONCE at startup; each training
dispatch then transfers only a batch of int32 sample indices (~KB) and
gathers the batch on device. Three reasons this is the right TPU shape:

* **HBM >> host-link bandwidth.** The tunneled host link moves
  ~16-21 MB/s; HBM gathers move GB/ms. A 256x256 run streams 25 MB/step
  — the link, not the MXU, set its e2e rate.
* **The tunnel client leaks every transfer.** The axon PJRT client
  retains a host staging copy of each ``device_put`` payload for the
  life of the process (benchmarks/leak_probe.py; the 256x256 trainer
  was kernel-OOM-killed at 130 GB). Index-only transfer shrinks the
  leak from ~25 MB/step to ~KB/step — below relevance for any run
  length. The RSS guard (gea/utils/hostmem.py) covers whatever remains.
* **Determinism is preserved exactly.** Batch i is the same pure
  function of (seed, i) every backend uses (epoch_permutation), so
  deterministic restart and the single-device-equivalence tests carry
  over unchanged: same bytes reach the same preprocess.

Fit: demo20k at decode 160 is 1.5 GB; demo10k_320 at 320 is 3.0 GB —
comfortable next to the flagship model on a 16 GB v5e. The flag is
opt-in; datasets beyond HBM should stay on ``--data_cache``.

``--host_resize`` is ignored in this mode (its purpose is shrinking the
per-step transfer, which no longer exists; the cache holds decode-res
pixels and the fused device preprocess does the resize, which is also
the higher-quality order of operations).

Upstream analogue: none — the reference streams torchvision transforms
from host workers every step (SURVEY.md §2 C9).
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gea.data.pipeline import epoch_permutation


def device_cached_iterator(
    cfg,
    mesh,
    seed: int,
    start_step: int = 0,
    chunk: int = 1,
) -> Iterator[jax.Array]:
    """Endless device-side batch stream backed by an HBM-resident cache.

    Yields uint8 arrays shaped like the host streaming path's output —
    (B, d, d, 3), or (K, B, d, d, 3) when ``chunk`` > 1 — already placed
    with the mesh's batch sharding, so the runner consumes them
    identically to `device_prefetch` output.
    """
    if jax.process_count() > 1:
        raise ValueError(
            "--device_data_cache is single-host for now (the cache "
            "replication protocol over non-addressable devices is not "
            "wired); use --data_cache"
        )
    if not getattr(cfg, "on_device_pipeline", True):
        raise ValueError(
            "--device_data_cache requires the on-device preprocess "
            "(--on_device_pipeline true): the cache holds raw uint8 and "
            "the crop/resize/flip must run on device"
        )
    from gea.data.pipeline import make_dataset

    # Reuse the cached backend's decode machinery (native pool/PIL) by
    # forcing data_cache semantics; .data is the [N, d, d, 3] array.
    ds = make_dataset(cfg.replace(data_cache=True), seed=seed)
    if not hasattr(ds, "data"):
        raise ValueError(
            f"--device_data_cache needs a cacheable dataset backend, got "
            f"{type(ds).__name__} (dataset={cfg.dataset!r})"
        )
    data = np.ascontiguousarray(ds.data)
    n = len(data)
    batch = cfg.batch_size
    gb = data.nbytes / 1e9
    print(
        f"[gea] --device_data_cache: {n} images x {data.shape[1]}px -> "
        f"{gb:.2f} GB resident in device memory (index-only input "
        "transfer from here on)",
        flush=True,
    )

    if mesh is not None:
        from gea.parallel.dp import batch_sharding, replicated_sharding

        cache_sh = replicated_sharding(mesh)
        idx_sh = replicated_sharding(mesh)
        out_sh = batch_sharding(mesh, chunked=chunk > 1)
    else:
        cache_sh = idx_sh = out_sh = None

    cache = jax.device_put(data, cache_sh)
    del data

    @jax.jit
    def gather(c, ix):
        out = jnp.take(c, ix, axis=0)
        if out_sh is not None:
            out = jax.lax.with_sharding_constraint(
                out.reshape(ix.shape + c.shape[1:]), out_sh
            )
            return out
        return out.reshape(ix.shape + c.shape[1:])

    bpe = n // batch
    if bpe < 1:
        raise ValueError(f"{n} cached images < batch_size {batch}")

    def indices_for(i: int, order_state: list) -> np.ndarray:
        e, off = divmod(i, bpe)
        if order_state[0] != e:
            order_state[0], order_state[1] = e, epoch_permutation(seed, e, n)
        return np.asarray(
            order_state[1][off * batch : (off + 1) * batch], np.int32
        )

    def gen() -> Iterator[jax.Array]:
        order_state: list = [-1, None]
        i = start_step
        while True:
            if chunk > 1:
                idx = np.stack(
                    [indices_for(i + j, order_state) for j in range(chunk)]
                )
            else:
                idx = indices_for(i, order_state)
            ix = jax.device_put(idx, idx_sh)
            yield gather(cache, ix)
            i += chunk

    return gen()
