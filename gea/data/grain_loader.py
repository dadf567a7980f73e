"""Optional grain-based host loader (SURVEY.md §7 layer 5 lists grain as
the standard host-loader option next to the custom pipelines).

Uses grain.MapDataset over the file list with the same decode contract as
the other backends (uint8 square of decode_size), shuffled per epoch,
batched, with worker prefetch. Selected with ``--data_backend grain``.
"""

from __future__ import annotations

from typing import Iterator, List

import numpy as np


class GrainFolderLoader:
    def __init__(
        self,
        paths: List[str],
        batch_size: int,
        crop_size: int,
        decode_size: int,
        workers: int = 4,
        seed: int = 0,
    ):
        import grain

        from gea.data.pipeline import _decode, require_enough_images

        # Same fail-fast contract as every other folder backend: grain's
        # endless repeat would otherwise fill batches with ~(batch/n)x
        # duplicated images and train silently on degenerate data.
        require_enough_images(len(paths), batch_size, "grain loader input")

        self.batch_size = batch_size
        self.crop_size = crop_size
        self.decode_size = decode_size
        self._paths = list(paths)

        ds = (
            grain.MapDataset.source(self._paths)
            .shuffle(seed=seed)
            .repeat(None)  # endless epochs, reshuffled per epoch
            .map(lambda p: _decode(p, crop_size, decode_size))
            .batch(batch_size, drop_remainder=True)
        )
        it = ds.to_iter_dataset(
            grain.ReadOptions(num_threads=max(1, workers), prefetch_buffer_size=4)
        )
        self._iter_dataset = it

    def __len__(self) -> int:
        return len(self._paths)

    def batches(self, start_batch: int = 0) -> Iterator[np.ndarray]:
        it = iter(self._iter_dataset)
        if start_batch:
            # Grain iterators are index-addressed: the restart is O(1),
            # matching the counter-based contract of the other backends
            # (pipeline.py module docstring).
            it.set_state({"next_index": int(start_batch)})
        for batch in it:
            yield np.asarray(batch)
