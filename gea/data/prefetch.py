"""Double-buffered host->device prefetch.

The reference overlaps input with compute via DataLoader worker processes
(SURVEY.md §3.1); the TPU-native analogue overlaps the host->device uint8
copy with the device step: a background thread keeps `depth` batches ahead,
`jax.device_put` is async, and the train loop only blocks when the device
queue is truly empty — the alternating step "never stalls on input"
(BASELINE.json north star).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


def device_prefetch(
    host_iter: Iterator[np.ndarray],
    sharding: Optional[jax.sharding.Sharding] = None,
    depth: int = 2,
) -> Iterator[jax.Array]:
    """Wrap a host batch iterator; yields device arrays `depth` ahead."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer is gone — without
        this, an abandoned iterator leaks a worker blocked on a full
        queue for the life of the process."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    failure: list = []

    def worker():
        try:
            for batch in host_iter:
                if stop.is_set():
                    return
                if sharding is not None and not sharding.is_fully_addressable:
                    # Multihost: this process's batch is the LOCAL slab of
                    # the global batch (input_iterator sizes it that way);
                    # assemble the global array from per-process data.
                    arr = jax.make_array_from_process_local_data(
                        sharding, np.asarray(batch)
                    )
                else:
                    arr = jax.device_put(batch, sharding)
                if not _put(arr):
                    return
        except BaseException as e:  # propagate to the consumer, don't
            failure.append(e)  # convert data errors into end-of-stream
        finally:
            _put(None)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                if failure:
                    raise RuntimeError(
                        "input pipeline worker failed"
                    ) from failure[0]
                return
            yield item
    finally:
        stop.set()
