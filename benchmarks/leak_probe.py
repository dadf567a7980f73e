"""Host-RSS leak probe for the device input path (round 5).

The 256x256 trainer was host-OOM-killed at 130 GB RSS after ~3,600 steps
(~36 MB/step — exactly the uint8 input batch size). The same loop holds
RSS flat on the CPU backend, so the retained memory is inside the
tunneled-TPU client: host staging buffers that survive the Python-side
drop of the `jax.Array` handle. This probe isolates that client behavior
from the training stack and A/B-tests candidate mitigations:

  baseline      drop the handle and rely on refcounting (the trainer's
                current behavior)
  delete        explicitly `arr.delete()` the previous input after the
                next dispatch (one-step lag so the async execution that
                consumed it has been enqueued)
  gc            drop + `gc.collect()` every 32 puts (tests whether the
                buffers are cycle-held rather than client-held)
  thread        baseline, but device_put from a worker thread (the
                device_prefetch topology) — tests thread-affinity leaks

Each variant streams `--puts` batches of `--mb` MB through a trivial
donated jit step and reports start/end RSS and the per-put slope.

    python benchmarks/leak_probe.py --puts 200 --mb 25
"""

from __future__ import annotations

import argparse
import gc
import queue
import threading

import jax
import jax.numpy as jnp
import numpy as np


def rss_gb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1e6
    return float("nan")


def run_variant(name: str, puts: int, nbytes: int) -> dict:
    shape = (nbytes // 2,)  # uint16-ish volume via float16? keep uint8
    host = np.random.default_rng(0).integers(
        0, 255, (nbytes,), dtype=np.uint8
    )

    @jax.jit
    def step(acc, x):
        return acc + jnp.sum(x.astype(jnp.float32)), x[0]

    acc = jnp.zeros((), jnp.float32)
    # Warmup + compile outside the measured window.
    a = jax.device_put(host)
    acc, _ = step(acc, a)
    jax.block_until_ready(acc)
    del a
    gc.collect()

    start = rss_gb()
    prev = None
    if name == "thread":
        q: "queue.Queue" = queue.Queue(maxsize=3)

        def worker():
            for _ in range(puts):
                q.put(jax.device_put(host))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            arr = q.get()
            if arr is None:
                break
            acc, _ = step(acc, arr)
        t.join()
    else:
        for i in range(puts):
            arr = jax.device_put(host)
            acc, _ = step(acc, arr)
            if name == "delete":
                if prev is not None:
                    prev.delete()
                prev = arr
            elif name == "gc" and i % 32 == 31:
                gc.collect()
            arr = None
    jax.block_until_ready(acc)
    if prev is not None:
        prev.delete()
    gc.collect()
    end = rss_gb()
    return {
        "variant": name,
        "start_gb": round(start, 3),
        "end_gb": round(end, 3),
        "leak_mb_per_put": round((end - start) * 1e3 / puts, 3),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--puts", type=int, default=200)
    p.add_argument("--mb", type=int, default=25)
    p.add_argument(
        "--variants", default="baseline,delete,gc,thread",
        help="comma list from: baseline,delete,gc,thread",
    )
    a = p.parse_args()
    import json

    print(f"[leak_probe] platform={jax.devices()[0].platform}", flush=True)
    for v in a.variants.split(","):
        r = run_variant(v.strip(), a.puts, a.mb * 1_000_000)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
