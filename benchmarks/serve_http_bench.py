"""Load test for gea.serve_http: throughput/latency vs client concurrency.

Starts the HTTP server in-process on an exported artifact (or targets an
already-running one with --url), fires `--concurrency` client threads each
posting `--requests` renders of `--rows` codes, and reports request
latency percentiles, aggregate images/sec, and the realized device batch
sizes — the number that shows dynamic batching working: C concurrent
clients should produce device batches of ~C*rows rows, not C batches of
`rows`.

    python benchmarks/serve_http_bench.py --artifact exports/glis3_80 \
        --concurrency 16 --requests 10 --rows 4

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def post_render(url: str, payload: dict) -> dict:
    req = urllib.request.Request(
        url + "/render",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--artifact", default="", help="export_model output dir")
    p.add_argument("--url", default="", help="target a running server instead")
    p.add_argument("--concurrency", type=int, default=16)
    p.add_argument("--requests", type=int, default=10, help="per client")
    p.add_argument("--rows", type=int, default=4, help="codes per request")
    p.add_argument("--max_batch", type=int, default=256)
    p.add_argument("--max_wait_ms", type=float, default=5.0)
    p.add_argument(
        "--pipeline_depth", type=int, default=4,
        help="in-flight device-batch window of the in-process server "
        "(1 = serial-plus-overlap); the round-5 transport-regime A/B "
        "surface (docs/RESULTS.md)",
    )
    p.add_argument(
        "--format", default="png_b64",
        choices=("png_b64", "raw_b64", "array"),
    )
    a = p.parse_args(argv)
    if bool(a.artifact) == bool(a.url):
        raise SystemExit("pass exactly one of --artifact or --url")

    server = batcher = None
    if a.artifact:
        from gea.serve_http import make_server

        server, batcher = make_server(
            a.artifact, port=0, max_batch=a.max_batch,
            max_wait_ms=a.max_wait_ms, pipeline_depth=a.pipeline_depth,
        )
        threading.Thread(target=server.serve_forever, daemon=True).start()
        host, port = server.server_address[:2]
        url = f"http://{host}:{port}"
    else:
        url = a.url.rstrip("/")

    with urllib.request.urlopen(url + "/healthz") as r:
        health = json.loads(r.read())
    code_size = int(health["code_size"])

    # warmup: compile every bucket the run could realize, so measured
    # latencies are serving latencies, not first-compile latencies
    if batcher is not None:
        batcher.warmup()  # resets server stats, so the reported histogram
        # holds only measured-load batches
    else:
        with urllib.request.urlopen(url + "/stats") as r:
            buckets = json.loads(r.read()).get("buckets") or []
        need = min(a.concurrency * a.rows, a.max_batch)
        warm = [b for b in buckets if b <= 2 * need] or [a.rows]
        for b in warm:
            post_render(
                url, {"count": min(b, need), "seed": 0, "format": a.format}
            )

    latencies: list = []
    errors: list = []
    lock = threading.Lock()

    def client(i: int):
        # per-thread generator: np Generators are not thread-safe
        rng = np.random.default_rng(i)
        z = rng.standard_normal((a.rows, code_size)).astype(np.float32)
        for _ in range(a.requests):
            t0 = time.perf_counter()
            try:
                out = post_render(
                    url, {"z": z.tolist(), "format": a.format}
                )
                assert len(out["images"]) == a.rows
            except Exception as e:  # noqa: BLE001 — report, don't crash
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")
                continue
            with lock:
                latencies.append(time.perf_counter() - t0)

    threads = [
        threading.Thread(target=client, args=(i,))
        for i in range(a.concurrency)
    ]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0

    stats = None
    if server is not None:
        with urllib.request.urlopen(url + "/stats") as r:
            stats = json.loads(r.read())
        server.shutdown()
        batcher.close()
    elif a.url:
        with urllib.request.urlopen(url + "/stats") as r:
            stats = json.loads(r.read())

    lat_ms = sorted(x * 1e3 for x in latencies)
    n = len(lat_ms)
    result = {
        "metric": "HTTP serving load test (gea.serve_http dynamic batching)",
        "concurrency": a.concurrency,
        "rows_per_request": a.rows,
        "pipeline_depth": a.pipeline_depth if a.artifact else None,
        "requests_ok": n,
        "errors": len(errors),
        "error_sample": errors[:3],
        "wall_s": round(wall, 3),
        "requests_per_s": round(n / wall, 2) if wall else 0.0,
        "images_per_s": round(n * a.rows / wall, 2) if wall else 0.0,
        "latency_ms": {
            "p50": round(statistics.median(lat_ms), 2) if n else None,
            "p95": round(lat_ms[min(n - 1, int(0.95 * n))], 2) if n else None,
            "max": round(lat_ms[-1], 2) if n else None,
        },
        "server_stats": stats,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
