"""Hardware probe for --grad_accum / --remat: where does the
flagship-shaped step OOM at K=1, and what do accumulation and
rematerialization cost/unlock?

Grid of (batch, grad_accum[, remat]) cells over the 160x160 +
4-spatial-noise configuration (the documented config-5 shape,
docs/RESULTS.md). Every cell runs in its OWN subprocess so an OOM (or a
wedged tunnel client) cannot poison the other cells, and prints one JSON
row:

    {"batch": B, "grad_accum": K, "remat": false, "ok": true, "img_s": N}
    {"batch": B, ..., "ok": false, "oom": true, "err": "..."}

Usage:  python benchmarks/grad_accum_probe.py            # default grid
        GEA_GA_GRID="512:1,512:8,1024:1:1" python benchmarks/grad_accum_probe.py
        (cell syntax BATCH:ACCUM or BATCH:ACCUM:REMAT, remat 0/1)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

IMAGE = int(os.environ.get("GEA_GA_IMAGE", "160"))
STEPS = int(os.environ.get("GEA_GA_STEPS", "8"))


def child() -> None:
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import gea  # noqa: F401  (GEA_PLATFORM override before jax init)

    from benchmarks.common import (
        build_flagship_step,
        flagship_config,
        flagship_real_batch,
    )

    batch = int(os.environ["GEA_GA_BATCH"])
    accum = int(os.environ["GEA_GA_ACCUM"])
    remat = os.environ.get("GEA_GA_REMAT", "0") == "1"
    row = {"batch": batch, "grad_accum": accum, "remat": remat}
    try:
        cfg = flagship_config(
            batch,
            image_size=IMAGE,
            spatial_code=4 if IMAGE >= 160 else 0,
            grad_accum=accum,
            remat=remat,
        )
        state, step = build_flagship_step(cfg)
        real = flagship_real_batch(cfg)
        for _ in range(2):  # compile + warm
            state, metrics = step(state, real)
        float(metrics["loss_d"])  # sync (tunnel-safe, see bench.py)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            state, metrics = step(state, real)
        float(metrics["loss_d"])
        dt = time.perf_counter() - t0
        row.update(ok=True, img_s=round(batch * STEPS / dt, 1))
    except Exception as e:  # noqa: BLE001 — report, don't crash the grid
        msg = str(e)
        row.update(
            ok=False,
            oom=("RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower()
                 or "exceeds the limit" in msg),
            err=msg[:300],
        )
    print(json.dumps(row), flush=True)


def main() -> None:
    grid = os.environ.get(
        "GEA_GA_GRID",
        "256:1,256:4,512:1,512:4,1024:1,1024:4,2048:1,2048:8",
    )
    cells = [
        (tuple(int(x) for x in c.split(":")) + (0,))[:3]
        for c in grid.split(",")
        if c
    ]
    rows = []
    for batch, accum, remat in cells:
        env = dict(
            os.environ,
            GEA_GA_CHILD="1",
            GEA_GA_BATCH=str(batch),
            GEA_GA_ACCUM=str(accum),
            GEA_GA_REMAT=str(remat),
        )
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env,
                capture_output=True,
                text=True,
                timeout=int(os.environ.get("GEA_GA_CELL_TIMEOUT", "900")),
            )
            lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
            row = json.loads(lines[-1]) if lines else {
                "batch": batch, "grad_accum": accum, "remat": bool(remat),
                "ok": False, "err": (r.stderr or "no output")[-300:],
            }
        except subprocess.TimeoutExpired:
            row = {"batch": batch, "grad_accum": accum, "remat": bool(remat),
                   "ok": False, "err": "cell timeout"}
        rows.append(row)
        print(json.dumps(row), flush=True)
    oks = [r for r in rows if r.get("ok")]
    ooms = [r for r in rows if r.get("oom")]
    print(json.dumps({"summary": {
        "image_size": IMAGE,
        "max_ok_batch_k1": max(
            (r["batch"] for r in oks
             if r["grad_accum"] == 1 and not r.get("remat")),
            default=0,
        ),
        "max_ok_batch_accum": max(
            (r["batch"] for r in oks
             if r["grad_accum"] > 1 and not r.get("remat")),
            default=0,
        ),
        "max_ok_batch_remat": max(
            (r["batch"] for r in oks if r.get("remat")), default=0
        ),
        "oom_cells": [
            [r["batch"], r["grad_accum"], int(bool(r.get("remat")))]
            for r in ooms
        ],
    }}), flush=True)


if __name__ == "__main__":
    if os.environ.get("GEA_GA_CHILD") == "1":
        child()
    else:
        main()
