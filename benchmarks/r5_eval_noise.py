"""Assemble measured eval-noise floors for the campaign report.

Reads one or more `compute_fid --second_opinion --repeats N` JSONs
(fixed model, independent 1,024-sample draws) and writes the per-metric
floor file `r4_campaign_report.py --noise` consumes: for each metric the
MAX half-spread observed across the input files (conservative — a margin
must beat the noisiest config's draw-to-draw wobble to count as
decisive).

    python benchmarks/r5_eval_noise.py --out docs/data/r5_eval_noise.json \
        docs/data/r5_noise_c80.json docs/data/r5_noise_c64.json
"""

from __future__ import annotations

import argparse
import json

# compute_fid half_spread key -> campaign report metric label
KEYMAP = {
    "frechet": "proxy-FID",
    "frechet_b": "proxy-FID-b",
    "kid_x1000": "KIDx1000",
    "precision": "precision",
    "recall": "recall",
}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("inputs", nargs="+")
    p.add_argument("--out", required=True)
    a = p.parse_args()

    floors: dict = {}
    num_samples = None
    sources = []
    for path in a.inputs:
        with open(path) as f:
            d = json.load(f)
        rep = d.get("repeats")
        if not rep or rep.get("n", 1) < 2:
            raise SystemExit(f"{path}: no --repeats >= 2 data")
        num_samples = d.get("num_samples")
        sources.append(
            {"path": path, "n_draws": rep["n"], "load_path": d.get("load_path")}
        )
        for k, label in KEYMAP.items():
            v = rep["half_spread"].get(k)
            if v is None:
                continue
            floors[label] = max(floors.get(label, 0.0), float(v))

    out = {
        "num_samples": num_samples,
        "floors": {k: round(v, 4) for k, v in floors.items()},
        "method": "max per-metric half-spread across independent "
        "same-model draws (compute_fid --repeats)",
        "sources": sources,
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps(out["floors"]))


if __name__ == "__main__":
    main()
