"""Run-dir inspector: print a JSON summary of an experiment directory —
config, checkpoint steps, parameter counts — without loading any model
onto a device. Useful for quickly auditing the cross-tool checkpoint
contract (SURVEY.md §5 'Checkpoint / resume').

    python -m gea.cli.info --load_path runs/glis3_80
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np


def summarize(load_path: str) -> dict:
    from gea.utils.checkpoint import restore_checkpoint

    out: dict = {"path": os.path.abspath(load_path)}
    cfg_path = os.path.join(load_path, "config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            out["config"] = json.load(f)
    root = os.path.join(load_path, "checkpoints")
    steps = []
    if os.path.isdir(root):
        steps = sorted(int(d) for d in os.listdir(root) if d.isdigit())
    out["checkpoint_steps"] = steps
    if steps:
        restored = restore_checkpoint(load_path, target=None)
        from gea.train.state import param_count as count

        out["params"] = {
            k: count(restored.get(k))
            for k in ("params_g", "params_d", "params_r")
        }
        out["step"] = int(np.asarray(restored["step"]))
    samples = os.path.join(load_path, "samples")
    if os.path.isdir(samples):
        out["num_sample_grids"] = len(os.listdir(samples))
    from gea.utils.checkpoint import best_record

    best = best_record(load_path)
    if best is not None:  # --fid_interval tracking (load with --step -1)
        out["best"] = best
    return out


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True)
    a = p.parse_args(argv)
    from gea.utils.devices import acquire_devices

    # Wedged-relay guard: fail loudly within GEA_DEVICE_TIMEOUT
    # instead of hanging on the first device touch (VERDICT r3 #6).
    acquire_devices()
    result = summarize(a.load_path)
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
