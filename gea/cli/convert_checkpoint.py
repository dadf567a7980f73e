"""Checkpoint converter: gea orbax run dir <-> PyTorch state_dict file.

The reference persists models with ``torch.save(state_dict)`` (upstream
``*/train*.py``, SURVEY.md C10); this tool makes the rebuild's checkpoints
first-class citizens of that ecosystem in both directions (VERDICT r2 #6).

Export a trained run to one .pt file (generator + discriminator [+ EMA,
+ reverter when the run has one], with the run config embedded):

    python -m gea.cli.convert_checkpoint --load_path runs/glis3_80 \
        --step -1 --out glis3_80.pt

Import it back into a sampler-loadable gea run dir:

    python -m gea.cli.convert_checkpoint --from_torch glis3_80.pt \
        --out_run runs/imported
    python -m gea.cli.sample --load_path runs/imported ...

The torch side of the contract is gea.interop (TorchGeneratorLIS etc.) —
standard nn.Modules with classic weight_norm weight_v/weight_g keys whose
forward renders identical images (pinned by tests/test_interop.py).
"""

from __future__ import annotations

import argparse
import json
import os
from types import SimpleNamespace
from typing import Optional


def _cfg_ns(raw: dict) -> SimpleNamespace:
    """Attribute view of a run's config.json with converter defaults."""
    ns = SimpleNamespace(**raw)
    for k, v in (
        ("lis_hidden_mult", 1),
        ("spatial_code", 0),
        ("include_initial_image", True),
        ("r_hidden", 512),
        ("r_iterations", 0),
    ):
        if not hasattr(ns, k):
            setattr(ns, k, v)
    return ns


def export_run(
    load_path: str, out: str, step: Optional[int], use_ema: bool
) -> dict:
    import torch

    from gea.interop import (
        discriminator_to_torch_state,
        generator_to_torch_state,
        reverter_to_torch_state,
    )
    from gea.utils.checkpoint import restore_checkpoint

    with open(os.path.join(load_path, "config.json")) as f:
        raw_cfg = json.load(f)
    cfg = _cfg_ns(raw_cfg)
    restored = restore_checkpoint(load_path, target=None, step=step)

    payload = {
        "format": "gea-torch-v1",
        "config": raw_cfg,
        "step": int(restored.get("step", 0)),
    }
    is_r_separate = "g_path" in raw_cfg
    is_r_iterative = "r_chain_length" in raw_cfg

    if not is_r_separate:
        params_g = restored.get("params_g")
        if use_ema:
            params_g = restored.get("params_g_ema")
            if not params_g:
                raise SystemExit(
                    "--use_ema: checkpoint has no EMA params "
                    "(train with --g_ema > 0)"
                )
        if params_g:
            g_cfg = cfg
            if is_r_iterative:
                # R-iterative trains the plain conv core (no LIS chain).
                g_cfg = _cfg_ns({**raw_cfg, "r_iterations": 0})
            payload["generator"] = generator_to_torch_state(params_g, g_cfg)
        if restored.get("params_d"):
            payload["discriminator"] = discriminator_to_torch_state(
                restored["params_d"], cfg
            )
    if restored.get("params_r"):
        payload["reverter"] = reverter_to_torch_state(
            restored["params_r"], cfg
        )
    if is_r_separate and "generator" not in payload:
        print(
            "[gea] note: R-separate runs hold only the reverter; export "
            f"the frozen generator from its own run dir "
            f"({raw_cfg.get('g_path', '?')})"
        )

    os.makedirs(os.path.dirname(os.path.abspath(out)), exist_ok=True)
    torch.save(payload, out)
    comps = sorted(
        k for k in ("generator", "discriminator", "reverter") if k in payload
    )
    print(
        f"[gea] exported step {payload['step']} of {load_path} -> {out} "
        f"({', '.join(comps)})"
    )
    return payload


def import_torch(torch_path: str, out_run: str, step: Optional[int]) -> None:
    import orbax.checkpoint as ocp
    import torch

    from gea.interop import (
        discriminator_params_from_torch,
        generator_params_from_torch,
        reverter_params_from_torch,
    )

    payload = torch.load(torch_path, map_location="cpu", weights_only=False)
    if payload.get("format") != "gea-torch-v1":
        raise SystemExit(
            f"{torch_path!r} is not a gea-torch-v1 export; importing "
            "arbitrary torch checkpoints requires the documented key "
            "schema (gea/interop/torch_port.py)"
        )
    raw_cfg = payload["config"]
    cfg = _cfg_ns(raw_cfg)
    ckpt_step = step if step is not None else int(payload.get("step", 0))

    tree = {"step": ckpt_step}
    if "generator" in payload:
        g_cfg = cfg
        if "r_chain_length" in raw_cfg:
            g_cfg = _cfg_ns({**raw_cfg, "r_iterations": 0})
        tree["params_g"] = generator_params_from_torch(
            payload["generator"], g_cfg
        )
    if "discriminator" in payload:
        tree["params_d"] = discriminator_params_from_torch(
            payload["discriminator"], cfg
        )
    if "reverter" in payload:
        tree["params_r"] = reverter_params_from_torch(payload["reverter"], cfg)

    out_run = os.path.abspath(out_run)
    os.makedirs(out_run, exist_ok=True)
    with open(os.path.join(out_run, "config.json"), "w") as f:
        json.dump(raw_cfg, f, indent=2, sort_keys=True)
    path = os.path.join(out_run, "checkpoints", str(ckpt_step))
    ocp.PyTreeCheckpointer().save(path, tree, force=True)
    print(
        f"[gea] imported {torch_path} -> {out_run} (checkpoint step "
        f"{ckpt_step}; loadable by the samplers/eval CLIs)"
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", default="", help="gea run dir to export")
    p.add_argument("--out", default="", help="output .pt path for export")
    p.add_argument(
        "--step", type=int, default=0,
        help="checkpoint step (0 = latest, -1 = best per --fid_interval)",
    )
    p.add_argument(
        "--use_ema", action="store_true",
        help="export the EMA copy of G (runs trained with --g_ema > 0)",
    )
    p.add_argument(
        "--from_torch", default="", help=".pt file to import into a run dir"
    )
    p.add_argument(
        "--out_run", default="", help="gea run dir to create on import"
    )
    a = p.parse_args(argv)
    from gea.utils.devices import acquire_devices

    # Wedged-relay guard: fail loudly within GEA_DEVICE_TIMEOUT
    # instead of hanging on the first device touch (VERDICT r3 #6).
    acquire_devices()

    if a.from_torch:
        if not a.out_run:
            raise SystemExit("--from_torch requires --out_run")
        if a.step < 0:
            # -1 means "best per best.json" on EXPORT; a torch payload
            # has no best.json, so silently accepting it would mislabel
            # the imported checkpoint.
            raise SystemExit("--step -1 (best) is only valid for export")
        return import_torch(
            a.from_torch, a.out_run, a.step or None
        )
    if not (a.load_path and a.out):
        raise SystemExit("export requires --load_path and --out")
    return export_run(a.load_path, a.out, a.step or None, a.use_ema)


if __name__ == "__main__":
    main()
