"""Checkpoint / resume (reference C10: `torch.save(state_dict)` every
`--save_interval` under `--save_path`, resume via `--load_path`;
SURVEY.md §5 'Checkpoint / resume').

TPU-native: orbax PyTreeCheckpointer over the whole GANTrainState pytree
(params, optimizer states, step counter, PRNG key, batch_stats). The run
directory layout is a **public cross-tool interface** — the R-separate
trainer loads a frozen generator from a G-LIS run dir (SURVEY.md §7 hard
part #7):

    <save_path>/
      config.json            # the run's full flag set
      checkpoints/<step>/    # orbax pytree checkpoints
      samples/               # per-stage sample grids (PNG)
      plots/loss.png         # loss curves
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Iterable, Optional, Union

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


def _ckpt_root(run_dir: str) -> str:
    return os.path.join(os.path.abspath(run_dir), "checkpoints")


_async_ckptr: Any = None


def _get_async_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_checkpoints() -> None:
    """Block until every in-flight async save has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(
    run_dir: str,
    step: int,
    state: Any,
    keep: int = 0,
    async_save: bool = False,
    protect: Union[int, Iterable[int], None] = None,
) -> None:
    """Write the checkpoint for `step`; with keep > 0, prune all but the
    newest `keep` step directories afterwards (the reference keeps every
    torch.save — retention is a TPU-native quality-of-life addition).
    `protect` exempts extra steps (one int or an iterable) from pruning —
    under `--fid_interval` tracking both the best snapshot best.json
    currently points at AND the pending not-yet-committed best must
    survive, or best.json can dangle at a deleted directory.

    With async_save the device->host gather happens now but serialization
    runs on a background thread (orbax AsyncCheckpointer, SURVEY.md §5
    'Failure detection'), so the train loop never stalls on disk; callers
    must invoke `wait_for_checkpoints()` before exiting or restoring.
    """
    path = os.path.join(_ckpt_root(run_dir), str(step))
    # Multihost: saves run on the lead process only, so fetch local
    # replica shards rather than opening cross-process transfers
    # (gea.parallel.dp.local_copy; no-op for addressable arrays).
    from gea.parallel.dp import local_copy

    host_state = jax.device_get(local_copy(state))
    if async_save:
        ckptr = _get_async_checkpointer()
        ckptr.wait_until_finished()  # at most one save in flight
        ckptr.save(path, host_state, force=True)
    else:
        ocp.PyTreeCheckpointer().save(path, host_state, force=True)
    if keep > 0 and jax.process_index() == 0:
        # Count the just-written step even when its directory is not yet
        # committed (async save in flight) — otherwise listdir misses it
        # and keep+1 checkpoints survive every async prune (ADVICE.md r1).
        # Multihost: every process calls save (the orbax sync protocol
        # requires it; numpy trees are written by the primary only), but
        # only the primary prunes shared storage.
        root = _ckpt_root(run_dir)
        on_disk = sorted(
            int(d) for d in os.listdir(root) if re.fullmatch(r"\d+", d)
        )
        kept = set(sorted(set(on_disk) | {step})[-keep:])
        if async_save and on_disk:
            # The save for `step` is still serializing (orbax writes into
            # a tmp-named dir the \d+ filter doesn't see). Keep the newest
            # COMMITTED checkpoint too, or a crash before the async commit
            # would leave keep=1 runs with zero restorable checkpoints.
            # The extra dir is pruned by the next save, when `step` is
            # durable (wait_until_finished above serializes saves).
            kept.add(max(on_disk))
        if protect is not None:
            kept.update(
                (protect,) if isinstance(protect, int) else
                (p for p in protect if p is not None)
            )
        for old in on_disk:
            if old != step and old not in kept:
                shutil.rmtree(os.path.join(root, str(old)), ignore_errors=True)


def record_best_step(run_dir: str, step: int, metric: float, label: str) -> None:
    """Atomically persist the best-so-far snapshot pointer
    (<run_dir>/best.json) for `--step -1` selection."""
    import json

    path = os.path.join(os.path.abspath(run_dir), "best.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"step": step, "metric": round(metric, 4), "label": label}, f)
    os.replace(tmp, path)


def best_record(run_dir: str) -> Optional[dict]:
    """The best-snapshot record written by `--fid_interval` tracking
    ({"step", "metric", "label"}), or None."""
    import json

    path = os.path.join(os.path.abspath(run_dir), "best.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def best_step(run_dir: str) -> Optional[int]:
    """The best-FID step recorded by `--fid_interval` tracking, or None."""
    rec = best_record(run_dir)
    return None if rec is None else int(rec["step"])


def latest_step(run_dir: str) -> Optional[int]:
    root = _ckpt_root(run_dir)
    if not os.path.isdir(root):
        return None
    steps = [int(d) for d in os.listdir(root) if re.fullmatch(r"\d+", d)]
    return max(steps) if steps else None


def _restore_with_schema_evolution(ckptr, path: str, target: Any) -> Any:
    """Restore `target`'s structure from `path`, tolerating GANTrainState
    schema drift across releases (e.g. `params_g_ema` added in r2): fields
    the checkpoint lacks keep a sensible default, fields the target lacks
    are dropped — old run dirs stay resumable and new runs stay loadable
    with older flags."""
    import dataclasses

    if target is None:
        return ckptr.restore(path)
    try:
        return ckptr.restore(path, item=jax.device_get(target))
    except ValueError:
        if not dataclasses.is_dataclass(target):
            raise
        # Learn the on-disk key set the cheap-to-code way (one extra read;
        # only legacy/forward checkpoints ever take this path).
        raw = ckptr.restore(path)
        fields = {f.name for f in dataclasses.fields(target)}
        item = {k: getattr(target, k) for k in raw if k in fields}
        dropped = sorted(set(raw) - fields)
        missing = sorted(fields - set(raw))
        # EMA-specific adaptation only applies to states that carry the
        # field (GANTrainState); other dataclass targets get the generic
        # field-intersection restore alone.
        has_ema_field = "params_g_ema" in fields
        tgt_ema = has_ema_field and bool(
            jax.tree_util.tree_leaves(target.params_g_ema)
        )
        if "params_g_ema" in item:
            disk_ema = bool(jax.tree_util.tree_leaves(raw["params_g_ema"]))
            if disk_ema != tgt_ema:
                # EMA mirrors params_g's structure, so borrow it as the
                # restore skeleton when the checkpoint has a shadow.
                item["params_g_ema"] = target.params_g if disk_ema else {}
        restored = ckptr.restore(path, item=jax.device_get(item))
        out = target.replace(**restored)
        # What the DISK actually carried — out.params_g_ema is the
        # target's fresh-init copy whenever the key was absent from the
        # checkpoint, so inspecting `out` would wrongly conclude the
        # shadow was restored and skip the re-init below.
        res_ema = (
            has_ema_field
            and "params_g_ema" in raw
            and bool(jax.tree_util.tree_leaves(raw["params_g_ema"]))
        )
        if tgt_ema and not res_ema:
            print(
                "[gea] checkpoint predates --g_ema; initializing the EMA "
                "shadow from the restored generator params"
            )
            out = out.replace(
                params_g_ema=jax.tree_util.tree_map(jnp.copy, out.params_g)
            )
        elif not tgt_ema and res_ema:
            print("[gea] discarding the checkpoint's EMA shadow (--g_ema 0)")
            out = out.replace(params_g_ema={})
        if dropped:
            print(f"[gea] checkpoint fields not in this build (dropped): {dropped}")
        if missing:
            print(f"[gea] fields not in checkpoint (kept at init): {missing}")
        return out


def restore_checkpoint(run_dir: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of `target` (an abstract or concrete
    GANTrainState). Picks the latest step when none is given — the
    'auto-resume-from-latest' elastic-lite contract (SURVEY.md §5).
    step == -1 selects the best-FID snapshot recorded by `--fid_interval`
    tracking (best.json)."""
    wait_for_checkpoints()  # an in-flight async save may be the latest
    if step == -1:
        step = best_step(run_dir)
        if step is None:
            raise FileNotFoundError(
                f"--step -1: no best.json under {run_dir!r} — the run was "
                "not trained with --fid_interval tracking"
            )
    auto_pick = step is None
    if auto_pick:
        step = latest_step(run_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {run_dir!r}")
    path = os.path.join(_ckpt_root(run_dir), str(step))
    ckptr = ocp.PyTreeCheckpointer()
    try:
        return _restore_with_schema_evolution(ckptr, path, target)
    except FileNotFoundError:
        # A concurrent writer's retention prune can delete the directory
        # between latest_step() and restore (ADVICE.md r1) — re-pick once.
        if not auto_pick:
            raise
        retry = latest_step(run_dir)
        if retry is None or retry == step:
            raise
        path = os.path.join(_ckpt_root(run_dir), str(retry))
        return _restore_with_schema_evolution(ckptr, path, target)
