"""Subprocess worker for tests/test_multihost.py — NOT a test module.

Runs one process of a 2-process CPU "pod": the parent sets
JAX_PLATFORMS=cpu, XLA_FLAGS=--xla_force_host_platform_device_count=4 and
the GEA_COORDINATOR/GEA_NUM_PROCESSES/GEA_PROCESS_ID rendezvous env; this
script runs the REAL G-LIS trainer with --multihost over the resulting
8-device global mesh and reports a fingerprint of the final replicated
params for the cross-process-equivalence assertion.
"""

import json
import os
import sys


def main() -> None:
    out_dir = sys.argv[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    # The ambient axon PJRT plugin pins jax_platforms at registration, so
    # the JAX_PLATFORMS env var alone cannot steer this process onto the
    # virtual-device CPU platform (same finding as __graft_entry__);
    # update the live config before any backend query.
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from gea.cli.train_glis import run
    from gea.config import TrainGLISConfig

    proc_id = int(os.environ["GEA_PROCESS_ID"])
    cfg = TrainGLISConfig(
        dataset="synthetic",
        synthetic_on_device=True,
        image_size=16,
        code_size=16,
        num_features=4,
        max_features=16,
        r_iterations=1,
        batch_size=8,
        niter=4,
        log_interval=1,
        vis_interval=100,
        save_interval=2,
        seed=7,
        num_devices=8,
        multihost=True,
        dtype="float32",
        # Per-process dirs (instead of one shared dir) so the test can
        # assert the follower wrote NO artifacts.
        save_path=os.path.join(out_dir, f"run{proc_id}"),
    )
    state, _stats = run(cfg)

    from gea.parallel.dp import local_copy

    leaves = [
        np.asarray(x).ravel()
        for x in jax.tree_util.tree_leaves(local_copy(state.params_g))
    ]
    flat = np.concatenate(leaves)
    # Phase 2: R-separate against the LEAD's finished G run (shared-FS
    # pod assumption) — exercises the multihost ordering fix (config read
    # before checkpoint restore) and the per-process-slab dummy input.
    from gea.cli.train_r_separate import run as run_r
    from gea.config import TrainRSeparateConfig

    r_cfg = TrainRSeparateConfig(
        g_path=os.path.join(out_dir, "run0"),
        save_path=os.path.join(out_dir, f"runr{proc_id}"),
        niter=2,
        batch_size=8,
        log_interval=1,
        vis_interval=100,
        save_interval=2,
        seed=7,
        num_devices=8,
        multihost=True,
        dtype="float32",
    )
    r_state, _ = run_r(r_cfg)
    r_leaves = [
        np.asarray(x).ravel()
        for x in jax.tree_util.tree_leaves(local_copy(r_state.params_r))
    ]
    r_flat = np.concatenate(r_leaves)

    result = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "final_step": int(np.asarray(jax.device_get(state.step)).reshape(-1)[0]),
        "params_sum": float(np.sum(flat)),
        "params_head": [float(v) for v in flat[:5]],
        "r_final_step": int(
            np.asarray(jax.device_get(r_state.step)).reshape(-1)[0]
        ),
        "r_params_sum": float(np.sum(r_flat)),
    }
    with open(os.path.join(out_dir, f"result{proc_id}.json"), "w") as f:
        json.dump(result, f)
    print(f"[worker {proc_id}] ok: {result}")


if __name__ == "__main__":
    main()
