"""Shared host-side training-loop machinery for the three trainers
(G-LIS, R-separate, R-iterative): run-dir setup, mesh resolution, input
iterator wiring, periodic observability (stdout losses, loss-curve PNG,
per-stage sample grids), checkpointing and throughput metering — the
reference's train-script scaffolding (SURVEY.md §3.1 'periodic' branch)
factored into one place."""

from __future__ import annotations

import os
from typing import Any, Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gea.data.ondevice import preprocess_batch, synthetic_batch
from gea.data.pipeline import device_crop_size, make_dataset
from gea.data.prefetch import device_prefetch
from gea.parallel import make_mesh
from gea.parallel.dp import batch_sharding
from gea.utils.checkpoint import (
    best_record,
    latest_step,
    record_best_step,
    restore_checkpoint,
    save_checkpoint,
    wait_for_checkpoints,
)
from gea.utils.devices import acquire_devices
from gea.utils.meters import ThroughputMeter
from gea.utils.plotting import LossPlotter


def prepare_run(cfg) -> str:
    if not getattr(cfg, "multihost", False):
        # Guard the first device touch against a wedged runtime (shared
        # watchdog, gea/utils/devices.py). Skipped on pods: there the
        # first touch is jax.distributed.initialize()'s rendezvous,
        # which has its own timeout and must not race a probe thread.
        acquire_devices("trainer device acquisition")
    if getattr(cfg, "multihost", False):
        # Multi-host pods (SURVEY.md §2/§5): coordinator discovery over
        # DCN via the standard cluster env; after this, jax.devices()
        # spans every host and the same 1-axis data mesh rides ICI
        # within slices and DCN across them. Clusters without an
        # auto-detectable environment (and the 2-process CPU smoke test,
        # tests/test_multihost.py) configure the coordinator explicitly
        # through GEA_COORDINATOR/GEA_NUM_PROCESSES/GEA_PROCESS_ID.
        # initialize() is once-per-process; a second trainer in the same
        # process (e.g. R-separate after its G run, or tests) must not
        # re-rendezvous.
        coord = os.environ.get("GEA_COORDINATOR", "")
        if jax.distributed.is_initialized():
            pass
        elif coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["GEA_NUM_PROCESSES"]),
                process_id=int(os.environ["GEA_PROCESS_ID"]),
            )
        else:
            jax.distributed.initialize()
        print(
            f"[gea] multihost: process {jax.process_index()}/"
            f"{jax.process_count()}, {len(jax.devices())} devices"
        )
        if getattr(cfg, "fid_interval", 0) > 0 and jax.process_count() > 1:
            # Best-snapshot pinning decides is_best on the lead only, but
            # the orbax save protocol needs every process to join each
            # save — a lead-only best-save would desynchronize the pod.
            raise SystemExit(
                "--fid_interval is not supported with --multihost yet; "
                "track FID offline with gea.cli.compute_fid/eval_stages"
            )
    run_dir = os.path.abspath(cfg.save_path)
    os.makedirs(run_dir, exist_ok=True)
    if getattr(cfg, "multihost", False) and jax.process_index() != 0:
        return run_dir
    cfg.save(os.path.join(run_dir, "config.json"))
    return run_dir


def check_batch(cfg, num_chips: int) -> None:
    """Global batch must split over the mesh, and the per-device batch
    must split over --grad_accum microbatches."""
    if cfg.batch_size % max(1, num_chips) != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must divide over {num_chips} devices"
        )
    accum = max(1, getattr(cfg, "grad_accum", 1))
    if accum > 1:
        # The batch is sharded over the DATA axis only: under tensor
        # parallelism (--model_shards) the per-shard batch is
        # batch / (devices / model_shards), not batch / devices.
        data_shards = max(1, num_chips // tp_shards(cfg))
        per_device = cfg.batch_size // data_shards
        if per_device % accum != 0:
            raise ValueError(
                f"per-data-shard batch {per_device} must divide by "
                f"--grad_accum {accum}"
            )


def resolve_mesh(cfg):
    """None for a single device; a 1-axis data mesh; or a 2-axis
    ('data', 'model') mesh when --model_shards > 1 (GSPMD dp x tp,
    gea/parallel/tp.py)."""
    n = cfg.num_devices or len(jax.devices())
    tp = tp_shards(cfg)
    if tp > 1:
        if getattr(cfg, "multihost", False):
            raise SystemExit(
                "--model_shards is single-host only (DP covers pods)"
            )
        if n <= 1:
            raise SystemExit(
                f"--model_shards {tp} needs multiple devices ({n} visible)"
            )
        return make_mesh(n, model_shards=tp)
    if n <= 1:
        return None
    return make_mesh(n)


def tp_shards(cfg) -> int:
    """Size of the 'model' mesh axis (1 = pure data parallel)."""
    return max(1, getattr(cfg, "model_shards", 1))


def dispatch_chunk(cfg) -> int:
    """K train steps per XLA dispatch (1 = classic one-dispatch-per-step)."""
    return max(1, getattr(cfg, "steps_per_dispatch", 1))


def synthetic_on_device(cfg) -> bool:
    """True when the synthetic batch is generated inside the jitted step
    (zero input transfer; see ondevice.synthetic_batch)."""
    return (
        cfg.dataset == "synthetic"
        and getattr(cfg, "synthetic_on_device", False)
        and getattr(cfg, "on_device_pipeline", True)
    )


def _stack_chunks(batches: Iterator[np.ndarray], k: int) -> Iterator[np.ndarray]:
    """Group k consecutive host batches into one (k, B, ...) stack."""
    while True:
        yield np.stack([next(batches) for _ in range(k)])


def dummy_input(mesh, k: int = 1) -> Iterator[Any]:
    """Endless shardable placeholder batches for steps that consume no
    real data (on-device-synthetic G-LIS, R-separate). Each process
    supplies its LOCAL slab; on a multihost mesh the (constant) global
    array is assembled once via make_array_from_process_local_data —
    the ONE definition of the dummy-slab protocol, shared by every
    input-free trainer."""
    n = mesh.devices.size if mesh is not None else 1
    n_local = n // jax.process_count()
    dummy = (
        np.zeros((k, n_local), np.float32)
        if k > 1
        else np.zeros((n_local,), np.float32)
    )
    if mesh is not None:
        sh = batch_sharding(mesh, chunked=k > 1)
        if not sh.is_fully_addressable:
            dummy = jax.make_array_from_process_local_data(sh, dummy)

    def gen():
        while True:
            yield dummy

    return gen()


def input_iterator(cfg, mesh, seed: int, start_step: int = 0) -> Iterator[jax.Array]:
    """Device-side input stream.

    Default (on-device pipeline): host decodes uint8 only; the jitted
    train step itself crops/resizes/flips/normalizes (the preprocess is
    FUSED into the step by `fuse_input_pipeline`, so one dispatch per
    iteration covers input + update). With ``on_device_pipeline=False``
    the full reference-style transform chain runs on host
    (gea/data/hostpre.py) and float batches stream to the device.

    With steps_per_dispatch=K > 1 each yielded array is a (K, B, ...)
    stack feeding one chunked dispatch (lax.scan over the K steps).

    ``start_step`` (the resumed step count) fast-forwards the stream:
    every backend's batch i is a pure function of (seed, i), and one
    train step consumes exactly one batch, so a resumed run sees the
    same data sequence a never-interrupted run would — deterministic
    resume, O(1) skip, nothing decoded for the skipped prefix.
    """
    k = dispatch_chunk(cfg)
    n_proc = jax.process_count()
    if synthetic_on_device(cfg):
        # The step generates its own data; feed a tiny shardable dummy.
        return dummy_input(mesh, k)

    if n_proc > 1:
        # Multihost: each process decodes/serves only its slab of the
        # global batch, from an independently-seeded stream.
        if cfg.batch_size % n_proc:
            raise ValueError(
                f"batch_size {cfg.batch_size} must divide over "
                f"{n_proc} processes"
            )
        cfg = cfg.replace(batch_size=cfg.batch_size // n_proc)
        seed = seed + 7919 * jax.process_index()
    if getattr(cfg, "device_data_cache", False):
        # HBM-resident dataset: index-only input transfer, batches
        # gathered on device (gea/data/devicecache.py). Yields arrays
        # shaped/sharded exactly like the streaming path below.
        from gea.data.devicecache import device_cached_iterator

        return device_cached_iterator(
            cfg, mesh, seed, start_step=start_step, chunk=k
        )

    ds = make_dataset(cfg, seed=seed)
    sharding = (
        batch_sharding(mesh, chunked=k > 1) if mesh is not None else None
    )

    if getattr(cfg, "on_device_pipeline", True):
        if getattr(cfg, "host_resize", False):
            # Slow-link transport mode: stream uint8 at FINAL resolution
            # (see DataConfig.host_resize). The fused device preprocess
            # then sees crop == image_size and only flips/normalizes.
            from gea.data.hostpre import host_downsample_uint8

            crop = device_crop_size(cfg)
            raw_batches = ds.batches(start_step)

            def resized():
                for raw in raw_batches:
                    yield host_downsample_uint8(raw, crop, cfg.image_size)

            batches = resized()
        else:
            batches = ds.batches(start_step)
    else:
        from gea.data.hostpre import host_preprocess

        def host_batches():
            # Folder-backed datasets already center-cropped at native res
            # inside decode, so the host transform must not crop again
            # (ADVICE.md r1). Flip randomness is keyed by the batch index
            # so the host path keeps the counter-based restart contract.
            crop = device_crop_size(cfg)
            for i, raw in enumerate(ds.batches(start_step), start_step):
                yield host_preprocess(
                    raw,
                    np.random.default_rng([seed ^ 0xFEED, i]),
                    crop_size=crop,
                    image_size=cfg.image_size,
                    augment_flip=cfg.augment_flip,
                )

        batches = host_batches()

    if k > 1:
        batches = _stack_chunks(batches, k)
    return device_prefetch(batches, sharding=sharding, depth=3)


def fuse_input_pipeline(cfg, step_fn, axis_name: str = None):
    """Wrap step(state, real) into step(state, raw, rng) with the
    on-device preprocess inlined, so input transform + train update
    compile to ONE XLA program (one dispatch per iteration — halves the
    host->device round trips through remote/tunneled runtimes). Under
    shard_map, pass `axis_name` so each device draws its own flip mask."""
    if synthetic_on_device(cfg):

        def fused_synth(state, raw, rng):
            if axis_name is not None:
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index(axis_name)
                )
                local_batch = cfg.batch_size // jax.lax.psum(1, axis_name)
            else:
                local_batch = cfg.batch_size
            real = synthetic_batch(rng, local_batch, cfg.image_size)
            return step_fn(state, real)

        return fused_synth

    if getattr(cfg, "on_device_pipeline", True):
        # host_resize streams already-downsampled uint8: the device-side
        # crop/resize become no-ops (crop == image_size). device_data_cache
        # serves decode-res pixels from HBM, so host_resize is moot there
        # (nothing streams) and the full device-side resize applies.
        crop = (
            cfg.image_size
            if getattr(cfg, "host_resize", False)
            and not getattr(cfg, "device_data_cache", False)
            else device_crop_size(cfg)
        )

        def fused(state, raw, rng):
            if axis_name is not None:
                rng = jax.random.fold_in(
                    rng, jax.lax.axis_index(axis_name)
                )
            real = preprocess_batch(
                raw,
                rng,
                crop_size=crop,
                image_size=cfg.image_size,
                augment_flip=cfg.augment_flip,
            )
            return step_fn(state, real)

        return fused

    def passthrough(state, batch, rng):
        return step_fn(state, batch)

    return passthrough


def chunk_steps(step_fn, k: int):
    """Fuse k (state, raw, rng) steps into ONE program via lax.scan: the
    chunked fn takes a (k, B, ...) raw stack and returns metrics stacked
    (k,) per key. One host dispatch then covers k optimizer updates —
    the amortization that closes the gap between step-time and e2e
    throughput on dispatch-latency-bound runtimes (VERDICT r1 #3).

    Always scans, even for k == 1 — callers that disable chunking must use
    step_fn directly (make_step_dispatcher handles this)."""

    def chunked(state, raws, rng):
        rngs = jax.random.split(rng, k)

        def body(carry, inp):
            raw, r = inp
            return step_fn(carry, raw, r)

        return jax.lax.scan(body, state, (raws, rngs))

    return chunked


def make_step_dispatcher(cfg, mesh, fused_step, state_shardings=None, debug=False):
    """Compile-on-demand dispatcher over chunk sizes.

    Returns step(state, raw, rng) -> (state, metrics). When
    steps_per_dispatch > 1 the chunk size is read off raw.shape[0], so the
    ragged tail of a run (niter % K != 0, or a misaligned resume) costs
    exactly one extra compile instead of changing run length.

    `state_shardings` (required iff --model_shards > 1): the dp x tp
    sharding pytree from gea.parallel.tp.state_shardings — selects the
    GSPMD path (plain jit + sharding annotations) instead of shard_map.

    `debug` (--debug_checks) swaps each of the three compile paths for
    its checkify-instrumented counterpart — ~2x step cost, no buffer
    donation. With --steps_per_dispatch > 1 the sanitizer does NOT push
    checkify through the lax.scan chunk (that compiles pathologically:
    10+ minutes for a 2-step toy config on CPU, measured round 4) —
    instead it drives the checked SINGLE-step program k times from the
    host and stacks metrics to match chunk_steps' (k,)-stacked contract.
    Error reporting gets sharper (the raise names the exact step in the
    chunk, not just "somewhere in the chunk") at the cost of dispatch
    amortization, which a debugging mode doesn't need."""
    from gea.parallel.dp import make_parallel_input_step
    from gea.parallel.tp import make_gspmd_input_step
    from gea.utils.debug import (
        checked,
        make_checked_gspmd_input_step,
        make_checked_parallel_input_step,
    )

    k_cfg = dispatch_chunk(cfg)
    cache = {}
    single_box = {}

    def build_checked_single():
        # One compiled checked step shared across chunk sizes (the ragged
        # tail of a run must not trigger a second checkify compile).
        if "fn" not in single_box:
            if state_shardings is not None:
                single_box["fn"] = make_checked_gspmd_input_step(
                    fused_step, mesh, state_shardings, chunked=False
                )
            elif mesh is not None:
                single_box["fn"] = make_checked_parallel_input_step(
                    fused_step, mesh, chunked=False
                )
            else:
                single_box["fn"] = checked(fused_step)
        return single_box["fn"]

    def build(k):
        if debug and k_cfg > 1:
            single = build_checked_single()

            def looped(state, raws, rng):
                rngs = jax.random.split(rng, k)
                ms = []
                for i in range(k):
                    state, m = single(state, raws[i], rngs[i])
                    ms.append(m)
                return state, jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *ms
                )

            return looped
        fn = chunk_steps(fused_step, k) if k_cfg > 1 else fused_step
        if state_shardings is not None:
            if debug:
                return make_checked_gspmd_input_step(
                    fn, mesh, state_shardings, chunked=k_cfg > 1
                )
            return make_gspmd_input_step(
                fn, mesh, state_shardings, chunked=k_cfg > 1
            )
        if mesh is not None:
            if debug:
                return make_checked_parallel_input_step(
                    fn, mesh, chunked=k_cfg > 1
                )
            return make_parallel_input_step(fn, mesh, chunked=k_cfg > 1)
        if debug:
            return checked(fn)
        return jax.jit(fn, donate_argnums=0)

    def dispatch(state, raw, rng):
        k = int(raw.shape[0]) if k_cfg > 1 else 1
        fn = cache.get(k)
        if fn is None:
            fn = cache[k] = build(k)
        return fn(state, raw, rng)

    return dispatch


def place_state(cfg, mesh, state):
    """Place the train state over the mesh: replicated (DP) or dp x tp
    sharded (--model_shards > 1). Returns (state, shardings) where
    `shardings` is the tp sharding pytree to hand make_step_dispatcher,
    or None on the replicated/DP path."""
    if mesh is None:
        return state, None
    if tp_shards(cfg) > 1:
        from gea.parallel.tp import (
            shard_state,
            sharded_param_fraction,
            state_shardings,
        )

        sh = state_shardings(
            state, mesh, min_width=getattr(cfg, "tp_min_width", 64)
        )
        frac = sharded_param_fraction(sh)
        if frac == 0.0:
            print(
                f"[gea] warning: --model_shards {tp_shards(cfg)} sharded "
                f"ZERO state leaves (no last axis >= tp_min_width="
                f"{getattr(cfg, 'tp_min_width', 64)} divisible by the "
                f"shard count) — running fully replicated"
            )
        else:
            print(
                f"[gea] tp: {frac:.0%} of state leaves sharded over "
                f"{tp_shards(cfg)} model shards"
            )
        return shard_state(state, sh), sh
    from gea.parallel.dp import replicate_state

    return replicate_state(state, mesh), None


def build_step_fn(cfg, mesh, state, fused):
    """Resolve the driveable step for a trainer: the normal sharded
    dispatcher, or — with --debug_checks — the checkify NaN/Inf sanitizer
    (single-host only; covers single-device, shard_map DP,
    --model_shards GSPMD, and --steps_per_dispatch chunking).
    Returns (placed_state, step_fn); shared by all three trainers so the
    sanitizer contract can't silently drift between them."""
    debug = bool(getattr(cfg, "debug_checks", False))
    if debug:
        print(
            "[gea] --debug_checks: checkify float-check instrumentation "
            "active (~2x step cost, no buffer donation; NOTE the XLA "
            "compile of the checked step scales steeply with model size "
            "and LIS chain depth — minutes on CPU for non-toy configs)",
            flush=True,
        )
    if debug and getattr(cfg, "multihost", False) and jax.process_count() > 1:
        # The sanitizer fetches per-device error leaves to the host; on a
        # pod those span non-addressable devices and the fetch itself
        # raises. Single-host (this host's whole mesh) is the supported
        # sanitizer surface.
        raise SystemExit("--debug_checks is single-host only")
    state, shardings = place_state(cfg, mesh, state)
    return state, make_step_dispatcher(cfg, mesh, fused, shardings, debug=debug)


def maybe_resume(cfg, state):
    """Reference resume contract: --load_path restores an earlier run; an
    existing checkpoint in --save_path auto-resumes (elastic-lite,
    SURVEY.md §5 'Failure detection')."""
    # Precedence: an in-progress save_path WINS over --load_path. The
    # warm start from --load_path applies to the run's FIRST launch only;
    # on a preempted relaunch with identical argv the newer checkpoints
    # in save_path are the run's own progress and must not be rewound to
    # the original warm-start weights — and since load_path is ignored on
    # that relaunch, it may even have been cleaned up by then, so its
    # fail-fast check only applies when it would actually be used.
    own = latest_step(cfg.save_path) is not None
    if own and cfg.save_path != cfg.load_path:
        source = cfg.save_path
        if cfg.load_path:
            print(
                f"[gea] save_path has checkpoints: auto-resuming from it "
                f"(ignoring --load_path {cfg.load_path} warm start)"
            )
    elif cfg.load_path:
        if latest_step(cfg.load_path) is None:
            # An explicit resume path with nothing in it is a user error —
            # fail fast instead of silently burning the run budget on a
            # from-scratch model.
            raise FileNotFoundError(
                f"--load_path {cfg.load_path!r} contains no checkpoints"
            )
        source = cfg.load_path
    else:
        source = cfg.save_path if own else ""
    if not source:
        return state, 0
    restored = restore_checkpoint(source, state)
    start = int(np.asarray(restored.step))
    print(f"[gea] resumed from {source} at step {start}")
    return restored, start


class TrainLoop:
    """Drives step_fn over the input stream with the reference's periodic
    side-effects. step_fn: (state, raw_batch, rng) -> (state, metrics) —
    build it with `fuse_input_pipeline` (or ignore raw/rng for input-free
    steps like R-separate)."""

    def __init__(
        self,
        cfg,
        run_dir: str,
        state,
        step_fn,
        data_iter,
        vis_fn: Optional[Callable[[Any, int], None]] = None,
        num_chips: int = 1,
        loss_keys: Tuple[str, ...] = ("loss_d", "loss_g"),
        fid_fn: Optional[Callable[[Any], float]] = None,
    ):
        self.cfg = cfg
        self.run_dir = run_dir
        self.state = state
        self.step_fn = step_fn
        self.data_iter = data_iter
        self.vis_fn = vis_fn
        self.num_chips = num_chips
        self.loss_keys = loss_keys
        # --fid_interval tracking: fid_fn(state) -> proxy-FID of the
        # current generator; the loop appends to <run>/fid.jsonl, keeps
        # best.json fresh, and protects the best snapshot from retention
        # pruning so `--step -1` can always load it.
        self.fid_fn = fid_fn
        self._fid_plotter = LossPlotter()
        self._best_fid = float("inf")
        self._best_step: Optional[int] = None
        # A best snapshot saved asynchronously but whose best.json pointer
        # is not yet durable: (step, fid). Committed at the next point the
        # underlying checkpoint is known to have finished serializing.
        self._pending_best: Optional[Tuple[int, float]] = None
        # The step best.json durably points at right now. Distinct from
        # _best_step (the latest best, possibly still pending): retention
        # pruning must protect BOTH, or there is a window where best.json
        # references a deleted directory.
        self._committed_best_step: Optional[int] = None
        # --stop_patience early stopping: consecutive fid evals without a
        # new best.
        self._evals_since_best = 0
        self.plotter = LossPlotter()
        self.meter = ThroughputMeter(cfg.batch_size)
        # Multihost: exactly one process owns run_dir side-effects (grids,
        # loss plot, checkpoints) — every process computing them against
        # shared storage would race/duplicate writes (ADVICE.md r1).
        self.is_lead = (
            not getattr(cfg, "multihost", False) or jax.process_index() == 0
        )
        self._data_rng = jax.random.PRNGKey(cfg.seed ^ 0x5EED)
        self._profiling = False
        self._tb = None
        if getattr(cfg, "tensorboard", False) and self.is_lead:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    os.path.join(run_dir, "tb")
                )
            except Exception as e:  # pragma: no cover - optional dep
                print(f"[gea] tensorboard disabled ({e})")

    def _tb_write(self, step: int, metrics, stats) -> None:
        if self._tb is None:
            return
        import tensorflow as tf

        with self._tb.as_default():
            for k, v in metrics.items():
                tf.summary.scalar(f"train/{k}", v, step=step)
            for k, v in stats.items():
                tf.summary.scalar(f"perf/{k}", v, step=step)

    def run(self, start_step: int) -> Any:
        try:
            return self._run(start_step)
        finally:
            if self._profiling:
                # Run ended (or aborted) inside the 5-step profile window —
                # close the trace so the profile directory is valid.
                jax.profiler.stop_trace()
                self._profiling = False

    def _commit_pending_best(self) -> None:
        """Point best.json at the last best-save. Call ONLY after the save
        is known durable (orbax AsyncCheckpointer serializes saves, so any
        later save_checkpoint/wait_for_checkpoints implies commit) — a
        crash must never leave best.json referencing a missing dir."""
        if self._pending_best is not None:
            step, fid = self._pending_best
            record_best_step(self.run_dir, step, fid, "fid")
            self._committed_best_step = step
            self._pending_best = None

    def _run(self, start_step: int) -> Any:
        cfg = self.cfg
        if self.fid_fn is not None and (cfg.load_path or start_step > 0):
            # Resumed run: keep comparing against the recorded best. A
            # fresh step-0 run into a reused save_path must NOT adopt a
            # stale best.json — it would permanently suppress pinning and
            # leave --step -1 pointing at the old run (ADVICE.md r2).
            prior = best_record(self.run_dir)
            if prior is not None:
                self._best_fid = float(prior.get("metric", float("inf")))
                self._best_step = int(prior["step"])
                self._committed_best_step = self._best_step
        self._profiling = False
        k_cfg = dispatch_chunk(cfg)
        # Host-RSS guard (gea/utils/hostmem.py): the tunneled-TPU client
        # leaks a host copy of every input transfer, so a long streaming
        # run must self-checkpoint before the kernel OOM killer fires.
        from gea.utils.hostmem import (
            EXIT_HOST_RSS,
            host_rss_gb,
            resolve_rss_budget_gb,
        )

        rss_budget = resolve_rss_budget_gb(
            getattr(cfg, "max_host_rss_gb", 0.0)
        )
        it = start_step
        while it < cfg.niter:
            if host_rss_gb() > rss_budget:
                step_now = it
                save_checkpoint(self.run_dir, step_now, self.state)
                self._commit_pending_best()
                print(
                    f"[gea] host RSS {host_rss_gb():.1f} GB exceeds the "
                    f"{rss_budget:.1f} GB budget (--max_host_rss_gb; the "
                    "tunneled-TPU client leaks input staging buffers — "
                    "see benchmarks/leak_probe.py). Checkpoint saved at "
                    f"step {step_now}; exiting {EXIT_HOST_RSS} for a "
                    "clean auto-resume restart.",
                    flush=True,
                )
                raise SystemExit(EXIT_HOST_RSS)
            k_eff = min(k_cfg, cfg.niter - it)
            raw = next(self.data_iter)
            if k_cfg > 1 and raw.shape[0] > k_eff:
                # Ragged tail: run only the steps that remain. The surplus
                # stacked batches are dropped (endless shuffled stream).
                raw = raw[:k_eff]
            # Keyed by the GLOBAL step, not a sequentially-split chain:
            # a resumed run then draws the same per-step randomness (flip
            # masks, z, synthetic data) a never-interrupted run would —
            # the rng half of deterministic resume (input_iterator's
            # start_step fast-forward is the data half).
            prng = jax.random.fold_in(self._data_rng, it)
            self.state, metrics = self.step_fn(self.state, raw, prng)
            if self.meter.tick(k_eff):
                # Warmup just ended: drain the async queue (first compile +
                # warmup execution) before the clock starts, by fetching a
                # metric to host — block_until_ready is not reliable on
                # remote runtimes.
                jax.tree_util.tree_map(
                    lambda x: np.asarray(jax.device_get(x)), metrics
                )
                self.meter.restart_timer()

            prev, step_now = it, it + k_eff
            it = step_now

            def crossed(interval: int) -> bool:
                # True when a multiple of `interval` lies in (prev, now] —
                # with chunked dispatch the boundary fires at chunk end.
                # interval <= 0 disables the periodic (the convention the
                # adjacent --fid_interval/--keep_checkpoints flags use).
                if interval <= 0:
                    return False
                return step_now // interval > prev // interval

            profile_dir = getattr(cfg, "profile_dir", "")
            if profile_dir and prev < start_step + 10 <= step_now:
                jax.profiler.start_trace(profile_dir)
                self._profiling = True
            if self._profiling and prev < start_step + 15 <= step_now:
                jax.block_until_ready(self.state.params_g)
                jax.profiler.stop_trace()
                self._profiling = False

            if crossed(cfg.log_interval) or prev == start_step:
                # Chunked metrics come back stacked (k,) per key; log the
                # chunk's last value, plot every inner point.
                hist = {
                    k: np.asarray(jax.device_get(v)).reshape(-1)
                    for k, v in metrics.items()
                }
                m = {k: float(v[-1]) for k, v in hist.items()}
                # Failure detection (SURVEY.md §5): a NaN/Inf loss means
                # the run is dead — save a post-mortem checkpoint and
                # abort loudly instead of burning the remaining budget.
                bad = [
                    k for k, v in hist.items() if not np.all(np.isfinite(v))
                ]
                if bad:
                    # All processes see identical (replicated) metrics, so
                    # every process joins the post-mortem save (the orbax
                    # multihost protocol; the primary does the writing).
                    save_checkpoint(self.run_dir, step_now, self.state)
                    raise FloatingPointError(
                        f"non-finite metrics {bad} at iter {step_now}; "
                        f"post-mortem checkpoint written to {self.run_dir}"
                    )
                stats = self.meter.stats(self.num_chips)
                self._tb_write(step_now, m, stats)
                for j in range(k_eff):
                    self.plotter.add(
                        prev + j + 1,
                        **{
                            k: float(hist[k][j] if hist[k].size > 1 else hist[k][0])
                            for k in self.loss_keys
                            if k in hist
                        },
                    )
                extras = " ".join(
                    f"{k}={v:.4f}" for k, v in m.items() if k not in self.loss_keys
                )
                print(
                    f"[gea] iter {step_now}/{cfg.niter} "
                    + " ".join(f"{k}={m[k]:.4f}" for k in self.loss_keys if k in m)
                    + (f" {extras}" if extras else "")
                    + f" | {stats['images_per_sec']:.1f} img/s"
                    f" ({stats['images_per_sec_per_chip']:.1f}/chip)",
                    flush=True,
                )

            if (
                crossed(cfg.vis_interval)
                and self.vis_fn is not None
                and self.is_lead
            ):
                self.vis_fn(self.state, step_now)
                self.plotter.plot(os.path.join(self.run_dir, "plots", "loss.png"))

            saved_for_best = False
            stop_early = False
            fid_interval = getattr(cfg, "fid_interval", 0)
            if (
                self.fid_fn is not None
                and fid_interval > 0
                and (crossed(fid_interval) or step_now == cfg.niter)
                and self.is_lead
            ):
                fid = float(self.fid_fn(self.state))
                is_best = fid < self._best_fid
                patience = getattr(cfg, "stop_patience", 0)
                self._evals_since_best = (
                    0 if is_best else self._evals_since_best + 1
                )
                if patience > 0 and self._evals_since_best >= patience:
                    # --stop_patience: GAN quality is non-monotone; once
                    # the tracked FID has not improved for `patience`
                    # evals, further steps only burn budget — the pinned
                    # best snapshot (--step -1) is the run's artifact.
                    print(
                        f"[gea] early stop at iter {step_now}: no new best "
                        f"in {patience} evaluations (best "
                        f"{self._best_fid:.3f} @ {self._best_step})",
                        flush=True,
                    )
                    stop_early = True
                print(
                    f"[gea] iter {step_now}: fid={fid:.3f}"
                    + (" (new best)" if is_best else
                       f" (best {self._best_fid:.3f} @ {self._best_step})"),
                    flush=True,
                )
                self._fid_log(step_now, fid)
                if self._tb is not None:
                    self._tb_write(step_now, {"fid": fid}, {})
                if is_best:
                    # Durability order without stalling the step loop
                    # (ADVICE.md r2: early in training FID improves on
                    # nearly every eval, so a blocking wait here would
                    # serialize every fid_interval): the save runs async;
                    # best.json is only pointed at it at the NEXT moment
                    # the save is known committed (save_checkpoint waits
                    # for the previous in-flight save before starting a
                    # new one, and the loop blocks on exit) — a crash
                    # mid-save leaves best.json at the previous durable
                    # best, never at a missing directory.
                    save_checkpoint(
                        self.run_dir,
                        step_now,
                        self.state,
                        keep=getattr(cfg, "keep_checkpoints", 0),
                        async_save=True,
                        protect=(self._committed_best_step, self._best_step),
                    )
                    self._commit_pending_best()  # prior save now durable
                    self._best_fid, self._best_step = fid, step_now
                    self._pending_best = (step_now, fid)
                    saved_for_best = True

            if (
                (crossed(cfg.save_interval) or step_now == cfg.niter or stop_early)
                and not saved_for_best
            ):
                # Async: serialization overlaps the next train steps
                # (orbax AsyncCheckpointer); we block only on loop exit.
                # NOT lead-gated: orbax's save/wait protocol is a global
                # sync — every process must join each save call (numpy
                # trees are then written by the primary host only).
                save_checkpoint(
                    self.run_dir,
                    step_now,
                    self.state,
                    keep=getattr(cfg, "keep_checkpoints", 0),
                    async_save=True,
                    protect=(self._committed_best_step, self._best_step),
                )
                self._commit_pending_best()  # prior best-save now durable

            if stop_early:
                break

        wait_for_checkpoints()
        self._commit_pending_best()
        return self.state

    def _fid_log(self, step: int, fid: float) -> None:
        import json

        with open(os.path.join(self.run_dir, "fid.jsonl"), "a") as f:
            f.write(json.dumps({"step": step, "fid": round(fid, 4)}) + "\n")
        self._fid_plotter.add(step, fid=fid)
        self._fid_plotter.plot(
            os.path.join(self.run_dir, "plots", "fid.png"), ylabel="proxy-FID"
        )
