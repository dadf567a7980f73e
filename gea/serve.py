"""Deployment loader for `gea.cli.export_model` artifacts.

An exported run is a directory containing a serialized `jax.export`
StableHLO program (weights baked in as constants) plus a JSON manifest.
Loading it needs jax + this file only — no Flax, no model code, no
checkpoint machinery, no config.json. This is the TPU-native serving
surface; the reference's only deployment story is re-running its samplers
against torch checkpoints (`g_lis/sample.py`, SURVEY.md §3.2), which drags
the whole training codebase into production.

    from gea import serve
    model = serve.load("exports/glis3_80")
    out = model(z)                      # dict: images[, stages][, scores]
    imgs = model.sample(64, seed=0)["images"]   # uint8 (64, H, W, 3)
    best = model.sample_filtered(64, oversample=4)   # error-avoidance: top
    ...                                 # 64 of 256 candidates by D score
    for out in model.stream(z_batches):         # pipelined production path
        ...                             # ~70x one-at-a-time on a remote chip

The exported program was serialized with a symbolic batch dimension by
default, so any batch size works; `manifest["batch"]` > 0 means the export
was pinned to one batch size instead (exact-shape serving, e.g. for a
fixed-batch TPU inference server).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

ARTIFACT = "model.stablehlo"
MANIFEST = "manifest.json"


def _take(out: Dict[str, np.ndarray], idx) -> Dict[str, np.ndarray]:
    """Select candidate indices from a render dict (stages are (S, B, ...))."""
    return {
        k: (v[:, idx] if k == "stages" else v[idx]) for k, v in out.items()
    }


def _cat(a: Dict[str, np.ndarray], b: Dict[str, np.ndarray]):
    return {
        k: np.concatenate([a[k], b[k]], axis=1 if k == "stages" else 0)
        for k in a
    }


def topk_rounds(
    draw,
    count: int,
    threshold: float = 0.0,
    max_rounds: int = 1,
):
    """Error-avoidance selection core shared by `ServingModel.
    sample_filtered` and the HTTP server: call ``draw(round)`` for fresh
    candidate dicts (must contain "scores"), keep a running top-``count``
    by descending score, and stop once every kept sample clears
    ``threshold`` (or after ``max_rounds``). Memory stays bounded at
    ~(count + one draw) regardless of rounds. Returns (best, rounds_run);
    ``best`` is sorted by descending score."""
    if max_rounds < 1:
        raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
    best: Optional[Dict[str, np.ndarray]] = None
    rounds = 0
    for r in range(1 if threshold <= 0 else max_rounds):
        out = draw(r)
        best = out if best is None else _cat(best, out)
        order = np.argsort(best["scores"])[::-1][:count]
        best = _take(best, order)
        rounds = r + 1
        if threshold <= 0 or (best["scores"] >= threshold).all():
            break
    assert best is not None
    return best, rounds


def write_artifact(out_dir: str, payload: bytes, manifest: Dict[str, Any]) -> None:
    """Write the serialized program + manifest (used by the export CLI)."""
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ARTIFACT), "wb") as f:
        f.write(payload)
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)


class ServingModel:
    """A deserialized export: callable on z (+ spatial noise when the run
    was trained with --spatial_code), returns a dict of numpy arrays:

      images  uint8 (B, H, W, 3)        final LIS stage, [0, 255]
      stages  uint8 (S, B, H, W, 3)     every LIS stage (--all_stages)
      scores  float32 (B,)              sigmoid D realism (--with_scores)
    """

    def __init__(self, exported: Any, manifest: Dict[str, Any]):
        self.exported = exported
        self.manifest = manifest
        self._call = None  # jitted exported.call, built on first use

    def _jitted(self):
        if self._call is None:
            import jax

            self._call = jax.jit(self.exported.call)
        return self._call

    @property
    def code_size(self) -> int:
        return int(self.manifest["code_size"])

    @property
    def image_size(self) -> int:
        return int(self.manifest["image_size"])

    @property
    def spatial_noise_shape(self) -> Optional[tuple]:
        sn = self.manifest.get("spatial_noise_shape")
        return tuple(sn) if sn else None

    def dispatch(
        self, z: np.ndarray, spatial_noise: Optional[np.ndarray] = None
    ) -> Dict[str, Any]:
        """Validate + enqueue one render on the device WITHOUT forcing the
        outputs to host: returns jax arrays (futures under async
        dispatch). This is the pipelining primitive — callers that
        overlap device work with host work (stream, the HTTP batcher's
        in-flight window) dispatch first and np.asarray later; __call__
        is dispatch + immediate fetch."""
        z = np.asarray(z, np.float32)
        if z.ndim != 2 or z.shape[1] != self.code_size:
            raise ValueError(
                f"z must be (batch, {self.code_size}), got {z.shape}"
            )
        fixed = int(self.manifest.get("batch", 0))
        if fixed and z.shape[0] != fixed:
            raise ValueError(
                f"this artifact was exported with a pinned batch of {fixed} "
                f"(manifest['batch']); got {z.shape[0]}"
            )
        args = [z]
        if self.spatial_noise_shape is not None:
            if spatial_noise is None:
                raise ValueError(
                    "this run was trained with --spatial_code; pass "
                    f"spatial_noise of shape (batch, *{self.spatial_noise_shape})"
                )
            args.append(np.asarray(spatial_noise, np.float32))
        elif spatial_noise is not None:
            raise ValueError("this artifact takes no spatial noise")
        return self._jitted()(*args)

    def __call__(
        self, z: np.ndarray, spatial_noise: Optional[np.ndarray] = None
    ) -> Dict[str, np.ndarray]:
        out = self.dispatch(z, spatial_noise)
        return {k: np.asarray(v) for k, v in out.items()}

    def stream(self, z_iter, depth: int = 8):
        """Pipelined rendering: yields one output dict per z batch, in
        order, while keeping up to `depth` batches in flight on the
        device.

        `z_iter` yields z arrays (or (z, spatial_noise) pairs for
        --spatial_code artifacts). Per-request latency on a tunneled or
        networked device is dominated by the host<->device round trip
        (~30-40 ms measured vs ~4.5 ms device time, docs/RESULTS.md
        "Serving throughput"); enqueueing ahead hides it — measured ~70x
        throughput over one-at-a-time calls. Every yielded dict holds
        numpy arrays, same keys as __call__.
        """
        from collections import deque

        if depth < 1:
            raise ValueError("depth must be >= 1")
        call = self._jitted()
        fixed = int(self.manifest.get("batch", 0))
        takes_sn = self.spatial_noise_shape is not None
        q: deque = deque()

        def _enqueue(item):
            z, sn = item if isinstance(item, tuple) else (item, None)
            z = np.asarray(z, np.float32)
            if z.ndim != 2 or z.shape[1] != self.code_size:
                raise ValueError(
                    f"z must be (batch, {self.code_size}), got {z.shape}"
                )
            if fixed and z.shape[0] != fixed:
                raise ValueError(
                    f"pinned batch {fixed}, got {z.shape[0]}"
                )
            if takes_sn:
                if sn is None:
                    raise ValueError(
                        "this artifact takes (z, spatial_noise) pairs"
                    )
                return call(z, np.asarray(sn, np.float32))
            if sn is not None:
                raise ValueError("this artifact takes no spatial noise")
            return call(z)

        for item in z_iter:
            # Retire before enqueueing once the window is full so at most
            # `depth` batches are ever in flight (depth=1 = classic
            # double buffering), keeping device memory bounded as
            # documented.
            if len(q) >= depth:
                out = q.popleft()
                yield {k: np.asarray(v) for k, v in out.items()}
            q.append(_enqueue(item))
        while q:
            out = q.popleft()
            yield {k: np.asarray(v) for k, v in out.items()}

    def sharded(self, devices=None) -> "DataParallelServingModel":
        """Data-parallel serving: the same artifact executed across a
        1-axis device mesh with the batch sharded — rendering is
        embarrassingly parallel over samples, so one exported program
        serves N chips with no re-export (the per-device program IS the
        artifact; `shard_map` runs it on each batch shard and XLA needs
        no collectives). Defaults to all local devices."""
        return DataParallelServingModel(self, devices)

    def sample(
        self, count: int, seed: int = 0, batch_size: int = 64
    ) -> Dict[str, np.ndarray]:
        """Draw z ~ N(0, 1) on the host and render `count` samples in
        batches; returns the same dict with arrays concatenated over batch."""
        if count < 1:
            raise ValueError(f"count must be >= 1, got {count}")
        fixed = int(self.manifest.get("batch", 0))
        if fixed:
            batch_size = fixed
        rng = np.random.default_rng(seed)

        def gen():
            done = 0
            while done < count:
                n = min(batch_size, count - done)
                if fixed and n < fixed:  # pinned batch: render full, trim below
                    n = fixed
                z = rng.standard_normal((n, self.code_size)).astype(np.float32)
                if self.spatial_noise_shape is not None:
                    sn = rng.standard_normal(
                        (n, *self.spatial_noise_shape)
                    ).astype(np.float32)
                    yield z, sn
                else:
                    yield z
                done += n

        chunks = list(self.stream(gen()))
        out: Dict[str, np.ndarray] = {}
        for k in chunks[0]:
            axis = 1 if k == "stages" else 0
            out[k] = np.concatenate([c[k] for c in chunks], axis=axis)
            out[k] = out[k][tuple(slice(None) for _ in range(axis)) + (slice(0, count),)]
        return out

    def sample_filtered(
        self,
        count: int,
        seed: int = 0,
        batch_size: int = 64,
        oversample: int = 4,
        threshold: float = 0.0,
        max_rounds: int = 20,
    ) -> Dict[str, np.ndarray]:
        """Error-avoidance sampling at the deployment surface (reference
        C13, `g_lis/sample.py` --d_filter, SURVEY.md §3.2): render
        ``oversample * count`` candidates, score each with the bundled
        discriminator, and return the ``count`` most-realistic samples
        sorted by descending D score. With ``threshold`` > 0 it becomes
        rejection sampling: candidate rounds are drawn until ``count``
        clear the absolute score cutoff (bounded by ``max_rounds``; a
        shortfall is filled from the best rejects with a notice — the
        same contract as ``gea.cli.sample --d_threshold``). Memory stays
        bounded at ~(count + oversample*count) samples regardless of
        rounds. Requires an artifact exported ``--with_scores``; the
        absolute cutoff assumes BCE-calibrated sigmoid scores (for
        hinge/WGAN-trained runs the top-k ranking still holds, the
        threshold semantics do not).
        """
        if "scores" not in self.manifest.get("outputs", ()):
            raise ValueError(
                "artifact carries no discriminator scores; re-export the "
                "run with --with_scores 1 to enable filtered sampling"
            )
        if count < 1:
            raise ValueError(f"count must be >= 1, got {count}")
        if oversample < 1:
            raise ValueError(f"oversample must be >= 1, got {oversample}")
        if max_rounds < 1:
            raise ValueError(f"max_rounds must be >= 1, got {max_rounds}")
        gan_loss = self.manifest.get("gan_loss", "bce")
        if threshold > 0 and gan_loss != "bce":
            # Same calibration contract as gea.cli.sample (ADVICE r2): a
            # hinge/WGAN discriminator emits uncalibrated margins, so an
            # absolute sigmoid cutoff is not a probability. Ranking
            # (top-k) is unaffected.
            print(
                f"[gea.serve] warning: artifact was trained with gan_loss="
                f"{gan_loss}; its scores are sigmoid(margin), not "
                f"calibrated probabilities — d_threshold={threshold} is "
                "an arbitrary cutoff (top-k ranking is unaffected)"
            )

        n_cand = int(count * oversample)
        best, rounds = topk_rounds(
            lambda r: self.sample(n_cand, seed=seed + r, batch_size=batch_size),
            count,
            threshold=threshold,
            max_rounds=max_rounds,
        )
        if threshold > 0:
            cleared = int((best["scores"] >= threshold).sum())
            if cleared < count:
                print(
                    f"[gea.serve] d_threshold={threshold}: only "
                    f"{cleared}/{count} candidates cleared it after "
                    f"{rounds} rounds; filling from the best rejects"
                )
        return best


class DataParallelServingModel(ServingModel):
    """A ServingModel whose renders are sharded over a device mesh.

    Batches are zero-padded up to a multiple of the device count (the
    shard_map batch split must be even) and trimmed after, so any batch
    size works; `__call__`, `stream`, and `sample` all route through the
    sharded program. Pinned-batch artifacts require the pinned size to be
    divisible by the device count. Verified bit-identical to the
    single-device path in tests/test_export.py."""

    def __init__(self, base: ServingModel, devices=None):
        super().__init__(base.exported, base.manifest)
        import jax

        self.devices = list(devices) if devices else list(jax.devices())
        if not self.devices:
            raise ValueError("no devices for data-parallel serving")
        fixed = int(self.manifest.get("batch", 0))
        if fixed and fixed % len(self.devices) != 0:
            raise ValueError(
                f"pinned batch {fixed} is not divisible by "
                f"{len(self.devices)} devices"
            )

    def _jitted(self):
        if self._call is None:
            import jax
            import numpy as _np
            from jax.sharding import Mesh, PartitionSpec as P

            shard_map = getattr(jax, "shard_map", None)
            if shard_map is None:  # pre-0.8 fallback
                from jax.experimental.shard_map import shard_map

            mesh = Mesh(_np.array(self.devices), ("data",))
            outputs = self.manifest.get("outputs") or ["images"]
            out_specs = {
                k: P(None, "data") if k == "stages" else P("data")
                for k in outputs
            }
            takes_sn = self.spatial_noise_shape is not None
            in_specs = (P("data"), P("data")) if takes_sn else (P("data"),)
            call = self.exported.call
            fn = jax.jit(
                shard_map(
                    (lambda z, sn: call(z, sn)) if takes_sn else call,
                    mesh=mesh,
                    in_specs=in_specs,
                    out_specs=out_specs,
                )
            )
            n_dev = len(self.devices)

            def padded(*args):
                b = args[0].shape[0]
                pad = (-b) % n_dev
                if pad:
                    args = tuple(
                        np.concatenate(
                            [a, np.zeros((pad, *a.shape[1:]), a.dtype)]
                        )
                        for a in args
                    )
                out = fn(*args)
                if pad:
                    out = {
                        k: (v[:, :b] if k == "stages" else v[:b])
                        for k, v in out.items()
                    }
                return out

            self._call = padded
        return self._call


def _main(argv=None) -> None:
    """Deployment-side sampler: render a grid straight from an artifact.

        python -m gea.serve exports/glis3_80 --count 64 --out samples/

    Needs jax + numpy + PIL only — no Flax, no model code, no run dir
    (the reference's only deployment story re-runs its training-repo
    samplers against torch checkpoints, SURVEY.md §3.2).
    """
    import argparse

    p = argparse.ArgumentParser(description=_main.__doc__)
    p.add_argument("artifact", help="export_model output dir")
    p.add_argument("--count", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--rows", type=int, default=8)
    p.add_argument("--out", default="serve_samples")
    p.add_argument(
        "--d_filter", type=int, default=0,
        help="error-avoidance serving: render --oversample x count "
        "candidates, keep the top count by the bundled D score "
        "(artifact must be exported --with_scores)",
    )
    p.add_argument(
        "--oversample", type=int, default=4,
        help="candidate multiplier for --d_filter",
    )
    p.add_argument(
        "--d_threshold", type=float, default=0.0,
        help="with --d_filter: absolute-score rejection sampling — keep "
        "redrawing until count samples clear this sigmoid-D cutoff "
        "(BCE-calibrated scores; top-k ranking is objective-agnostic)",
    )
    a = p.parse_args(argv)
    from gea.utils.devices import acquire_devices

    # Wedged-relay guard: fail loudly within GEA_DEVICE_TIMEOUT
    # instead of hanging on the first device touch (VERDICT r3 #6).
    acquire_devices()

    if a.rows < 1:
        raise SystemExit(f"--rows must be >= 1, got {a.rows}")
    if not a.d_filter and (a.d_threshold > 0 or a.oversample != 4):
        raise SystemExit(
            "--d_threshold/--oversample only apply with --d_filter 1 "
            "(refusing to silently return unfiltered samples)"
        )
    model = load(a.artifact)
    if a.d_filter:
        out = model.sample_filtered(
            a.count, seed=a.seed, batch_size=a.batch_size,
            oversample=a.oversample, threshold=a.d_threshold,
        )
    else:
        out = model.sample(a.count, seed=a.seed, batch_size=a.batch_size)
    os.makedirs(a.out, exist_ok=True)

    # One grid-layout implementation for the whole package (numpy+PIL
    # only, so the deployment footprint is unchanged).
    from PIL import Image

    from gea.utils.grids import tile_grid

    n = out["images"].shape[0]
    grid_path = os.path.join(a.out, "samples.png")
    Image.fromarray(tile_grid(out["images"], rows=a.rows)).save(grid_path)
    wrote = [grid_path]
    if "scores" in out:
        scores_path = os.path.join(a.out, "scores.json")
        with open(scores_path, "w") as f:
            json.dump([round(float(s), 6) for s in out["scores"]], f)
        wrote.append(scores_path)
    print(f"[gea.serve] wrote {', '.join(wrote)} ({n} samples)")


def load(path: str) -> ServingModel:
    """Load an exported run directory (or a direct path to the artifact)."""
    if os.path.isdir(path):
        art, man = os.path.join(path, ARTIFACT), os.path.join(path, MANIFEST)
    else:
        art, man = path, os.path.join(os.path.dirname(path), MANIFEST)
    if not os.path.exists(art):
        raise FileNotFoundError(
            f"no exported model at {art!r} — create one with "
            "`python -m gea.cli.export_model --load_path <run> --out <dir>`"
        )
    from jax import export as jax_export

    with open(art, "rb") as f:
        exported = jax_export.deserialize(f.read())
    if not os.path.exists(man):
        # Without the manifest there is no code_size/batch/spatial-noise
        # contract — every later call would fail opaquely.
        raise FileNotFoundError(
            f"missing manifest at {man!r} — keep {MANIFEST} next to the "
            "artifact (export_model writes both)"
        )
    with open(man) as f:
        manifest: Dict[str, Any] = json.load(f)
    return ServingModel(exported, manifest)


if __name__ == "__main__":
    _main()
