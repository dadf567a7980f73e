"""Frozen run configurations mirroring the reference CLI surface.

The reference (`aleju/gan-error-avoidance`) is consumed exclusively through
argparse-driven scripts (SURVEY.md §1, L4): ``g_lis/train.py``,
``g_lis/sample.py``, ``g_lis/sample_interpolations.py``,
``r_iterative/train.py``, ``r_separate/train_r.py`` and their samplers.
Flag names below follow the reference surface documented in SURVEY.md §5
(``--dataset --dataroot --batch_size --image_size --crop_size --code_size
--norm --lr --niter --r_iterations --lambda_r --save_path --load_path
--save_interval --vis_interval --save_path_samples``), plus TPU-native
extensions that have no reference analogue (mesh/dtype/profiling flags).

Every config serializes to JSON into the run directory so an experiment is
reproducible from its artifacts alone (the reference's experiment identity is
"the flag string + --save_path"; we make it durable).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import Any, Optional, Tuple, Type, TypeVar

T = TypeVar("T", bound="BaseConfig")

NORM_CHOICES = ("weight", "batch", "none")
DATASET_CHOICES = ("folder", "lsun", "synthetic", "cifar10")


def _flag(default: Any, help: str, **kw: Any) -> Any:  # noqa: A002
    return field(default=default, metadata={"help": help, **kw})


@dataclass(frozen=True)
class BaseConfig:
    """Shared machinery: argparse round-trip + JSON round-trip."""

    # ------------------------------------------------------------------ IO
    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            f.write(self.to_json())

    @classmethod
    def load(cls: Type[T], path: str) -> T:
        with open(path) as f:
            raw = json.load(f)
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: _dejson(v) for k, v in raw.items() if k in names})

    def replace(self: T, **kw: Any) -> T:
        return dataclasses.replace(self, **kw)

    # ------------------------------------------------------------ argparse
    @classmethod
    def add_args(cls, parser: argparse.ArgumentParser) -> None:
        for f in dataclasses.fields(cls):
            name = "--" + f.name
            help_text = f.metadata.get("help", "")
            choices = f.metadata.get("choices")
            if f.type in ("bool", bool):
                parser.add_argument(
                    name,
                    type=_str2bool,
                    nargs="?",
                    const=True,
                    default=f.default,
                    help=help_text + f" (default: {f.default})",
                )
            elif f.type in ("Tuple[float, ...]", "Tuple[int, ...]") or (
                isinstance(f.default, tuple)
            ):
                elem = float if "float" in str(f.type) else int
                parser.add_argument(
                    name,
                    type=elem,
                    nargs="*",
                    default=f.default,
                    help=help_text + f" (default: {f.default})",
                )
            else:
                typ = {"int": int, "float": float, "str": str}.get(str(f.type))
                if typ is None:
                    typ = type(f.default) if f.default is not None else str
                parser.add_argument(
                    name,
                    type=typ,
                    default=f.default,
                    choices=choices,
                    help=help_text + f" (default: {f.default})",
                )

    @classmethod
    def from_args(cls: Type[T], argv: Optional[list] = None) -> T:
        parser = argparse.ArgumentParser(description=cls.__doc__)
        cls.add_args(parser)
        ns = parser.parse_args(argv)
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in vars(ns).items() if k in names}
        for f in dataclasses.fields(cls):
            if isinstance(f.default, tuple) and isinstance(kw.get(f.name), list):
                kw[f.name] = tuple(kw[f.name])
        return cls(**kw)


def _str2bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def _dejson(v: Any) -> Any:
    return tuple(v) if isinstance(v, list) else v


# ===================================================================== model


@dataclass(frozen=True)
class ModelConfig(BaseConfig):
    """Architecture hyper-parameters shared by every tool.

    Mirrors the reference generator/discriminator builders
    (``g_lis/common.py``-style, SURVEY.md §2 C3/C4, citations approximate —
    reference mount was empty, see SURVEY.md §0).
    """

    image_size: int = _flag(80, "output image resolution (square)")
    code_size: int = _flag(256, "dimensionality of the noise/code vector z")
    norm: str = _flag(
        "weight",
        "normalization scheme for G and D",
        choices=NORM_CHOICES,
    )
    r_iterations: int = _flag(
        3, "number of chained LIS noise-refinement modules in the generator"
    )
    num_features: int = _flag(
        64, "base channel count of the conv stacks (doubled per halving)"
    )
    max_features: int = _flag(512, "channel cap for the deepest conv layers")
    lis_hidden_mult: int = _flag(
        1, "hidden width of each LIS residual MLP, as a multiple of code_size"
    )
    spatial_code: int = _flag(
        0,
        "number of spatially-injected noise channels concatenated into an "
        "intermediate generator feature map (reference C12; used for 160x160)",
    )
    include_initial_image: bool = _flag(
        True,
        "also render (and train on) the image for the raw z before any LIS "
        "module; stage weights still put most mass on the final stage",
    )
    dtype: str = _flag(
        "bfloat16", "compute dtype on TPU (params stay float32)"
    )

    @property
    def n_stages(self) -> int:
        """Number of rendered images per generator forward."""
        if self.r_iterations == 0:
            return 1
        return self.r_iterations + (1 if self.include_initial_image else 0)


# ====================================================================== data


@dataclass(frozen=True)
class DataConfig(BaseConfig):
    """Input pipeline config (reference C9: torchvision transforms inline in
    each trainer — CenterCrop(crop_size) -> Resize(image_size) ->
    RandomHorizontalFlip -> Normalize to [-1, 1])."""

    dataset: str = _flag("folder", "dataset kind", choices=DATASET_CHOICES)
    dataroot: str = _flag("", "path to the image folder (CelebA dump)")
    lsun_classes: str = _flag(
        "bedroom",
        "comma-separated LSUN class names (dataset=lsun): dataroot must "
        "hold <class>_train_lmdb dirs (exported to image folders via "
        "gea.data.lsun) or plain <class>/ image subfolders",
    )
    crop_size: int = _flag(160, "center-crop size applied before resize")
    batch_size: int = _flag(64, "global batch size (split across the mesh)")
    data_workers: int = _flag(4, "host-side decode worker threads")
    data_backend: str = _flag(
        "auto",
        "image decode backend: native C++ pool (JPEG), PIL threads, grain "
        "(standard MapDataset pipeline), or auto (native when available "
        "and the folder is all-JPEG)",
        choices=("auto", "native", "pil", "grain"),
    )
    data_cache: bool = _flag(
        False,
        "decode the whole folder once into host RAM (uint8) and serve "
        "batches from memory — removes JPEG decode from the hot path for "
        "datasets that fit (CelebA at decode 96-160 is 5-15 GB)",
    )
    device_data_cache: bool = _flag(
        False,
        "place the whole decoded dataset in DEVICE memory once and gather "
        "batches on device — per-step input transfer drops to an int32 "
        "index array (~KB). For datasets that fit HBM next to the model "
        "(demo20k@160 = 1.5 GB); also sidesteps the tunnel client's "
        "per-transfer host staging leak (gea/data/devicecache.py). "
        "Implies the decode-res device preprocess (host_resize ignored)",
    )
    on_device_pipeline: bool = _flag(
        True,
        "crop/resize/flip/normalize on device (jit) instead of on host; "
        "host only decodes JPEG to uint8",
    )
    host_resize: bool = _flag(
        False,
        "transport optimization for hosts with a SLOW device link (e.g. "
        "tunneled runtimes at tens of MB/s): crop+downsample to "
        "image_size on host and stream uint8 at FINAL resolution — "
        "(crop/image)^2 fewer bytes per step (4x for 160->80); flip/"
        "normalize stay on device. Default off: direct-attached hosts "
        "move uint8 at decode resolution and resize on the MXU/VPU "
        "(docs/RESULTS.md round-3 e2e analysis)",
    )
    synthetic_on_device: bool = _flag(
        False,
        "dataset=synthetic only: generate the synthetic batch INSIDE the "
        "jitted train step (zero host->device input transfer) — makes "
        "benchmarks/e2e runs compute-bound on hosts with slow device links",
    )
    augment_flip: bool = _flag(True, "random horizontal flip augmentation")


# ===================================================================== train


@dataclass(frozen=True)
class TrainGLISConfig(ModelConfig, DataConfig):
    """`g_lis/train.py` equivalent — alternating G/D training of the G-LIS
    generator (SURVEY.md §3.1)."""

    lr: float = _flag(0.0002, "Adam learning rate for G and D")
    lr_schedule: str = _flag(
        "constant",
        "learning-rate schedule over --niter steps: cosine or linear "
        "decay from --lr to --lr_final * --lr; a resumed run continues "
        "the schedule from the checkpointed optimizer count "
        "(beyond-reference option)",
        choices=("constant", "cosine", "linear"),
    )
    lr_final: float = _flag(
        0.0,
        "final learning rate as a FRACTION of --lr for --lr_schedule "
        "cosine|linear (0.0 decays to zero)",
    )
    beta1: float = _flag(0.5, "Adam beta1 (DCGAN convention)")
    beta2: float = _flag(0.999, "Adam beta2")
    niter: int = _flag(50_000, "number of training iterations")
    stage_weight_initial: float = _flag(
        0.2,
        "relative adversarial-loss weight of non-final LIS stages; the final "
        "stage always has weight 1.0 before normalization",
    )
    fid_interval: int = _flag(
        0,
        "compute proxy-FID of the final LIS stage against the training "
        "data every N steps, log to <run>/fid.jsonl, and keep the "
        "best-scoring checkpoint pinned (best.json; load it anywhere "
        "with --step -1). 0 disables (beyond-reference option)",
    )
    fid_samples: int = _flag(
        1024, "sample count per --fid_interval evaluation (real and fake)"
    )
    gan_loss: str = _flag(
        "bce",
        "GAN objective: the reference's BCE/sigmoid, the SAGAN-style "
        "hinge loss, or WGAN with gradient penalty (beyond-reference "
        "options)",
        choices=("bce", "hinge", "wgan-gp"),
    )
    gp_weight: float = _flag(
        10.0,
        "gradient-penalty weight for --gan_loss wgan-gp (the WGAN-GP "
        "paper's lambda=10)",
    )
    stop_patience: int = _flag(
        0,
        "early stopping: end the run after this many consecutive "
        "--fid_interval evaluations without a new best FID (the tracked "
        "best snapshot stays pinned for --step -1). 0 disables; "
        "requires --fid_interval > 0 (beyond-reference option)",
    )
    g_ema: float = _flag(
        0.0,
        "decay for an exponential moving average of G's params (e.g. "
        "0.999); 0 disables. The EMA copy is checkpointed alongside the "
        "live params and selected at sampling time with --use_ema "
        "(beyond-reference option)",
    )
    seed: int = _flag(42, "PRNG seed")
    save_path: str = _flag("runs/glis", "experiment directory for outputs")
    load_path: str = _flag("", "resume from this experiment directory")
    save_interval: int = _flag(2000, "checkpoint every N iterations")
    keep_checkpoints: int = _flag(
        0, "retain only the newest K checkpoints (0 = keep all)"
    )
    max_host_rss_gb: float = _flag(
        0.0,
        "host-RSS budget: checkpoint + exit 19 (for auto-resume) when the "
        "process exceeds it — guards against the tunneled-TPU client's "
        "per-transfer host staging leak (benchmarks/leak_probe.py). "
        "0 = auto (85%% of system RAM), negative disables",
    )
    vis_interval: int = _flag(500, "sample grid + loss plot every N iters")
    vis_rows: int = _flag(8, "rows (and cols) of the sample grid")
    log_interval: int = _flag(50, "stdout loss print every N iterations")
    num_devices: int = _flag(
        0, "data-parallel device count; 0 = all visible devices"
    )
    model_shards: int = _flag(
        1,
        "GSPMD tensor parallelism: shard wide output-channel axes over a "
        "'model' mesh axis of this size (must divide the device count; the "
        "rest is the 'data' axis). 1 = pure data parallel. Single-host "
        "only; see gea/parallel/tp.py",
    )
    tp_min_width: int = _flag(
        64,
        "model_shards > 1: only shard state leaves whose last axis is at "
        "least this wide (narrow leaves replicate)",
    )
    steps_per_dispatch: int = _flag(
        1,
        "fuse K train steps into one XLA dispatch (lax.scan) — amortizes "
        "host->device dispatch latency (remote/tunneled runtimes have a "
        "~75ms floor per dispatch); log/vis/save cadences fire at chunk "
        "boundaries. 1 = one dispatch per step",
    )
    grad_accum: int = _flag(
        1,
        "accumulate gradients over K sequential microbatches per "
        "optimizer update (lax.scan inside the step): numerically "
        "identical to K=1 at the same --batch_size, but activation "
        "memory drops ~K x — raises the feasible batch size/resolution "
        "per chip. Requires --norm weight|none; the per-device batch "
        "must divide by K. Composes with data/tensor parallelism and "
        "--steps_per_dispatch (beyond-reference option)",
    )
    remat: bool = _flag(
        False,
        "rematerialize the generator forward (jax.checkpoint): G's "
        "activations are recomputed during the backward pass instead of "
        "held live across the D step, trading ~one extra G forward for a "
        "large activation-memory drop — an alternative/complement to "
        "--grad_accum for fitting bigger batches or resolutions per chip "
        "(beyond-reference option)",
    )
    profile_dir: str = _flag(
        "", "if set, write a jax.profiler trace for steps 10..15 here"
    )
    use_pallas: bool = _flag(
        False,
        "use the fused Pallas LIS/TPReLU kernels on TPU (falls back to XLA "
        "elsewhere). Default OFF: the pure-XLA lowering measured ~5%% faster "
        "on v5e for the flagship config (benchmarks/KERNELS.md) — the "
        "shipped default follows the measurement (DESIGN.md §4)",
    )
    tensorboard: bool = _flag(
        False, "also write scalars to <save_path>/tb via tf.summary"
    )
    multihost: bool = _flag(
        False,
        "call jax.distributed.initialize() at startup (multi-host pods; "
        "requires the standard TPU cluster environment)",
    )
    debug_checks: bool = _flag(
        False,
        "instrument the train step with checkify float checks — raises at "
        "the first NaN/Inf-producing op with its source location; under "
        "shard_map data parallelism the first failing device is "
        "identified; composes with --model_shards and "
        "--steps_per_dispatch (which it drives one checked step at a "
        "time — full-chunk checkify compiles pathologically). "
        "Debugging mode, ~2x step cost; single-host only",
    )


@dataclass(frozen=True)
class SampleConfig(ModelConfig, BaseConfig):
    """`g_lis/sample.py` equivalent — render per-stage grids from a trained
    checkpoint (SURVEY.md §3.2)."""

    load_path: str = _flag("", "experiment directory of the trained run")
    save_path_samples: str = _flag("", "output directory for sample PNGs")
    count: int = _flag(64, "number of samples to generate")
    batch_size: int = _flag(64, "generation batch size")
    seed: int = _flag(0, "PRNG seed for the noise batch")
    grid_rows: int = _flag(8, "rows of each output grid")
    d_filter: bool = _flag(
        False,
        "error-avoidance resampling: render oversample*batch candidates, "
        "score the final LIS stage with the run's discriminator and keep "
        "only the best batch (reference C13)",
    )
    oversample: int = _flag(
        4, "candidate multiplier for --d_filter resampling"
    )
    d_threshold: float = _flag(
        0.0,
        "with --d_filter: absolute-quality rejection sampling — keep only "
        "candidates whose final-stage D score (sigmoid) is >= this, "
        "rendering more candidate batches until the count is filled "
        "(instead of relative top-k); 0 keeps the top-k behavior. Note: "
        "the probability reading only holds for --gan_loss bce runs; "
        "hinge margins are uncalibrated (the sampler warns)",
    )
    d_filter_step: int = _flag(
        0,
        "with --d_filter: score with the discriminator from THIS checkpoint "
        "step instead of the sampled one — an earlier D is a less "
        "overfit judge of realism (0 = same step as --step, -1 = the "
        "best-FID snapshot from best.json)",
    )
    step: int = _flag(
        0,
        "checkpoint step to load (0 = latest, -1 = best-FID snapshot "
        "from --fid_interval tracking); GAN quality is non-"
        "monotone, use eval_stages to pick the best retained snapshot",
    )
    save_gif: bool = _flag(
        False,
        "also write an animated GIF cycling through the LIS stages "
        "(the reference README's progression GIFs)",
    )
    use_ema: bool = _flag(
        False,
        "sample from the EMA copy of G's params (runs trained with "
        "--g_ema > 0); fails loudly if the checkpoint has no EMA params",
    )


@dataclass(frozen=True)
class SampleInterpolationsConfig(SampleConfig):
    """`g_lis/sample_interpolations.py` equivalent — spherical interpolation
    walks between noise vectors, rendered per LIS stage."""

    interp_points: int = _flag(8, "number of interpolation steps per pair")
    interp_pairs: int = _flag(8, "number of (z_a, z_b) pairs to walk")
    interp_mode: str = _flag(
        "slerp", "interpolation mode", choices=("slerp", "lerp")
    )


@dataclass(frozen=True)
class TrainRConfig(ModelConfig, DataConfig):
    """Shared config for the two reverser tools (SURVEY.md §3.3/§3.4)."""

    lr: float = _flag(0.0002, "Adam learning rate")
    lr_schedule: str = _flag(
        "constant",
        "learning-rate schedule over --niter steps: cosine or linear "
        "decay from --lr to --lr_final * --lr (beyond-reference option)",
        choices=("constant", "cosine", "linear"),
    )
    lr_final: float = _flag(
        0.0,
        "final learning rate as a FRACTION of --lr for --lr_schedule "
        "cosine|linear (0.0 decays to zero)",
    )
    beta1: float = _flag(0.5, "Adam beta1")
    beta2: float = _flag(0.999, "Adam beta2")
    niter: int = _flag(20_000, "number of training iterations")
    lambda_r: float = _flag(
        0.9,
        "weight of the z-similarity penalty ||R(G(z)) - z||^2 keeping the "
        "corrected code close to the original",
    )
    fid_interval: int = _flag(
        0,
        "track proxy-FID every N steps and pin the best checkpoint "
        "(best.json; --step -1): R-separate scores CORRECTED samples "
        "G(blend(z, R(G(z)))), R-iterative the end of the correction "
        "chain. 0 disables (beyond-reference option)",
    )
    fid_samples: int = _flag(
        1024, "sample count per --fid_interval evaluation (real and fake)"
    )
    seed: int = _flag(42, "PRNG seed")
    save_path: str = _flag("runs/r", "experiment directory for outputs")
    load_path: str = _flag("", "resume this R run from its directory")
    save_interval: int = _flag(2000, "checkpoint every N iterations")
    keep_checkpoints: int = _flag(
        0, "retain only the newest K checkpoints (0 = keep all)"
    )
    max_host_rss_gb: float = _flag(
        0.0,
        "host-RSS budget: checkpoint + exit 19 (for auto-resume) when the "
        "process exceeds it — guards against the tunneled-TPU client's "
        "per-transfer host staging leak (benchmarks/leak_probe.py). "
        "0 = auto (85%% of system RAM), negative disables",
    )
    vis_interval: int = _flag(500, "sample grid + loss plot every N iters")
    vis_rows: int = _flag(8, "rows (and cols) of the sample grid")
    log_interval: int = _flag(50, "stdout loss print every N iterations")
    num_devices: int = _flag(0, "data-parallel devices; 0 = all visible")
    model_shards: int = _flag(
        1,
        "GSPMD tensor parallelism over a 'model' mesh axis of this size "
        "(single-host; gea/parallel/tp.py). 1 = pure data parallel",
    )
    tp_min_width: int = _flag(
        64, "model_shards > 1: min last-axis width for a leaf to shard"
    )
    steps_per_dispatch: int = _flag(
        1,
        "fuse K train steps into one XLA dispatch (lax.scan); "
        "log/vis/save cadences fire at chunk boundaries",
    )
    grad_accum: int = _flag(
        1,
        "accumulate gradients over K sequential microbatches per "
        "optimizer update (lax.scan inside the step): numerically "
        "identical to K=1 at the same --batch_size, ~K x lower "
        "activation memory. Requires --norm weight|none; the per-device "
        "batch must divide by K (beyond-reference option)",
    )
    remat: bool = _flag(
        False,
        "rematerialize forward segments (jax.checkpoint): R-iterative "
        "checkpoints each chain link (activation memory drops ~chain-"
        "length x), R-separate checkpoints the corrected frozen-G render "
        "+ frozen-D scoring (the conv-heavy D-feedback segment; the "
        "reverter's own residuals stay live); extra recompute buys a "
        "large activation-memory drop (beyond-reference option)",
    )
    use_pallas: bool = _flag(
        False,
        "use fused Pallas kernels on TPU (default OFF: XLA measured "
        "faster, benchmarks/KERNELS.md)",
    )
    profile_dir: str = _flag(
        "", "if set, write a jax.profiler trace for steps 10..15 here"
    )
    tensorboard: bool = _flag(
        False, "also write scalars to <save_path>/tb via tf.summary"
    )
    multihost: bool = _flag(
        False,
        "call jax.distributed.initialize() at startup (multi-host pods; "
        "requires the standard TPU cluster environment)",
    )
    debug_checks: bool = _flag(
        False,
        "instrument the train step with checkify float checks — raises at "
        "the first NaN/Inf-producing op with its source location; under "
        "shard_map data parallelism the first failing device is "
        "identified; composes with --model_shards and "
        "--steps_per_dispatch (which it drives one checked step at a "
        "time — full-chunk checkify compiles pathologically). "
        "Debugging mode, ~2x step cost; single-host only",
    )


@dataclass(frozen=True)
class TrainRSeparateConfig(TrainRConfig):
    """`r_separate/train_r.py` equivalent — train a reverser R against a
    FROZEN generator loaded from a finished G-LIS run (reference C8). The
    checkpoint directory given by --g_path is a cross-tool public interface
    (SURVEY.md §5 'checkpoint/resume')."""

    g_path: str = _flag(
        "", "experiment directory of the trained (frozen) generator"
    )
    g_step: int = _flag(
        0,
        "checkpoint step of the frozen generator (0 = latest, -1 = the "
        "best-FID snapshot pinned by a --fid_interval G run); GAN "
        "quality is non-monotone, so freezing the best snapshot matters",
    )
    r_hidden: int = _flag(512, "hidden width of the reverser FC head")
    r_adv_weight: float = _flag(
        0.3,
        "weight of the frozen-D adversarial term on G(R(G(z))): trains R "
        "to emit codes that RENDER WELL, not just reconstruct z — the "
        "D-feedback loss (SURVEY.md §3.4 [M] 'adversarial via D and/or "
        "similarity'). 0 = pure code-reconstruction MSE (round-1 behavior, "
        "which shrinks codes toward the mean)",
    )
    r_mse_weight: float = _flag(
        1.0, "weight of the ||R(G(z)) - z||^2 code-reconstruction term"
    )
    r_mine_weight: float = _flag(
        0.0,
        "defective-z mining in [0, 1]: re-weight the per-sample "
        "reconstruction loss toward samples the frozen D scores as fake, "
        "so R practices most on the codes that actually need correction",
    )
    fid_correction_strength: float = _flag(
        0.3,
        "blend strength of the correction scored by --fid_interval "
        "tracking (match the --correction_strength you will sample with)",
    )


@dataclass(frozen=True)
class TrainRIterativeConfig(TrainRConfig):
    """`r_iterative/train.py` equivalent — joint G/R/D training with the
    iterative correction chain z_{t+1} = z_t + R(G(z_t)) (reference C7)."""

    r_chain_length: int = _flag(
        2, "number of reverser correction iterations per step"
    )
    r_hidden: int = _flag(512, "hidden width of the reverser FC head")


def stage_weights(cfg: ModelConfig) -> Tuple[float, ...]:
    """Per-stage adversarial loss weights, final stage highest, normalized to
    sum to 1 (SURVEY.md §0: 'the final stage with the highest loss weight')."""
    n = cfg.n_stages
    if n == 1:
        return (1.0,)
    initial = getattr(cfg, "stage_weight_initial", 0.2)
    raw = [initial + (1.0 - initial) * i / (n - 1) for i in range(n)]
    total = sum(raw)
    return tuple(w / total for w in raw)
