"""MFU experiment harness for the flagship G+D step (VERDICT r1 #5).

Times the full alternating train step (G-LIS-3, 80x80, weight norm, bf16,
batch 256 — bench.py's exact workload) under a set of lowering/layout
variants, so every optimization hypothesis in benchmarks/KERNELS.md gets a
measured ms/step row instead of an argument. Methodology matches bench.py:
warmup until compiled, chain steps through the donated state, synchronize
via a host metric read (block_until_ready is unreliable on the tunneled
axon platform).

Variants (select with --variants, default all):

* baseline        — the shipped configuration (pure-XLA lowering).
* subpixel_seed   — dense subpixel decomposition of ConvT(4,2,1) only for
                    the seed-resolution (5x5->10x10) upsample, where the
                    dilated-conv tiling is weakest.
* subpixel_all    — decomposition on every upsample layer (round-1 negative,
                    re-confirmed here with the shared-vjp step).
* rgb_pad16       — final ConvT renders 16 channels (full MXU lane pack)
                    then slices to RGB.
* mm_f32          — jax.default_matmul_precision('float32') over the trace:
                    3-pass bf16 ("highest") conv accumulation.
* accum_f32       — convs emit float32 (preferred_element_type) and cast
                    back to bf16: tests whether wider accumulation tiles
                    schedule better.
* nchw            — convs run under NCHW dimension numbers with explicit
                    transposes at the boundary (GPU-style layout; expected
                    loss on TPU, measured for the record).

Usage: python benchmarks/mfu_probe.py [--batch 256] [--steps 10]
"""

from __future__ import annotations

import argparse
import contextlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gea  # noqa: F401,E402  (applies the GEA_PLATFORM override before
# any jax backend init — backends initialize lazily on first device use)
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# XLA-counted cost of the shipped step at batch 256 (benchmarks/KERNELS.md);
# scaled linearly for other batches. v5e bf16 peak: 197 TFLOPS.
FLOP_PER_STEP_B256 = 2.61e12
PEAK_TFLOPS = 197.0


def build_step(cfg, gen_overrides):
    # Shared flagship builder (benchmarks/common.py): every probe row must
    # measure the same workload bench.py reports.
    from benchmarks.common import build_flagship_step

    state, step = build_flagship_step(cfg, gen_overrides=gen_overrides)
    return step, state


@contextlib.contextmanager
def patched_convs(mode):
    """Monkeypatch the functional conv primitives for trace-time variants.

    Benchmark-only: production code keeps one lowering; winners get wired
    as real knobs (like GeneratorCore.subpixel_mode) after they earn a row.
    """
    import gea.ops.layers as L

    orig_conv, orig_convt = L.conv2d_torch, L.conv_transpose2d_torch
    if mode == "accum_f32":

        def conv(x, w, stride=1, padding=0):
            y = lax.conv_general_dilated(
                x,
                w,
                window_strides=(stride, stride),
                padding=((padding, padding), (padding, padding)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return y.astype(x.dtype)

        def convt(x, w, stride=1, padding=0, output_padding=0):
            kh, kw = w.shape[0], w.shape[1]
            ph = (kh - 1 - padding, kh - 1 - padding + output_padding)
            pw = (kw - 1 - padding, kw - 1 - padding + output_padding)
            y = lax.conv_general_dilated(
                x,
                w[::-1, ::-1, :, :],
                window_strides=(1, 1),
                padding=(ph, pw),
                lhs_dilation=(stride, stride),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return y.astype(x.dtype)

    elif mode == "nchw":
        dn = ("NCHW", "OIHW", "NCHW")

        def conv(x, w, stride=1, padding=0):
            y = lax.conv_general_dilated(
                x.transpose(0, 3, 1, 2),
                w.transpose(3, 2, 0, 1),
                window_strides=(stride, stride),
                padding=((padding, padding), (padding, padding)),
                dimension_numbers=dn,
            )
            return y.transpose(0, 2, 3, 1)

        def convt(x, w, stride=1, padding=0, output_padding=0):
            kh, kw = w.shape[0], w.shape[1]
            ph = (kh - 1 - padding, kh - 1 - padding + output_padding)
            pw = (kw - 1 - padding, kw - 1 - padding + output_padding)
            y = lax.conv_general_dilated(
                x.transpose(0, 3, 1, 2),
                w[::-1, ::-1, :, :].transpose(3, 2, 0, 1),
                window_strides=(1, 1),
                padding=(ph, pw),
                lhs_dilation=(stride, stride),
                dimension_numbers=dn,
            )
            return y.transpose(0, 2, 3, 1)

    else:
        yield
        return
    L.conv2d_torch, L.conv_transpose2d_torch = conv, convt
    try:
        yield
    finally:
        L.conv2d_torch, L.conv_transpose2d_torch = orig_conv, orig_convt


def run_variant(name, batch, steps, warmup):
    from benchmarks.common import flagship_config

    cfg = flagship_config(batch)
    gen_overrides = {}
    if name == "subpixel_seed":
        gen_overrides["subpixel_mode"] = "seed"
    elif name == "subpixel_all":
        gen_overrides["subpixel_mode"] = "all"
    elif name == "rgb_pad16":
        gen_overrides["rgb_pad"] = 16

    mm = contextlib.nullcontext()
    if name == "mm_f32":
        mm = jax.default_matmul_precision("float32")

    with patched_convs(name), mm:
        from benchmarks.common import flagship_real_batch

        step, state = build_step(cfg, gen_overrides)
        real = flagship_real_batch(cfg)
        for _ in range(warmup):
            state, metrics = step(state, real)
        float(metrics["loss_d"])  # sync (see module docstring)
        t0 = time.perf_counter()
        for _ in range(steps):
            state, metrics = step(state, real)
        float(metrics["loss_d"])
        dt = time.perf_counter() - t0

    ms = dt / steps * 1e3
    img_s = batch * steps / dt
    flops = FLOP_PER_STEP_B256 * batch / 256.0
    tflops = flops / (dt / steps) / 1e12
    mfu = tflops / PEAK_TFLOPS * 100
    print(
        f"{name:14s} {ms:7.1f} ms/step  {img_s:8.0f} img/s  "
        f"~{tflops:5.1f} TFLOPS  ~{mfu:4.1f}% MFU"
    )
    return {"variant": name, "ms": ms, "img_s": img_s, "tflops": tflops}


ALL = [
    "baseline",
    "subpixel_seed",
    "subpixel_all",
    "rgb_pad16",
    "mm_f32",
    "accum_f32",
    "nchw",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--warmup", type=int, default=3)
    p.add_argument("--variants", nargs="*", default=ALL)
    args = p.parse_args()
    unknown = sorted(set(args.variants) - set(ALL))
    if unknown:
        # A typo'd variant would silently measure the baseline and print
        # it under the wrong label — a bogus "no speedup" row.
        raise SystemExit(f"unknown variants {unknown}; choose from {ALL}")
    print(f"device: {jax.devices()[0]}  batch={args.batch}")
    for name in args.variants:
        run_variant(name, args.batch, args.steps, args.warmup)


if __name__ == "__main__":
    main()
