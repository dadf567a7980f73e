"""Export a trained G-LIS run as a self-contained serving artifact.

The reference has no export/serving story — deploying it means shipping the
training repo and re-driving `g_lis/sample.py` against torch checkpoints
(SURVEY.md §3.2/L5). TPU-native replacement: `jax.export` serializes the
inference program (final-stage render, optionally every LIS stage and the
discriminator realism score) to portable StableHLO with the weights baked
in as constants, lowered for BOTH cpu and tpu by default, with a symbolic
batch dimension so one artifact serves any batch size. Loading it back
(`gea.serve.load`) needs jax only — no Flax, no model code, no run dir.

    python -m gea.cli.export_model --load_path runs/glis3_80 \
        --out exports/glis3_80 --with_scores 1

The error-avoidance serving loop (reference C13) then runs entirely against
the artifact: render, read `scores`, keep the best — see gea/serve.py.
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gea import serve
from gea.cli.sample import load_discriminator, load_generator
from gea.utils.checkpoint import best_step, latest_step, restore_checkpoint


def _resolve_step(load_path: str, step: int) -> Optional[int]:
    """0 = latest, -1 = best.json (the --step convention of every tool)."""
    if step == 0:
        return latest_step(load_path)
    if step == -1:
        resolved = best_step(load_path)
        if resolved is None:
            raise SystemExit(
                f"--step -1: no best.json under {load_path!r} (train with "
                "--fid_interval to track a best snapshot)"
            )
        return resolved
    return step


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--load_path", required=True, help="trained G-LIS run dir")
    p.add_argument("--out", required=True, help="output artifact directory")
    p.add_argument(
        "--step", type=int, default=0,
        help="checkpoint step (0 = latest, -1 = best per --fid_interval)",
    )
    p.add_argument(
        "--use_ema", action="store_true",
        help="export the EMA shadow params (--g_ema runs)",
    )
    p.add_argument(
        "--with_scores", type=int, default=1,
        help="bundle the run's discriminator: output sigmoid realism "
        "scores of the final stage for error-avoidance serving "
        "(reference C13; 0 = generator only)",
    )
    p.add_argument(
        "--all_stages", type=int, default=0,
        help="also output every LIS stage (S, B, H, W, 3) uint8 — the "
        "per-stage progression view (reference C6)",
    )
    p.add_argument(
        "--platforms", default="cpu,tpu",
        help="comma list of target platforms baked into the artifact",
    )
    p.add_argument(
        "--batch", type=int, default=0,
        help="pin the batch dimension to this size (0 = symbolic batch: "
        "one artifact serves any batch size)",
    )
    p.add_argument(
        "--selfcheck", type=int, default=1,
        help="after writing, deserialize the artifact and verify it "
        "reproduces the live model's render (and two batch sizes when "
        "the batch dim is symbolic)",
    )
    a = p.parse_args(argv)

    step = _resolve_step(a.load_path, a.step)
    restored = restore_checkpoint(a.load_path, target=None, step=step)
    generator, g_vars, train_cfg = load_generator(
        a.load_path, step=step, restored=restored, use_ema=a.use_ema
    )
    d_apply = None
    if a.with_scores:
        discriminator, d_vars = load_discriminator(
            a.load_path, step=step, restored=restored
        )
        if getattr(train_cfg, "gan_loss", "bce") != "bce":
            print(
                f"[gea] note: this run used --gan_loss {train_cfg.gan_loss}; "
                "exported `scores` are sigmoid(margin) — a valid ranking "
                "but not a calibrated probability"
            )

        def d_apply(images):
            return jax.nn.sigmoid(
                discriminator.apply(d_vars, images, train=False)
            ).astype(jnp.float32)

    def to_uint8(x):
        return jnp.clip((x + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    takes_sn = generator.spatial_noise_shape(1) is not None

    def serve_fn(z, spatial_noise=None):
        images, _ = generator.render(g_vars, z, spatial_noise=spatial_noise)
        out = {"images": to_uint8(images[-1])}
        if a.all_stages:
            out["stages"] = to_uint8(images)
        if d_apply is not None:
            out["scores"] = d_apply(images[-1])
        return out

    # Argument specs: symbolic batch by default so one artifact serves any
    # batch size; both args share the same symbolic scope.
    if a.batch > 0:
        b = a.batch
    else:
        (b,) = jax.export.symbolic_shape("b")
    specs = [jax.ShapeDtypeStruct((b, train_cfg.code_size), jnp.float32)]
    sn_shape = None
    if takes_sn:
        sn_shape = generator.spatial_noise_shape(2)[1:]  # per-sample
        specs.append(jax.ShapeDtypeStruct((b, *sn_shape), jnp.float32))
        fn = lambda z, sn: serve_fn(z, sn)  # noqa: E731
    else:
        fn = lambda z: serve_fn(z)  # noqa: E731

    platforms = tuple(s.strip() for s in a.platforms.split(",") if s.strip())
    exported = jax.export.export(jax.jit(fn), platforms=platforms)(*specs)
    payload = exported.serialize()

    manifest = {
        "format": "jax.export/stablehlo",
        "calling_convention_version": exported.calling_convention_version,
        "jax_version": jax.__version__,
        "platforms": list(platforms),
        "batch": a.batch,
        "code_size": train_cfg.code_size,
        "image_size": train_cfg.image_size,
        "n_stages": generator.n_stages,
        "spatial_code": train_cfg.spatial_code,
        "spatial_noise_shape": list(sn_shape) if sn_shape else None,
        "outputs": ["images"]
        + (["stages"] if a.all_stages else [])
        + (["scores"] if d_apply is not None else []),
        "use_ema": bool(a.use_ema),
        "source_run": os.path.abspath(a.load_path),
        "step": step,
        "gan_loss": getattr(train_cfg, "gan_loss", "bce"),
    }
    serve.write_artifact(a.out, payload, manifest)
    print(
        f"[gea] exported step {step} -> {a.out} "
        f"({len(payload) / 1e6:.2f} MB, platforms={','.join(platforms)}, "
        f"batch={'symbolic' if a.batch == 0 else a.batch})"
    )

    if a.selfcheck:
        model = serve.load(a.out)
        rng = np.random.default_rng(0)
        for n in (3, 5) if a.batch == 0 else (a.batch,):
            z = rng.standard_normal((n, train_cfg.code_size)).astype(np.float32)
            sn = (
                rng.standard_normal((n, *sn_shape)).astype(np.float32)
                if sn_shape
                else None
            )
            got = model(z, sn)
            images, _ = generator.render(
                g_vars, jnp.asarray(z),
                spatial_noise=jnp.asarray(sn) if sn is not None else None,
            )
            want = np.asarray(to_uint8(images[-1]))
            # uint8 rounding at clip boundaries can differ by 1 between
            # the artifact's lowering and the live jit.
            diff = np.abs(got["images"].astype(int) - want.astype(int))
            if diff.max() > 1:
                raise SystemExit(
                    f"selfcheck FAILED at batch {n}: max uint8 diff "
                    f"{diff.max()} (>1) vs live render"
                )
            if "scores" in got and not np.all(
                (got["scores"] >= 0) & (got["scores"] <= 1)
            ):
                raise SystemExit("selfcheck FAILED: scores outside [0, 1]")
            print(f"[gea] selfcheck ok at batch {n} (max uint8 diff {diff.max()})")


if __name__ == "__main__":
    main()
