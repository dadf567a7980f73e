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
With `--r_path <r_separate_run>` the input-space correction chain is baked
in too (blend z toward R(G(z)) for --correction_steps, then render), so a
single artifact serves the full corrected pipeline. `--ri_path
<r_iterative_run>` exports the jointly-trained iterative chain
z_t = z_{t-1} + R(G(z_{t-1})) instead (reference C7) — all three model
families ship through the same artifact format.
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
    p.add_argument(
        "--load_path", default="",
        help="trained G-LIS run dir (optional when --r_path is given: "
        "defaults to the R run's recorded frozen-G run + snapshot)",
    )
    p.add_argument("--out", required=True, help="output artifact directory")
    p.add_argument(
        "--r_path", default="",
        help="R-separate run dir: bake input-space correction into the "
        "artifact — each serving call blends z toward R(G(z)) for "
        "--correction_steps before the final render (reference C13 "
        "correction, gea/models/reverter.py::blend_correction)",
    )
    p.add_argument(
        "--r_step", type=int, default=0,
        help="R checkpoint step (0 = latest, -1 = best per --fid_interval)",
    )
    p.add_argument(
        "--correction_steps", type=int, default=1,
        help="with --r_path: number of correction iterations baked in",
    )
    p.add_argument(
        "--correction_strength", type=float, default=0.3,
        help="with --r_path: blend weight toward the corrected code",
    )
    p.add_argument(
        "--shell_renorm", type=int, default=1,
        help="with --r_path: re-project blended codes onto ||z||=sqrt(d)",
    )
    p.add_argument(
        "--ri_path", default="",
        help="R-iterative run dir (jointly trained G/D/R): export the "
        "iterative correction chain z_t = z_{t-1} + R(G(z_{t-1})) — "
        "`images` is the chain-end render, `stages` the per-link view "
        "(reference C7). Mutually exclusive with --load_path/--r_path",
    )
    p.add_argument(
        "--chain_links", type=int, default=0,
        help="with --ri_path: correction links to unroll (0 = the run's "
        "trained --r_chain_length; eval_chain shows longer chains keep "
        "helping on some runs)",
    )
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
    from gea.utils.devices import acquire_devices

    # Wedged-relay guard: fail loudly within GEA_DEVICE_TIMEOUT
    # instead of hanging on the first device touch (VERDICT r3 #6).
    acquire_devices()
    if a.ri_path and (a.load_path or a.r_path):
        raise SystemExit("--ri_path is mutually exclusive with "
                         "--load_path/--r_path")

    reverter = r_vars = None
    correction_meta = chain_meta = None

    if a.ri_path:
        if a.use_ema:
            raise SystemExit("--use_ema: R-iterative runs keep no EMA shadow")
        # jointly trained G/D/R (reference C7): everything lives in the
        # one R-iterative checkpoint; its generator has no LIS modules.
        from gea.config import TrainRIterativeConfig
        from gea.models import Discriminator, GeneratorLIS, Reverter
        from gea.models.reverter import iterative_chain

        load_path = a.ri_path
        train_cfg = TrainRIterativeConfig.load(
            os.path.join(load_path, "config.json")
        )
        step = _resolve_step(load_path, a.step)
        restored = restore_checkpoint(load_path, target=None, step=step)
        generator = GeneratorLIS.from_config(train_cfg, r_iterations=0)
        g_vars = {
            "params": restored["params_g"],
            **(restored.get("extras_g") or {}),
        }
        reverter = Reverter.from_config(train_cfg)
        r_vars = {
            "params": restored["params_r"],
            **(restored.get("extras_r") or {}),
        }
        links = a.chain_links or train_cfg.r_chain_length
        chain_meta = {"links": links, "trained_links": train_cfg.r_chain_length}
        d_vars_ri = {
            "params": restored["params_d"],
            **(restored.get("extras_d") or {}),
        }
        discriminator = Discriminator.from_config(train_cfg)

        def render_stages(z, spatial_noise=None):
            return iterative_chain(
                generator, reverter, g_vars, r_vars, z, spatial_noise, links
            )

        d_params = (discriminator, d_vars_ri) if a.with_scores else None
        n_stages = links + 1
    else:
        load_path = a.load_path
        g_step_flag = a.step
        if a.r_path:
            from gea.cli.sample_r_separate import load_reverter

            r_step = _resolve_step(a.r_path, a.r_step)
            reverter, r_vars, r_cfg = load_reverter(a.r_path, step=r_step)
            correction_meta = {
                "r_run": os.path.abspath(a.r_path),
                "r_step": r_step,
                "steps": a.correction_steps,
                "strength": a.correction_strength,
                "shell_renorm": bool(a.shell_renorm),
            }
            if not load_path:
                # the sampler contract: correct the same frozen-G snapshot
                # R was trained against (recorded in the R run's config)
                load_path = r_cfg.g_path
                g_step_flag = getattr(r_cfg, "g_step", 0)
        if not load_path:
            raise SystemExit("--load_path is required (or --r_path/"
                             "--ri_path with a recorded run)")

        step = _resolve_step(load_path, g_step_flag)
        restored = restore_checkpoint(load_path, target=None, step=step)
        generator, g_vars, train_cfg = load_generator(
            load_path, step=step, restored=restored, use_ema=a.use_ema
        )
        # The exported program renders via generator.render(), which always
        # includes the initial (pre-LIS) image — so the stages output has
        # r_iterations+1 entries even when the run trained with
        # include_initial_image=False (generator.n_stages would undercount).
        n_stages = generator.r_iterations + 1 if generator.r_iterations else 1

        def render_stages(z, spatial_noise=None):
            if reverter is not None:
                # R-separate correction chain, same math as the sampler /
                # fid tracker (reverter.blend_correction — the one shared
                # definition): blend z toward R(G(z)), then render.
                from gea.models.reverter import blend_correction

                for _ in range(a.correction_steps):
                    imgs, _ = generator.render(
                        g_vars, z, spatial_noise=spatial_noise
                    )
                    z_hat = reverter.apply(r_vars, imgs[-1], train=False)
                    z = blend_correction(
                        z, z_hat, a.correction_strength, bool(a.shell_renorm)
                    )
            images, _ = generator.render(g_vars, z, spatial_noise=spatial_noise)
            return images

        d_params = None
        if a.with_scores:
            d_params = load_discriminator(
                load_path, step=step, restored=restored
            )

    d_apply = None
    if d_params is not None:
        discriminator, d_vars = d_params
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
        images = render_stages(z, spatial_noise=spatial_noise)
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
        "n_stages": n_stages,
        "spatial_code": train_cfg.spatial_code,
        "spatial_noise_shape": list(sn_shape) if sn_shape else None,
        "outputs": ["images"]
        + (["stages"] if a.all_stages else [])
        + (["scores"] if d_apply is not None else []),
        "use_ema": bool(a.use_ema),
        "source_run": os.path.abspath(load_path),
        "step": step,
        "gan_loss": getattr(train_cfg, "gan_loss", "bce"),
        "correction": correction_meta,
        "chain": chain_meta,
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
            live = serve_fn(
                jnp.asarray(z),
                **(
                    {"spatial_noise": jnp.asarray(sn)}
                    if sn is not None
                    else {}
                ),
            )
            want = np.asarray(live["images"])
            # The artifact and the live jit are separately lowered
            # programs; under bfloat16 compute one ulp near |x|=1 is
            # 0.0078 — exactly one uint8 level of the [-1,1]→[0,255]
            # mapping — so different fusion orders at a new batch size
            # legitimately move isolated pixels by a couple of levels.
            # Keep the check strong: tiny max diff AND almost all
            # pixels within the rounding band.
            max_tol = 3 if getattr(train_cfg, "dtype", "") == "bfloat16" else 1
            diff = np.abs(got["images"].astype(int) - want.astype(int))
            frac_over = float((diff > 1).mean())
            if diff.max() > max_tol or frac_over > 0.01:
                raise SystemExit(
                    f"selfcheck FAILED at batch {n}: max uint8 diff "
                    f"{diff.max()} (tol {max_tol}), {frac_over:.2%} of "
                    f"pixels beyond the rounding band vs live render"
                )
            if "scores" in got and not np.all(
                (got["scores"] >= 0) & (got["scores"] <= 1)
            ):
                raise SystemExit("selfcheck FAILED: scores outside [0, 1]")
            print(f"[gea] selfcheck ok at batch {n} (max uint8 diff {diff.max()})")


if __name__ == "__main__":
    main()
