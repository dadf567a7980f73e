"""G-LIS generator (reference C3: `GeneratorLearnedInputSpace` in
`g_lis/common.py`, SURVEY.md §2/§3.5 — citations approximate, reference
mount empty; see SURVEY.md §0).

Semantics rebuilt here:

* A chain of ``r_iterations`` small fully-connected **LIS modules**, each
  applying a residual update to the noise vector:
  ``z_{i+1} = z_i + LIS_i(z_i)``.
* A DCGAN-style conv-transpose core renders an image from the noise after
  each stage; training gives every stage's image discriminator feedback with
  the final stage weighted highest (SURVEY.md §0 item 3).
* Optional **spatial noise channels** (reference C12) concatenated into the
  first intermediate feature map, used at higher resolutions (160x160).

TPU-first design decisions (deliberate departures from the reference's
per-stage Python loop over ``.cuda()`` renders):

* All stage noise vectors are stacked and the conv core renders them in ONE
  large batch of size ``n_stages * B`` — one XLA conv per layer with a batch
  big enough to keep the MXU full, instead of ``n_stages`` small launches.
* NHWC layout, bfloat16 compute, float32 params.
* The LIS chain is a static Python loop over ``r_iterations`` (a compile-time
  constant baked into the jitted step — SURVEY.md §7 hard part #2), each
  link lowered to the fused Pallas residual-MLP kernel on TPU
  (gea/ops/pallas/lis.py) with a pure-XLA fallback.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gea.config import ModelConfig
from gea.ops.layers import ConvTranspose, Dense, NormAct


def generator_plan(image_size: int) -> Tuple[int, int]:
    """(base_resolution, num_doublings) for a target image size.

    80 -> (5, 4); 64 -> (4, 4); 160 -> (5, 5); 32 -> (4, 3).
    Matches the reference's DCGAN convention of growing from a 4x4 or 5x5
    seed map by stride-2 conv-transposes (SURVEY.md §3.5).
    """
    s, d = image_size, 0
    while s % 2 == 0 and s // 2 >= 4:
        s //= 2
        d += 1
    if s * (2**d) != image_size or d == 0:
        raise ValueError(f"unsupported image_size {image_size}")
    return s, d


class LISModule(nn.Module):
    """One learned-input-space residual block: z + MLP(z).

    The MLP is Dense(code -> hidden) -> act -> Dense(hidden -> code); the
    residual add keeps the module an identity-like perturbation of the
    noise vector, which is the error-avoidance mechanism of arXiv:1707.00768.

    Parameters are owned flat (not nested submodules) so the fused Pallas
    kernel (gea/ops/pallas/lis.py) and the XLA fallback consume the SAME
    parameter tree — checkpoints are interchangeable between paths.
    With ``norm != "weight"`` the activation is LeakyReLU(0.2), expressed
    as a TPReLU with fixed slope 0.2 and zero translation so both paths
    share one formula.
    """

    code_size: int
    hidden_mult: int = 1
    norm: str = "weight"
    dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        from gea.ops.layers import normalize_weight
        from gea.ops.pallas import pallas_available
        from gea.ops.pallas.lis import (
            lis_residual_mlp,
            lis_residual_mlp_reference,
        )

        wn = self.norm == "weight"
        hidden = self.code_size * self.hidden_mult
        init = nn.initializers.lecun_normal()
        v1 = self.param("fc1_kernel", init, (self.code_size, hidden), jnp.float32)
        b1 = self.param("fc1_bias", nn.initializers.zeros, (hidden,), jnp.float32)
        v2 = self.param("fc2_kernel", init, (hidden, self.code_size), jnp.float32)
        b2 = self.param(
            "fc2_bias", nn.initializers.zeros, (self.code_size,), jnp.float32
        )
        if wn:
            g1 = self.param("fc1_scale", nn.initializers.ones, (hidden,), jnp.float32)
            g2 = self.param(
                "fc2_scale", nn.initializers.ones, (self.code_size,), jnp.float32
            )
            w1 = normalize_weight(v1, g1, reduce_axes=(0,))
            w2 = normalize_weight(v2, g2, reduce_axes=(0,))
            slope = self.param(
                "slope", nn.initializers.constant(0.25), (hidden,), jnp.float32
            )
            trans = self.param(
                "translation", nn.initializers.zeros, (hidden,), jnp.float32
            )
        else:
            w1, w2 = v1, v2
            slope = jnp.full((hidden,), 0.2, jnp.float32)
            trans = jnp.zeros((hidden,), jnp.float32)

        zc = z.astype(self.dtype)
        args = (
            zc,
            w1.astype(self.dtype),
            b1,
            slope,
            trans,
            w2.astype(self.dtype),
            b2,
        )
        if self.use_pallas and pallas_available():
            return lis_residual_mlp(*args)
        return lis_residual_mlp_reference(
            zc,
            w1.astype(self.dtype),
            b1.astype(self.dtype),
            slope.astype(self.dtype),
            trans.astype(self.dtype),
            w2.astype(self.dtype),
            b2.astype(self.dtype),
        )


class GeneratorCore(nn.Module):
    """The conv-transpose rendering core: z -> image in [-1, 1]."""

    image_size: int
    code_size: int
    norm: str = "weight"
    num_features: int = 64
    max_features: int = 512
    spatial_code: int = 0
    dtype: Any = jnp.float32
    use_pallas: bool = False
    # Perf-tuning knobs (benchmarks/mfu_probe.py; KERNELS.md):
    # subpixel_mode: lower ConvT(4,2,1) via the dense subpixel decomposition
    # for "all" upsample layers or only the "seed"-resolution one (the 5x5
    # maps where dilated-conv tiling is weakest). rgb_pad: render the final
    # layer with this many output channels (>=8 fills MXU lanes) and slice
    # to RGB. Both default off — measured neutral-to-slower on v5e.
    subpixel_mode: str = "none"
    rgb_pad: int = 0
    # Round 5: lower the seed segment (project -> TPReLU -> up1 ConvT)
    # through the fused Pallas kernel (gea/ops/pallas/seed.py) — the
    # 13th MFU hypothesis (VERDICT r4 order #7). Param tree is identical
    # to the XLA path (the modules own the params either way), so
    # checkpoints are interchangeable. norm=weight|none and d>=2 only.
    fused_seed: bool = False

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        spatial_noise: Optional[jnp.ndarray] = None,
        train: bool = True,
    ) -> jnp.ndarray:
        s0, d = generator_plan(self.image_size)
        wn = self.norm == "weight"
        nf, cap = self.num_features, self.max_features

        c0 = min(nf * 2 ** (d - 1), cap)
        use_fused_seed = (
            self.fused_seed and self.norm != "batch" and d >= 2
        )
        if use_fused_seed:
            from gea.ops.pallas import pallas_available
            from gea.ops.pallas.seed import fused_seed, fused_seed_reference

            wp, bp = Dense(
                s0 * s0 * c0, weight_norm=wn, dtype=self.dtype,
                name="project",
            )(z, return_params=True)
            slope, trans = NormAct(
                norm=self.norm, dtype=self.dtype, name="project_act"
            )(jnp.zeros((1, 1, 1, c0), self.dtype), return_params=True)
            c1 = min(nf * 2 ** (d - 2), cap)
            wc, bc = ConvTranspose(
                c1, kernel_size=4, stride=2, padding=1, weight_norm=wn,
                dtype=self.dtype, name="up1",
            )(jnp.zeros((1, 1, 1, c0), self.dtype), return_params=True)
            args = (
                z.astype(self.dtype), wp, bp, slope, trans, wc, bc, s0
            )
            if pallas_available():
                x = fused_seed(*args)
            else:
                x = fused_seed_reference(
                    *(a.astype(self.dtype) for a in args[:-1]), s0
                )
        else:
            x = Dense(
                s0 * s0 * c0, weight_norm=wn, dtype=self.dtype, name="project"
            )(z)
            x = x.reshape(x.shape[0], s0, s0, c0)
            # NormAct/TPReLU deliberately stays on the XLA path: benchmarks
            # (benchmarks/kernel_bench.py) show XLA fuses the activation into
            # the conv epilogue, while a standalone Pallas elementwise kernel
            # forces an extra HBM round-trip (+60% step time). The Pallas
            # TPReLU remains available as gea.ops.pallas.fused_tprelu.
            x = NormAct(norm=self.norm, dtype=self.dtype, name="project_act")(
                x, train=train
            )

        for i in range(1, d):
            ci = min(nf * 2 ** (d - 1 - i), cap)
            if not (i == 1 and use_fused_seed):
                x = ConvTranspose(
                    ci,
                    kernel_size=4,
                    stride=2,
                    padding=1,
                    weight_norm=wn,
                    subpixel=self.subpixel_mode == "all"
                    or (self.subpixel_mode == "seed" and i == 1),
                    dtype=self.dtype,
                    name=f"up{i}",
                )(x)
            x = NormAct(norm=self.norm, dtype=self.dtype, name=f"up{i}_act")(
                x, train=train
            )
            if i == 1 and self.spatial_code > 0:
                if spatial_noise is None:
                    raise ValueError(
                        "spatial_code > 0 requires a spatial_noise input of "
                        f"shape (B, {2 * s0}, {2 * s0}, {self.spatial_code})"
                    )
                x = jnp.concatenate(
                    [x, spatial_noise.astype(x.dtype)], axis=-1
                )

        rgb_ch = max(3, self.rgb_pad)
        x = ConvTranspose(
            rgb_ch,
            kernel_size=4,
            stride=2,
            padding=1,
            weight_norm=wn,
            subpixel=self.subpixel_mode == "all",
            dtype=self.dtype,
            name="to_rgb",
        )(x)
        if rgb_ch > 3:
            x = x[..., :3]
        # tanh in compute dtype: keeps the (n_stages*B, H, W, 3) stage
        # buffer in bf16 — half the HBM traffic into the discriminator.
        return jnp.tanh(x)


class GeneratorLIS(nn.Module):
    """Full G-LIS generator: LIS chain + shared rendering core.

    ``__call__(z)`` returns ``(images, zs)``:

    * ``zs``     — (r_iterations + 1, B, code): z0 and every refined z_i.
    * ``images`` — (n_stages, B, H, W, 3) in [-1, 1]: renders of the staged
      noise vectors selected for training/visualisation. With 0 LIS modules
      this is the single render of z0 (the vanilla-DCGAN baseline of
      BASELINE.json config 1); with N modules it is the renders of
      [z0?, z1, ..., zN] (z0 included iff ``include_initial_image``).
    """

    image_size: int = 80
    code_size: int = 256
    r_iterations: int = 3
    norm: str = "weight"
    num_features: int = 64
    max_features: int = 512
    lis_hidden_mult: int = 1
    spatial_code: int = 0
    include_initial_image: bool = True
    dtype: Any = jnp.float32
    use_pallas: bool = False
    subpixel_mode: str = "none"
    rgb_pad: int = 0
    fused_seed: bool = False

    @classmethod
    def from_config(cls, cfg: ModelConfig, **overrides: Any) -> "GeneratorLIS":
        kw = dict(
            image_size=cfg.image_size,
            code_size=cfg.code_size,
            r_iterations=cfg.r_iterations,
            norm=cfg.norm,
            num_features=cfg.num_features,
            max_features=cfg.max_features,
            lis_hidden_mult=cfg.lis_hidden_mult,
            spatial_code=cfg.spatial_code,
            include_initial_image=cfg.include_initial_image,
            dtype=jnp.dtype(cfg.dtype),
            use_pallas=getattr(cfg, "use_pallas", False),
        )
        kw.update(overrides)
        return cls(**kw)

    @property
    def n_stages(self) -> int:
        if self.r_iterations == 0:
            return 1
        return self.r_iterations + (1 if self.include_initial_image else 0)

    def spatial_noise_shape(self, batch: int) -> Optional[Tuple[int, ...]]:
        if self.spatial_code == 0:
            return None
        s0, _ = generator_plan(self.image_size)
        return (batch, 2 * s0, 2 * s0, self.spatial_code)

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        spatial_noise: Optional[jnp.ndarray] = None,
        train: bool = True,
        render_all_stages: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        batch = z.shape[0]
        zs: List[jnp.ndarray] = [z]
        for i in range(self.r_iterations):
            z = LISModule(
                code_size=self.code_size,
                hidden_mult=self.lis_hidden_mult,
                norm=self.norm,
                dtype=self.dtype,
                use_pallas=self.use_pallas,
                name=f"lis{i}",
            )(z)
            zs.append(z)

        if self.r_iterations == 0:
            render = [zs[0]]
        elif render_all_stages or self.include_initial_image:
            render = zs
        else:
            render = zs[1:]

        n_render = len(render)
        stacked = jnp.concatenate(render, axis=0)  # (S*B, code)

        sn = None
        if self.spatial_code > 0:
            if spatial_noise is None:
                raise ValueError("spatial_code > 0 requires spatial_noise")
            sn = jnp.tile(spatial_noise, (n_render, 1, 1, 1))

        core = GeneratorCore(
            image_size=self.image_size,
            code_size=self.code_size,
            norm=self.norm,
            num_features=self.num_features,
            max_features=self.max_features,
            spatial_code=self.spatial_code,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            subpixel_mode=self.subpixel_mode,
            rgb_pad=self.rgb_pad,
            fused_seed=self.fused_seed,
            name="core",
        )
        images = core(stacked, spatial_noise=sn, train=train)
        images = images.reshape(n_render, batch, *images.shape[1:])
        return images, jnp.stack(zs, axis=0)

    def render(
        self,
        variables: Any,
        z: jnp.ndarray,
        spatial_noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Inference-mode render of ALL stages (z0..zN) — the samplers'
        per-stage progression view (reference C6/C13). Images are returned
        in float32 for host-side grid writing."""
        images, zs = self.apply(
            variables,
            z,
            spatial_noise=spatial_noise,
            train=False,
            render_all_stages=True,
        )
        return images.astype(jnp.float32), zs
