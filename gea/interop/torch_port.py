"""Torch mirrors of the gea models + exact state converters.

The reference persists its models as `torch.save(state_dict)` files
(upstream `*/train*.py`, SURVEY.md C10). The rebuild's checkpoints are
orbax pytrees; this module provides the bridge in both directions:

* ``TorchGeneratorLIS`` / ``TorchDiscriminator`` / ``TorchReverter`` —
  standard ``nn.Module``s (classic ``weight_norm`` parametrization with
  ``weight_v``/``weight_g`` keys, per-OUTPUT-channel norm to match
  gea/ops/layers.py) that replay the exact gea math in torch.
* ``*_to_torch_state(params, ...)`` — flax param pytree -> torch
  state_dict (HWIO -> OIHW/IOHW transposes, weight-norm v/g mapping).
* ``*_params_from_torch(state_dict, ...)`` — the inverse.

Same weights => same images, pinned by tests/test_interop.py golden tests.

Layout conventions converted here:

| gea (flax)                        | torch                               |
|-----------------------------------|-------------------------------------|
| Dense kernel (in, out)            | Linear.weight (out, in)             |
| Conv kernel HWIO (kh,kw,in,out)   | Conv2d.weight (out, in, kh, kw)     |
| ConvT kernel HWIO (kh,kw,in,out)  | ConvTranspose2d.weight (in,out,kh,kw)|
| scale (out,) [per-out wn]         | weight_g broadcast over non-out dims|
| TPReLU slope/translation          | TPReLU.a / TPReLU.b                 |

Weight norm is per output channel everywhere (torch ``weight_norm`` dim=0
for Linear/Conv2d, dim=1 for ConvTranspose2d). Only ``--norm weight`` and
``--norm none`` convert; ``--norm batch`` has running statistics living in
a different collection and is rejected with a clear error.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Optional

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from gea.models.generator import generator_plan


def _t(x) -> torch.Tensor:
    # np.array (copy) rather than asarray: jax buffers are non-writable
    # and torch.from_numpy on them trips undefined-behavior warnings.
    return torch.from_numpy(np.array(x, np.float32))


def _check_norm(norm: str) -> bool:
    if norm == "batch":
        raise ValueError(
            "checkpoint conversion supports --norm weight|none; batch-norm "
            "models keep running statistics in a separate flax collection "
            "with no stable torch key mapping"
        )
    return norm == "weight"


def _wn(mod: nn.Module, dim: int) -> nn.Module:
    # Classic parametrization: state_dict keys weight_v / weight_g, the
    # same surface the 2017-era reference checkpoints used.
    return nn.utils.weight_norm(mod, dim=dim)


class TorchTPReLU(nn.Module):
    """y = PReLU_a(x - b) + b, per-channel a/b (gea/ops/layers.py TPReLU)."""

    def __init__(self, ch: int):
        super().__init__()
        self.a = nn.Parameter(torch.full((ch,), 0.25))
        self.b = nn.Parameter(torch.zeros(ch))

    def forward(self, x):
        shape = (1, -1) + (1,) * (x.dim() - 2)
        a = self.a.view(shape)
        b = self.b.view(shape)
        s = x - b
        return torch.where(s >= 0, s, a * s) + b


def _act(wn: bool, ch: int) -> nn.Module:
    return TorchTPReLU(ch) if wn else nn.LeakyReLU(0.2)


class TorchLIS(nn.Module):
    def __init__(self, code: int, hidden: int, wn: bool):
        super().__init__()
        fc1 = nn.Linear(code, hidden)
        fc2 = nn.Linear(hidden, code)
        self.fc1 = _wn(fc1, 0) if wn else fc1
        self.act = _act(wn, hidden)
        self.fc2 = _wn(fc2, 0) if wn else fc2

    def forward(self, z):
        return z + self.fc2(self.act(self.fc1(z)))


class TorchUpBlock(nn.Module):
    def __init__(self, cin: int, cout: int, wn: bool):
        super().__init__()
        conv = nn.ConvTranspose2d(cin, cout, 4, 2, 1)
        self.conv = _wn(conv, 1) if wn else conv
        self.act = _act(wn, cout)

    def forward(self, x):
        return self.act(self.conv(x))


class TorchGeneratorLIS(nn.Module):
    """Replays GeneratorLIS (gea/models/generator.py) in torch: LIS chain +
    Dense projection to an s0 x s0 seed map + stride-2 conv-transpose
    upsampling + tanh, per-stage images stacked on a leading axis."""

    def __init__(self, cfg):
        super().__init__()
        wn = _check_norm(cfg.norm)
        self.cfg = cfg
        s0, d = generator_plan(cfg.image_size)
        self.s0, self.d = s0, d
        nf, cap = cfg.num_features, cfg.max_features
        hidden = cfg.code_size * getattr(cfg, "lis_hidden_mult", 1)
        self.lis = nn.ModuleList(
            TorchLIS(cfg.code_size, hidden, wn) for _ in range(cfg.r_iterations)
        )
        c0 = min(nf * 2 ** (d - 1), cap)
        proj = nn.Linear(cfg.code_size, s0 * s0 * c0)
        self.project = _wn(proj, 0) if wn else proj
        self.project_act = _act(wn, c0)
        self.c0 = c0
        ups, ch = [], c0
        for i in range(1, d):
            ci = min(nf * 2 ** (d - 1 - i), cap)
            cin = ch + (cfg.spatial_code if i == 2 else 0)
            ups.append(TorchUpBlock(cin, ci, wn))
            ch = ci
        self.ups = nn.ModuleList(ups)
        rgb_in = ch + (cfg.spatial_code if d == 2 else 0)
        to_rgb = nn.ConvTranspose2d(rgb_in, 3, 4, 2, 1)
        self.to_rgb = _wn(to_rgb, 1) if wn else to_rgb

    def render(self, z, spatial_noise=None):
        """z (N, code) -> image (N, 3, H, W); the conv core."""
        x = self.project(z)
        # flax reshapes NHWC (B, s0, s0, c0) with channels fastest.
        x = x.view(z.shape[0], self.s0, self.s0, self.c0).permute(0, 3, 1, 2)
        x = self.project_act(x)
        for i, up in enumerate(self.ups, start=1):
            x = up(x)
            if i == 1 and self.cfg.spatial_code > 0:
                if spatial_noise is None:
                    raise ValueError("spatial_code > 0 requires spatial_noise")
                x = torch.cat([x, spatial_noise], dim=1)
        return torch.tanh(self.to_rgb(x))

    def forward(self, z, spatial_noise=None, render_all_stages=True):
        """Returns (images, zs): images (S, B, 3, H, W), zs (N+1, B, code) —
        the gea __call__ contract in NCHW."""
        zs = [z]
        for m in self.lis:
            zs.append(m(zs[-1]))
        if not self.lis:
            render = [zs[0]]
        elif render_all_stages or self.cfg.include_initial_image:
            render = zs
        else:
            render = zs[1:]
        stacked = torch.cat(render, dim=0)
        sn = (
            spatial_noise.repeat(len(render), 1, 1, 1)
            if spatial_noise is not None
            else None
        )
        imgs = self.render(stacked, sn)
        return (
            imgs.view(len(render), z.shape[0], *imgs.shape[1:]),
            torch.stack(zs),
        )


class TorchDownBlock(nn.Module):
    def __init__(self, cin: int, cout: int, wn: bool, first: bool):
        super().__init__()
        conv = nn.Conv2d(cin, cout, 4, 2, 1)
        self.conv = _wn(conv, 0) if wn else conv
        self.act = nn.LeakyReLU(0.2) if first else _act(wn, cout)

    def forward(self, x):
        return self.act(self.conv(x))


class TorchTrunk(nn.Module):
    """DiscriminatorTrunk mirror: image (B,3,H,W) -> flat features, with
    the flax NHWC flatten order (h, w, c)."""

    def __init__(self, cfg):
        super().__init__()
        wn = _check_norm(cfg.norm)
        s0, d = generator_plan(cfg.image_size)
        nf, cap = cfg.num_features, cfg.max_features
        downs, ch = [], 3
        for i in range(d):
            ci = min(nf * 2**i, cap)
            downs.append(TorchDownBlock(ch, ci, wn, first=i == 0))
            ch = ci
        self.downs = nn.ModuleList(downs)
        self.out_features = ch * s0 * s0

    def forward(self, x):
        for blk in self.downs:
            x = blk(x)
        return x.permute(0, 2, 3, 1).flatten(1)  # NHWC flatten parity


class TorchDiscriminator(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        wn = _check_norm(cfg.norm)
        self.trunk = TorchTrunk(cfg)
        head = nn.Linear(self.trunk.out_features, 1)
        self.head = _wn(head, 0) if wn else head

    def forward(self, x):
        return self.head(self.trunk(x)).squeeze(-1)


class TorchReverter(nn.Module):
    def __init__(self, cfg, hidden: Optional[int] = None):
        super().__init__()
        wn = _check_norm(cfg.norm)
        hidden = hidden or getattr(cfg, "r_hidden", 512)
        self.trunk = TorchTrunk(cfg)
        fc1 = nn.Linear(self.trunk.out_features, hidden)
        fc2 = nn.Linear(hidden, cfg.code_size)
        self.fc1 = _wn(fc1, 0) if wn else fc1
        self.act = _act(wn, hidden)
        self.fc2 = _wn(fc2, 0) if wn else fc2

    def forward(self, x):
        return self.fc2(self.act(self.fc1(self.trunk(x))))


# ------------------------------------------------------------- converters


def _dense_to_torch(out: OrderedDict, prefix: str, p: Dict, wn: bool) -> None:
    k = _t(p["kernel"]).T.contiguous()  # (in,out) -> (out,in)
    if wn:
        out[prefix + ".weight_v"] = k
        out[prefix + ".weight_g"] = _t(p["scale"]).view(-1, 1)
    else:
        out[prefix + ".weight"] = k
    out[prefix + ".bias"] = _t(p["bias"])


def _dense_from_torch(sd: Dict, prefix: str, wn: bool) -> Dict:
    if wn:
        v = sd[prefix + ".weight_v"]
        g = sd[prefix + ".weight_g"].reshape(-1)
        return {
            "kernel": v.T.contiguous().numpy(),
            "scale": g.numpy(),
            "bias": sd[prefix + ".bias"].numpy(),
        }
    return {
        "kernel": sd[prefix + ".weight"].T.contiguous().numpy(),
        "bias": sd[prefix + ".bias"].numpy(),
    }


def _conv_to_torch(out: OrderedDict, prefix: str, p: Dict, wn: bool) -> None:
    # HWIO (kh,kw,in,out) -> OIHW (out,in,kh,kw)
    k = _t(p["kernel"]).permute(3, 2, 0, 1).contiguous()
    if wn:
        out[prefix + ".weight_v"] = k
        out[prefix + ".weight_g"] = _t(p["scale"]).view(-1, 1, 1, 1)
    else:
        out[prefix + ".weight"] = k
    out[prefix + ".bias"] = _t(p["bias"])


def _conv_from_torch(sd: Dict, prefix: str, wn: bool) -> Dict:
    key = prefix + (".weight_v" if wn else ".weight")
    k = sd[key].permute(2, 3, 1, 0).contiguous().numpy()  # OIHW -> HWIO
    p = {"kernel": k, "bias": sd[prefix + ".bias"].numpy()}
    if wn:
        p["scale"] = sd[prefix + ".weight_g"].reshape(-1).numpy()
    return p


def _convt_to_torch(out: OrderedDict, prefix: str, p: Dict, wn: bool) -> None:
    # HWIO (kh,kw,in,out) -> torch ConvT (in,out,kh,kw)
    k = _t(p["kernel"]).permute(2, 3, 0, 1).contiguous()
    if wn:
        out[prefix + ".weight_v"] = k
        out[prefix + ".weight_g"] = _t(p["scale"]).view(1, -1, 1, 1)
    else:
        out[prefix + ".weight"] = k
    out[prefix + ".bias"] = _t(p["bias"])


def _convt_from_torch(sd: Dict, prefix: str, wn: bool) -> Dict:
    key = prefix + (".weight_v" if wn else ".weight")
    k = sd[key].permute(2, 3, 0, 1).contiguous().numpy()  # (in,out,kh,kw) -> HWIO
    p = {"kernel": k, "bias": sd[prefix + ".bias"].numpy()}
    if wn:
        p["scale"] = sd[prefix + ".weight_g"].reshape(-1).numpy()
    return p


def _tprelu_to_torch(out: OrderedDict, prefix: str, p: Dict) -> None:
    out[prefix + ".a"] = _t(p["slope"])
    out[prefix + ".b"] = _t(p["translation"])


def _tprelu_from_torch(sd: Dict, prefix: str) -> Dict:
    return {
        "slope": sd[prefix + ".a"].numpy(),
        "translation": sd[prefix + ".b"].numpy(),
    }


def _lis_to_torch(out: OrderedDict, prefix: str, p: Dict, wn: bool) -> None:
    _dense_to_torch(
        out, prefix + ".fc1",
        {"kernel": p["fc1_kernel"], "bias": p["fc1_bias"],
         **({"scale": p["fc1_scale"]} if wn else {})},
        wn,
    )
    if wn:
        _tprelu_to_torch(
            out, prefix + ".act",
            {"slope": p["slope"], "translation": p["translation"]},
        )
    _dense_to_torch(
        out, prefix + ".fc2",
        {"kernel": p["fc2_kernel"], "bias": p["fc2_bias"],
         **({"scale": p["fc2_scale"]} if wn else {})},
        wn,
    )


def _lis_from_torch(sd: Dict, prefix: str, wn: bool) -> Dict:
    fc1 = _dense_from_torch(sd, prefix + ".fc1", wn)
    fc2 = _dense_from_torch(sd, prefix + ".fc2", wn)
    p = {
        "fc1_kernel": fc1["kernel"],
        "fc1_bias": fc1["bias"],
        "fc2_kernel": fc2["kernel"],
        "fc2_bias": fc2["bias"],
    }
    if wn:
        p["fc1_scale"] = fc1["scale"]
        p["fc2_scale"] = fc2["scale"]
        act = _tprelu_from_torch(sd, prefix + ".act")
        p["slope"] = act["slope"]
        p["translation"] = act["translation"]
    return p


def generator_to_torch_state(params: Dict, cfg) -> OrderedDict:
    """GeneratorLIS flax params -> TorchGeneratorLIS state_dict."""
    wn = _check_norm(cfg.norm)
    out: OrderedDict = OrderedDict()
    for i in range(cfg.r_iterations):
        _lis_to_torch(out, f"lis.{i}", params[f"lis{i}"], wn)
    core = params["core"]
    _dense_to_torch(out, "project", core["project"], wn)
    if wn:
        _tprelu_to_torch(out, "project_act", core["project_act"]["TPReLU_0"])
    _, d = generator_plan(cfg.image_size)
    for i in range(1, d):
        _convt_to_torch(out, f"ups.{i - 1}.conv", core[f"up{i}"], wn)
        if wn:
            _tprelu_to_torch(
                out, f"ups.{i - 1}.act", core[f"up{i}_act"]["TPReLU_0"]
            )
    _convt_to_torch(out, "to_rgb", core["to_rgb"], wn)
    return out


def generator_params_from_torch(sd: Dict, cfg) -> Dict:
    wn = _check_norm(cfg.norm)
    params: Dict[str, Any] = {}
    for i in range(cfg.r_iterations):
        params[f"lis{i}"] = _lis_from_torch(sd, f"lis.{i}", wn)
    core: Dict[str, Any] = {"project": _dense_from_torch(sd, "project", wn)}
    if wn:
        core["project_act"] = {
            "TPReLU_0": _tprelu_from_torch(sd, "project_act")
        }
    _, d = generator_plan(cfg.image_size)
    for i in range(1, d):
        core[f"up{i}"] = _convt_from_torch(sd, f"ups.{i - 1}.conv", wn)
        if wn:
            core[f"up{i}_act"] = {
                "TPReLU_0": _tprelu_from_torch(sd, f"ups.{i - 1}.act")
            }
    core["to_rgb"] = _convt_from_torch(sd, "to_rgb", wn)
    params["core"] = core
    return params


def _trunk_to_torch(out: OrderedDict, prefix: str, p: Dict, cfg, wn: bool):
    _, d = generator_plan(cfg.image_size)
    for i in range(d):
        _conv_to_torch(out, f"{prefix}.downs.{i}.conv", p[f"down{i}"], wn)
        if i > 0 and wn:
            _tprelu_to_torch(
                out, f"{prefix}.downs.{i}.act", p[f"down{i}_act"]["TPReLU_0"]
            )


def _trunk_from_torch(sd: Dict, prefix: str, cfg, wn: bool) -> Dict:
    _, d = generator_plan(cfg.image_size)
    p: Dict[str, Any] = {}
    for i in range(d):
        p[f"down{i}"] = _conv_from_torch(sd, f"{prefix}.downs.{i}.conv", wn)
        if i > 0 and wn:
            p[f"down{i}_act"] = {
                "TPReLU_0": _tprelu_from_torch(sd, f"{prefix}.downs.{i}.act")
            }
    return p


def discriminator_to_torch_state(params: Dict, cfg) -> OrderedDict:
    wn = _check_norm(cfg.norm)
    out: OrderedDict = OrderedDict()
    _trunk_to_torch(out, "trunk", params["trunk"], cfg, wn)
    _dense_to_torch(out, "head", params["head"], wn)
    return out


def discriminator_params_from_torch(sd: Dict, cfg) -> Dict:
    wn = _check_norm(cfg.norm)
    return {
        "trunk": _trunk_from_torch(sd, "trunk", cfg, wn),
        "head": _dense_from_torch(sd, "head", wn),
    }


def reverter_to_torch_state(params: Dict, cfg) -> OrderedDict:
    wn = _check_norm(cfg.norm)
    out: OrderedDict = OrderedDict()
    _trunk_to_torch(out, "trunk", params["trunk"], cfg, wn)
    _dense_to_torch(out, "fc1", params["fc1"], wn)
    if wn:
        _tprelu_to_torch(out, "act", params["act"])
    _dense_to_torch(out, "fc2", params["fc2"], wn)
    return out


def reverter_params_from_torch(sd: Dict, cfg) -> Dict:
    wn = _check_norm(cfg.norm)
    p: Dict[str, Any] = {
        "trunk": _trunk_from_torch(sd, "trunk", cfg, wn),
        "fc1": _dense_from_torch(sd, "fc1", wn),
        "fc2": _dense_from_torch(sd, "fc2", wn),
    }
    if wn:
        p["act"] = _tprelu_from_torch(sd, "act")
    return p
