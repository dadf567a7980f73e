"""Measured PyTorch reference baseline (SURVEY.md §6: the reference
publishes NO quantitative benchmarks, so the build must create one).

This is a from-scratch PyTorch implementation of the same flagship
workload benched by bench.py — G-LIS generator (3 residual LIS modules +
DCGAN conv-transpose core, weight norm, TPReLU), DCGAN discriminator, BCE
objectives, alternating D-then-G Adam steps at 80x80 — written against the
architecture spec in gea/models (NOT copied from the upstream repo). It
represents "what the reference implementation's design costs in PyTorch on
the hardware available in this image" (torch 2.x CPU build; no CUDA/A100
is present — see BASELINE.md).

Writes BASELINE_MEASURED.json at the repo root; bench.py reads it for its
vs_baseline field.

Run:  python benchmarks/torch_reference.py [--batch 32] [--steps 4]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import torch
import torch.nn as nn
import torch.nn.functional as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

IMAGE_SIZE = 80
CODE_SIZE = 256
NF, CAP = 64, 512
R_ITERATIONS = 3
STAGES = R_ITERATIONS + 1
STAGE_W = [0.2, 0.4667, 0.7333, 1.0]
STAGE_W = [w / sum(STAGE_W) for w in STAGE_W]


def wn(mod: nn.Module) -> nn.Module:
    return nn.utils.weight_norm(mod)


class TPReLU(nn.Module):
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


class LIS(nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = wn(nn.Linear(CODE_SIZE, CODE_SIZE))
        self.act = TPReLU(CODE_SIZE)
        self.fc2 = wn(nn.Linear(CODE_SIZE, CODE_SIZE))

    def forward(self, z):
        return z + self.fc2(self.act(self.fc1(z)))


class Generator(nn.Module):
    """z -> per-stage images; same plan as gea: 5x5 seed, 4 doublings."""

    def __init__(self):
        super().__init__()
        self.lis = nn.ModuleList([LIS() for _ in range(R_ITERATIONS)])
        c0 = min(NF * 8, CAP)
        self.project = wn(nn.Linear(CODE_SIZE, 5 * 5 * c0))
        self.project_act = TPReLU(c0)
        ups, ch = [], c0
        for i in range(1, 4):
            ci = min(NF * 2 ** (3 - i), CAP)
            ups += [wn(nn.ConvTranspose2d(ch, ci, 4, 2, 1)), TPReLU(ci)]
            ch = ci
        self.ups = nn.Sequential(*ups)
        self.to_rgb = wn(nn.ConvTranspose2d(ch, 3, 4, 2, 1))

    def render(self, z):
        x = self.project(z).view(z.shape[0], -1, 5, 5)
        x = self.project_act(x)
        x = self.ups(x)
        return torch.tanh(self.to_rgb(x))

    def forward(self, z):
        zs = [z]
        for m in self.lis:
            zs.append(m(zs[-1]))
        stacked = torch.cat(zs, dim=0)
        imgs = self.render(stacked)
        return imgs.view(STAGES, z.shape[0], *imgs.shape[1:])


class Discriminator(nn.Module):
    def __init__(self):
        super().__init__()
        layers, ch = [], 3
        for i in range(4):
            ci = min(NF * 2**i, CAP)
            layers.append(wn(nn.Conv2d(ch, ci, 4, 2, 1)))
            layers.append(
                nn.LeakyReLU(0.2) if i == 0 else TPReLU(ci)
            )
            ch = ci
        self.conv = nn.Sequential(*layers)
        self.head = wn(nn.Linear(ch * 5 * 5, 1))

    def forward(self, x):
        h = self.conv(x).flatten(1)
        return self.head(h).squeeze(-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()
    if args.threads:
        torch.set_num_threads(args.threads)

    dev = "cuda" if torch.cuda.is_available() else "cpu"
    g = Generator().to(dev)
    d = Discriminator().to(dev)
    opt_g = torch.optim.Adam(g.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_d = torch.optim.Adam(d.parameters(), lr=2e-4, betas=(0.5, 0.999))
    real = torch.rand(args.batch, 3, IMAGE_SIZE, IMAGE_SIZE, device=dev) * 2 - 1
    w = torch.tensor(STAGE_W, device=dev)

    def step():
        z = torch.randn(args.batch, CODE_SIZE, device=dev)
        fakes = g(z)
        # D step (fakes detached)
        opt_d.zero_grad(set_to_none=True)
        logits_real = d(real)
        flat = fakes.detach().reshape(-1, 3, IMAGE_SIZE, IMAGE_SIZE)
        logits_fake = d(flat).view(STAGES, args.batch)
        loss_d = F.binary_cross_entropy_with_logits(
            logits_real, torch.ones_like(logits_real)
        ) + (
            w
            * F.binary_cross_entropy_with_logits(
                logits_fake, torch.zeros_like(logits_fake), reduction="none"
            ).mean(dim=1)
        ).sum()
        loss_d.backward()
        opt_d.step()
        # G step vs updated D (fresh forward, matching the jax step)
        opt_g.zero_grad(set_to_none=True)
        fakes2 = g(z)
        logits = d(fakes2.reshape(-1, 3, IMAGE_SIZE, IMAGE_SIZE)).view(
            STAGES, args.batch
        )
        loss_g = (
            w
            * F.binary_cross_entropy_with_logits(
                logits, torch.ones_like(logits), reduction="none"
            ).mean(dim=1)
        ).sum()
        loss_g.backward()
        opt_g.step()
        return float(loss_d), float(loss_g)

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = time.perf_counter() - t0
    ips = args.batch * args.steps / dt

    out = {
        "torch_reference_images_per_sec": round(ips, 2),
        "device": dev,
        "torch_version": torch.__version__,
        "batch": args.batch,
        "steps": args.steps,
        "config": "G-LIS-3 80x80 weight-norm G+D alternating step",
        "note": (
            "reference-equivalent PyTorch workload measured on the only "
            "torch device in this image (CPU); see BASELINE.md"
        ),
    }
    with open(os.path.join(REPO, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
