"""Measure the PyTorch reference's training throughput on this host.

The reference publishes no numbers (BASELINE.md) and cannot run unmodified
here (it imports smart_open/torchvision, absent from this image), so this
script reproduces its measured workload from the structural analysis in
SURVEY.md: the `trainers.cnn` train_batch (SA-GAN residual G/D at config
'128', BCE-with-logits + R1 penalty, Adam betas (0, 0.999), EMA target G)
in plain torch, and times images/sec.

Writes BASELINE_MEASURED.json, which bench.py uses for ``vs_baseline``.
Note: this machine has no CUDA device, so the measurement is torch-CPU; the
reference's own Dockerfile targets CUDA, so treat the ratio accordingly.
"""
from __future__ import annotations

import json
import time

import torch
import torch.nn.functional as TF
from torch import nn

CONFIG_128 = dict(latent=256, blocks=(128, 128, 64, 32, 16), base=4)


class GBlock(nn.Module):
    def __init__(self, cin, cout, first=False):
        super().__init__()
        self.first = first
        self.n1 = nn.BatchNorm2d(cin)
        self.c1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.n2 = nn.BatchNorm2d(cout)
        self.c2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.proj = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        x = TF.interpolate(x, scale_factor=2, mode="nearest")
        h = x
        if not self.first:
            h = TF.leaky_relu(self.n1(h), 0.2)
        h = self.c1(h)
        h = TF.leaky_relu(self.n2(h), 0.2)
        h = self.c2(h)
        if self.proj is not None:
            x = self.proj(x)
        return x + h


class DBlock(nn.Module):
    def __init__(self, cin, cout, first=False):
        super().__init__()
        self.first = first
        self.n1 = nn.BatchNorm2d(cin)
        self.c1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.n2 = nn.BatchNorm2d(cout)
        self.c2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.proj = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = x
        if not self.first:
            h = TF.leaky_relu(self.n1(h), 0.2)
        h = self.c1(h)
        h = TF.leaky_relu(self.n2(h), 0.2)
        h = TF.avg_pool2d(self.c2(h), 2)
        x = TF.interpolate(x, scale_factor=0.5, mode="bilinear",
                           align_corners=True)
        if self.proj is not None:
            x = self.proj(x)
        return x + h


class G(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        blocks = cfg["blocks"]
        self.base = cfg["base"]
        self.c0 = blocks[0]
        self.inp = nn.Linear(cfg["latent"], self.base ** 2 * blocks[0])
        mods, cin = [], blocks[0]
        for i, cout in enumerate(blocks):
            mods.append(GBlock(cin, cout, first=(i == 0)))
            cin = cout
        self.blocks = nn.Sequential(*mods)
        self.out_n = nn.BatchNorm2d(cin)
        self.out_c = nn.Conv2d(cin, 3, 1)

    def forward(self, z):
        x = TF.leaky_relu(self.inp(z), 0.2)
        x = x.view(-1, self.c0, self.base, self.base)
        x = self.blocks(x)
        return torch.tanh(self.out_c(TF.leaky_relu(self.out_n(x), 0.2)))


class D(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        blocks = cfg["blocks"]
        self.inp = nn.Conv2d(3, blocks[-1], 1)
        mods, cin = [], blocks[-1]
        for i, cout in enumerate(reversed(blocks)):
            mods.append(DBlock(cin, cout, first=(i == 0)))
            cin = cout
        self.blocks = nn.Sequential(*mods)
        self.out_n = nn.BatchNorm2d(cin)
        self.out_l = nn.Linear(cin, 1)

    def forward(self, x):
        x = self.inp(x)
        x = self.blocks(x)
        x = TF.leaky_relu(self.out_n(x), 0.2)
        return self.out_l(x.sum(dim=(2, 3)))


def train_batch(g, d, opt_g, opt_d, target_g, imgs, latent, gp_w=5.0,
                ema=1e-3):
    bce = nn.BCEWithLogitsLoss()
    bsz = imgs.shape[0]
    # D step with R1
    opt_d.zero_grad()
    z = torch.randn(bsz, latent)
    fake = g(z).detach()
    real = imgs.requires_grad_()
    p_real = d(real)
    p_fake = d(fake)
    p = torch.cat([p_real, p_fake], 0)
    labels = torch.cat([torch.ones(bsz, 1), torch.zeros(bsz, 1)], 0)
    d_loss = bce(p, labels)
    grad = torch.autograd.grad(p_real.sum(), real, create_graph=True,
                               retain_graph=True)[0]
    d_loss = d_loss + gp_w * grad.pow(2).view(bsz, -1).sum(1).mean()
    d_loss.backward()
    opt_d.step()
    # G step
    opt_g.zero_grad()
    z = torch.randn(bsz, latent)
    p = d(g(z))
    g_loss = bce(p, torch.ones(bsz, 1))
    g_loss.backward()
    opt_g.step()
    # EMA
    with torch.no_grad():
        for pg, pt in zip(g.parameters(), target_g.parameters()):
            pt.add_((pg - pt) * ema)


def main(batch_size=16, steps=3, warmup=1):
    torch.manual_seed(0)
    cfg = CONFIG_128
    g, d, tg = G(cfg), D(cfg), G(cfg)
    opt_g = torch.optim.Adam(g.parameters(), lr=1e-4, betas=(0.0, 0.999))
    opt_d = torch.optim.Adam(d.parameters(), lr=4e-4, betas=(0.0, 0.999))
    size = cfg["base"] * 2 ** len(cfg["blocks"])
    imgs = torch.rand(batch_size, 3, size, size) * 2 - 1

    for _ in range(warmup):
        train_batch(g, d, opt_g, opt_d, tg, imgs, cfg["latent"])
    t0 = time.perf_counter()
    for _ in range(steps):
        train_batch(g, d, opt_g, opt_d, tg, imgs, cfg["latent"])
    dt = time.perf_counter() - t0
    rate = batch_size * steps / dt
    out = {
        "images_per_sec": rate,
        "device": "cpu" if not torch.cuda.is_available() else "cuda",
        "batch_size": batch_size,
        "steps": steps,
        "workload": "reference trainers.cnn train_batch, config '128', "
                    "BCE+R1+EMA",
    }
    with open("BASELINE_MEASURED.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
