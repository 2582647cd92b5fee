"""End-to-end forward parity: our flax G/D vs a torch transliteration of the
reference architecture, with weights transplanted from flax to torch.

This is the decisive architecture check: if any conv padding, resample
semantics, normalization or layer ordering differed from the reference
design, outputs would diverge. Uses train-mode BatchNorm (batch stats), the
mode the reference always runs in (SURVEY.md 2 quirks).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.configs import GANConfig
from tartangan_tpu.models import factories as F
from tartangan_tpu.models.pluggan import Discriminator, Generator

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402
from torch import nn  # noqa: E402

CFG = GANConfig(base_size=4, latent_dims=8, data_dims=3, blocks=(8, 6),
                num_blocks_per_scale=1)


def _t(x):
    return torch.from_numpy(np.ascontiguousarray(x))


def conv_from_flax(p, in_ch, out_ch, k):
    conv = nn.Conv2d(in_ch, out_ch, k, padding=k // 2)
    with torch.no_grad():
        # flax HWIO -> torch OIHW
        conv.weight.copy_(_t(np.transpose(p["kernel"], (3, 2, 0, 1))))
        conv.bias.copy_(_t(p["bias"]))
    return conv


def bn_from_flax(p, ch):
    bn = nn.BatchNorm2d(ch)
    with torch.no_grad():
        bn.weight.copy_(_t(p["scale"]))
        bn.bias.copy_(_t(p["bias"]))
    bn.train()
    return bn


class TorchResGBlock(nn.Module):
    def __init__(self, params, cin, cout, first):
        super().__init__()
        self.first = first
        self.c1 = conv_from_flax(params["Conv_0"], cin, cout, 3)
        self.c2 = conv_from_flax(params["Conv_1"], cout, cout, 3)
        idx = 0
        if not first:
            self.n1 = bn_from_flax(params["NormAct_0"]["BatchNorm_0"]
                                   ["BatchNorm_0"], cin)
            idx = 1
        self.n2 = bn_from_flax(
            params[f"NormAct_{idx}"]["BatchNorm_0"]["BatchNorm_0"], cout)
        self.proj = None
        if cin != cout:
            self.proj = conv_from_flax(params["project_input"], cin, cout, 1)

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


class TorchResDBlock(nn.Module):
    def __init__(self, params, cin, cout, first):
        super().__init__()
        self.first = first
        self.c1 = conv_from_flax(params["Conv_0"], cin, cout, 3)
        self.c2 = conv_from_flax(params["Conv_1"], cout, cout, 3)
        idx = 0
        if not first:
            self.n1 = bn_from_flax(params["NormAct_0"]["BatchNorm_0"]
                                   ["BatchNorm_0"], cin)
            idx = 1
        self.n2 = bn_from_flax(
            params[f"NormAct_{idx}"]["BatchNorm_0"]["BatchNorm_0"], cout)
        self.proj = None
        if cin != cout:
            self.proj = conv_from_flax(params["project_input"], cin, cout, 1)

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


def test_generator_forward_parity(rng):
    g = Generator(
        CFG,
        input_factory=F.g_input_factory("mlp", "relu"),
        block_factory=F.g_block_factory("bn", "relu"),
        output_factory=F.g_output_factory("bn", "relu"),
    )
    z = rng.standard_normal((4, CFG.latent_dims)).astype(np.float32)
    variables = g.init(jax.random.PRNGKey(0), jnp.asarray(z), train=True)
    ours, _ = g.apply(variables, jnp.asarray(z), train=True,
                      mutable=["batch_stats"])
    p = jax.device_get(variables["params"])

    # --- torch side with transplanted weights
    size, c0 = CFG.base_size, CFG.blocks[0]
    lin = nn.Linear(CFG.latent_dims, size * size * c0)
    dp = p["input_block"]["Dense_0"]
    with torch.no_grad():
        lin.weight.copy_(_t(dp["kernel"].T))
        lin.bias.copy_(_t(dp["bias"]))

    blk0 = TorchResGBlock(p["blocks_0"], CFG.blocks[0], CFG.blocks[0], True)
    blk1 = TorchResGBlock(p["blocks_1"], CFG.blocks[0], CFG.blocks[1], False)
    out_bn = bn_from_flax(
        p["output_block"]["NormAct_0"]["BatchNorm_0"]["BatchNorm_0"],
        CFG.blocks[1])
    out_conv = conv_from_flax(p["output_block"]["Conv_0"],
                              CFG.blocks[1], CFG.data_dims, 1)

    with torch.no_grad():
        h = TF.leaky_relu(lin(_t(z)), 0.2)
        # flax reshape is (B, H, W, C); torch works NCHW
        h = h.view(-1, size, size, c0).permute(0, 3, 1, 2)
        h = blk1(blk0(h))
        h = torch.tanh(out_conv(TF.leaky_relu(out_bn(h), 0.2)))
        theirs = h.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs,
                               rtol=1e-3, atol=1e-4)


def test_discriminator_forward_parity(rng):
    d = Discriminator(
        CFG,
        block_factory=F.d_block_factory("bn", "relu"),
        output_factory=F.d_output_factory("bn", "relu"),
    )
    x = rng.standard_normal(
        (4, CFG.max_size, CFG.max_size, 3)).astype(np.float32) * 0.5
    variables = d.init(jax.random.PRNGKey(0), jnp.asarray(x), train=True)
    ours, _ = d.apply(variables, jnp.asarray(x), train=True,
                      mutable=["batch_stats"])
    p = jax.device_get(variables["params"])

    in_conv = conv_from_flax(p["input_block"]["Conv_0"], 3, CFG.blocks[-1], 1)
    blk0 = TorchResDBlock(p["blocks_0"], CFG.blocks[1], CFG.blocks[1], True)
    blk1 = TorchResDBlock(p["blocks_1"], CFG.blocks[1], CFG.blocks[0], False)
    out_bn = bn_from_flax(
        p["output_block"]["NormAct_0"]["BatchNorm_0"]["BatchNorm_0"],
        CFG.blocks[0])
    op = p["output_block"]["Dense_0"]
    out_lin = nn.Linear(CFG.blocks[0], 1)
    with torch.no_grad():
        out_lin.weight.copy_(_t(op["kernel"].T))
        out_lin.bias.copy_(_t(op["bias"]))

    with torch.no_grad():
        h = in_conv(_t(x.transpose(0, 3, 1, 2)))
        h = blk1(blk0(h))
        h = TF.leaky_relu(out_bn(h), 0.2)
        h = h.sum(dim=(2, 3))
        theirs = out_lin(h).numpy()

    np.testing.assert_allclose(np.asarray(ours), theirs,
                               rtol=1e-3, atol=1e-4)
