"""Shared-parameter model family: one global 3x3 filter bank, every block
slices the top-left (in, out) corner.

Parity: reference tartangan/models/shared/blocks.py + shared/pluggan.py.
The bank lives as a single parameter on the model; blocks receive it at call
time and slice with static sizes (``narrow_filters`` shared/blocks.py:124-127
becomes a static slice — free under XLA). Both G and D resample with
bilinear align_corners=True (shared/blocks.py:64-67, 103-117), unlike the
unshared family.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import GANConfig
from ..ops.resize import resize_bilinear
from .attention import SelfAttention2d
from .blocks import (
    DiscriminatorInput,
    DiscriminatorOutput,
    GeneratorInputMLP,
    GeneratorOutput,
    IQNDiscriminatorOutput,
)
from .layers import NormAct

Dtype = Any


def xavier_uniform_relu_gain(key, shape, dtype=jnp.float32):
    """torch ``xavier_uniform_(w, gain=calculate_gain('relu'))`` on an
    HWIO kernel (reference shared/pluggan.py:39-46)."""
    kh, kw, fan_in_c, fan_out_c = shape
    fan_in = kh * kw * fan_in_c
    fan_out = kh * kw * fan_out_c
    gain = np.sqrt(2.0)
    bound = gain * np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def narrow_filters(bank, in_dims: int, out_dims: int):
    """Slice the top-left (3,3,in,out) corner of the HWIO bank."""
    return bank[:, :, :in_dims, :out_dims]


def _conv_with(bank_slice, x, bias=None):
    y = jax.lax.conv_general_dilated(
        x, bank_slice.astype(x.dtype),
        window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class SharedConvBlock(nn.Module):
    """[norm, act,] shared-3x3-conv + own bias (shared/blocks.py:8-40)."""

    in_dims: int
    out_dims: int
    apply_norm: bool = True
    use_bias: bool = True
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bank, train: bool = True):
        if self.apply_norm:
            x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        bias = (self.param("bias", nn.initializers.zeros, (self.out_dims,))
                if self.use_bias else None)
        return _conv_with(
            narrow_filters(bank, self.in_dims, self.out_dims), x, bias)


class SharedResidualGeneratorBlock(nn.Module):
    """bilinear-2x upsample -> two shared convs (+ shared 3x3 'projection'
    when dims change) + residual (shared/blocks.py:43-79)."""

    in_dims: int
    out_dims: int
    apply_norm: bool = True
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bank, train: bool = True):
        _, h, w, _ = x.shape
        x = resize_bilinear(x, h * 2, w * 2, align_corners=True)
        y = SharedConvBlock(self.in_dims, self.out_dims,
                            apply_norm=self.apply_norm, norm=self.norm,
                            activation=self.activation, dtype=self.dtype,
                            )(x, bank, train)
        y = SharedConvBlock(self.out_dims, self.out_dims, apply_norm=True,
                            norm=self.norm, activation=self.activation,
                            dtype=self.dtype)(y, bank, train)
        if self.in_dims != self.out_dims:
            x = _conv_with(
                narrow_filters(bank, self.in_dims, self.out_dims), x)
        return x + y


class SharedResidualDiscriminatorBlock(nn.Module):
    """two shared convs -> bilinear 0.5x; shortcut bilinear 0.5x (+ shared
    projection) (shared/blocks.py:82-121)."""

    in_dims: int
    out_dims: int
    apply_norm: bool = True
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bank, train: bool = True):
        _, h, w, _ = x.shape
        y = SharedConvBlock(self.in_dims, self.out_dims,
                            apply_norm=self.apply_norm, norm=self.norm,
                            activation=self.activation, dtype=self.dtype,
                            )(x, bank, train)
        y = SharedConvBlock(self.out_dims, self.out_dims, apply_norm=True,
                            norm=self.norm, activation=self.activation,
                            dtype=self.dtype)(y, bank, train)
        y = resize_bilinear(y, h // 2, w // 2, align_corners=True)
        x = resize_bilinear(x, h // 2, w // 2, align_corners=True)
        if self.in_dims != self.out_dims:
            x = _conv_with(
                narrow_filters(bank, self.in_dims, self.out_dims), x)
        return x + y


class _SharedBase(nn.Module):
    config: GANConfig
    norm: str = "bn"
    activation: str = "relu"
    g_base: str = "mlp"
    dtype: Dtype = jnp.float32
    # D classes sit under the R1 second-order gradient; the attention
    # kernel's double-nested custom_vjp supports exactly two
    # differentiation levels, so the shared family keeps the fused kernel
    # too (models/pluggan.py has the same field and rationale)
    attn_use_pallas: bool = True

    @property
    def max_size(self) -> int:
        return self.config.max_size

    def _bank(self):
        cfg = self.config
        max_in = max([cfg.latent_dims, *cfg.blocks])
        max_out = max(cfg.blocks)
        return self.param(
            "shared_filters", xavier_uniform_relu_gain,
            (3, 3, max_in, max_out))


class SharedGenerator(_SharedBase):
    """(shared/pluggan.py:59-92)"""

    @nn.compact
    def __call__(self, z, train: bool = True):
        cfg = self.config
        bank = self._bank()
        x = GeneratorInputMLP(
            cfg.latent_dims, cfg.blocks[0], cfg.base_size,
            activation=self.activation, dtype=self.dtype)(z, train)
        in_dims = cfg.blocks[0]
        apply_norm = False
        for block_i, out_dims in enumerate(cfg.blocks):
            x = SharedResidualGeneratorBlock(
                in_dims, out_dims, apply_norm=apply_norm, norm=self.norm,
                activation=self.activation, dtype=self.dtype,
            )(x, bank, train)
            apply_norm = True
            if cfg.attention and block_i in cfg.attention:
                x = SelfAttention2d(out_dims, dtype=self.dtype,
                    use_pallas=self.attn_use_pallas)(x, train)
            in_dims = out_dims
        return GeneratorOutput(
            in_dims, cfg.data_dims, norm=self.norm,
            activation=self.activation, dtype=self.dtype)(x, train)


class SharedDiscriminator(_SharedBase):
    """(shared/pluggan.py:95-124)"""

    @nn.compact
    def __call__(self, x, train: bool = True):
        cfg = self.config
        bank = self._bank()
        first_dims = cfg.blocks[-1]
        x = DiscriminatorInput(cfg.data_dims, first_dims,
                               dtype=self.dtype)(x, train)
        in_dims = first_dims
        apply_norm = False
        for block_i, out_dims in reversed(list(enumerate(cfg.blocks))):
            x = SharedResidualDiscriminatorBlock(
                in_dims, out_dims, apply_norm=apply_norm, norm=self.norm,
                activation=self.activation, dtype=self.dtype,
            )(x, bank, train)
            apply_norm = True
            if cfg.attention and block_i in cfg.attention:
                x = SelfAttention2d(out_dims, dtype=self.dtype,
                    use_pallas=self.attn_use_pallas)(x, train)
            in_dims = out_dims
        return DiscriminatorOutput(
            in_dims, 1, norm=self.norm, activation=self.activation,
            dtype=self.dtype)(x, train)


class SharedIQNDiscriminator(_SharedBase):
    """(shared/pluggan.py:127-156)"""

    @nn.compact
    def __call__(self, x, train: bool = True, targets=None, rng=None):
        cfg = self.config
        bank = self._bank()
        first_dims = cfg.blocks[-1]
        x = DiscriminatorInput(cfg.data_dims, first_dims,
                               dtype=self.dtype)(x, train)
        in_dims = first_dims
        apply_norm = False
        for block_i, out_dims in reversed(list(enumerate(cfg.blocks))):
            x = SharedResidualDiscriminatorBlock(
                in_dims, out_dims, apply_norm=apply_norm, norm=self.norm,
                activation=self.activation, dtype=self.dtype,
            )(x, bank, train)
            apply_norm = True
            if cfg.attention and block_i in cfg.attention:
                x = SelfAttention2d(out_dims, dtype=self.dtype,
                    use_pallas=self.attn_use_pallas)(x, train)
            in_dims = out_dims
        return IQNDiscriminatorOutput(
            in_dims, 1, norm=self.norm, activation=self.activation,
            dtype=self.dtype)(x, train=train, targets=targets, rng=rng)
