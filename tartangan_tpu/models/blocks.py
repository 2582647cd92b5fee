"""Generator/discriminator building blocks (flax, NHWC / NLC).

Parity map (reference -> here):
- blocks/generator.py:9-29   GeneratorBlock
- blocks/generator.py:32-62  ResidualGeneratorBlock
- blocks/generator.py:65-98  GeneratorInputMLP / GeneratorInputMLP1d
- blocks/generator.py:101-112 TiledZGeneratorInput
- blocks/generator.py:115-129 GeneratorOutput
- blocks/discriminator.py:11-22  DiscriminatorInput
- blocks/discriminator.py:25-46  DiscriminatorBlock
- blocks/discriminator.py:49-95  ResidualDiscriminatorBlock
- blocks/discriminator.py:98-146 DiscriminatorPoolOnlyOutput / DiscriminatorOutput
- blocks/discriminator.py:149-178 IQNDiscriminatorOutput
- blocks/discriminator.py:181-230 MultiModelDiscriminatorOutput / LinearOutput /
  GaussianParametersOutput

Design notes (TPU-first, not a translation):
- NHWC layout; convs are ``lax.conv_general_dilated`` through flax — XLA
  fuses the pre-activation norm+act chains into the conv epilogues.
- All resampling is static-shape (ops/resize.py): nearest-2x up in G,
  align_corners bilinear 0.5x + avg-pool-2 down in D.
- Every block takes ``(x, train)`` so BatchNorm batch-stat threading is
  uniform under jit.

Known reference bug NOT replicated: the non-residual blocks normalize with
``out_dims`` before a conv whose input has ``in_dims`` channels
(generator.py:15-17), which crashes whenever in != out. We normalize the
tensor that is actually present.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import (
    avg_pool_2x,
    avg_pool_2x_1d,
    downsample_bilinear_half,
    resize_linear_1d,
    upsample_nearest_2x,
    upsample_nearest_2x_1d,
)
from .iqn import IQN, iqn_loss
from .layers import Conv, Dense, NormAct, activation_fn

Dtype = Any


def _upsample(x, ndim):
    return upsample_nearest_2x(x) if ndim == 2 else upsample_nearest_2x_1d(x)


def _avg_pool(x, ndim):
    return avg_pool_2x(x) if ndim == 2 else avg_pool_2x_1d(x)


def _shortcut_down(x, ndim):
    if ndim == 2:
        # bilinear 0.5x, align_corners=True (discriminator.py:55-57)
        return downsample_bilinear_half(x, align_corners=True)
    # text path: 'linear' 0.5x, align_corners=False (trainers/text_cnn.py:69-72)
    return resize_linear_1d(x, x.shape[1] // 2, align_corners=False)


class GeneratorBlock(nn.Module):
    """Non-residual pre-activation up block (generator.py:9-29)."""

    in_dims: int
    out_dims: int
    upsample: bool = True
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.upsample:
            x = _upsample(x, self.ndim)
        if not self.first_block:
            x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = Conv(self.out_dims, 3, in_features=self.in_dims,
                 dtype=self.dtype, ndim=self.ndim)(x)
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = Conv(self.out_dims, 3, in_features=self.out_dims,
                 dtype=self.dtype, ndim=self.ndim)(x)
        return x


class ResidualGeneratorBlock(nn.Module):
    """Pre-activation residual up block (generator.py:32-62).

    main: [norm,act,]conv3(in->out), norm, act, conv3(out->out)
    shortcut: 1x1 projection iff in != out; nearest-2x upsample applied to
    the block input before both paths.
    """

    in_dims: int
    out_dims: int
    upsample: bool = True
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # TPU traffic optimization: norm+act commute EXACTLY with nearest
        # upsampling (pointwise ops on repeated values; batch stats of the
        # repeated tensor equal those of the source), so apply them at the
        # small resolution — 4x less HBM traffic for the normalize pass on
        # this bandwidth-bound chip (docs/PERF.md). Same values bit-for-bit
        # as the reference's upsample-first order (generator.py:56-62).
        if self.upsample and not self.first_block:
            h = NormAct(self.norm, self.activation, self.dtype)(x, train)
            h = _upsample(h, self.ndim)
            x = _upsample(x, self.ndim)
        else:
            if self.upsample:
                x = _upsample(x, self.ndim)
            h = x
            if not self.first_block:
                h = NormAct(self.norm, self.activation, self.dtype)(h, train)
        h = Conv(self.out_dims, 3, in_features=self.in_dims,
                 dtype=self.dtype, ndim=self.ndim)(h)
        h = NormAct(self.norm, self.activation, self.dtype)(h, train)
        h = Conv(self.out_dims, 3, in_features=self.out_dims,
                 dtype=self.dtype, ndim=self.ndim)(h)
        if self.in_dims != self.out_dims:
            x = Conv(self.out_dims, 1, in_features=self.in_dims,
                     dtype=self.dtype, ndim=self.ndim,
                     name="project_input")(x)
        return x + h


class GeneratorInputMLP(nn.Module):
    """latent -> act(Linear) -> (B, size, size, out) (generator.py:65-80)."""

    latent_dims: int
    output_dims: int
    size: int = 4
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        del train
        base = Dense(self.size ** 2 * self.output_dims,
                     in_features=self.latent_dims, dtype=self.dtype)(z)
        base = activation_fn(self.activation)(base)
        return base.reshape(-1, self.size, self.size, self.output_dims)


class GeneratorInputMLP1d(nn.Module):
    """latent -> act(Linear) -> (B, size, out) (generator.py:83-98)."""

    latent_dims: int
    output_dims: int
    size: int = 4
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        del train
        base = Dense(self.size * self.output_dims,
                     in_features=self.latent_dims, dtype=self.dtype)(z)
        base = activation_fn(self.activation)(base)
        return base.reshape(-1, self.size, self.output_dims)


class TiledZGeneratorInput(nn.Module):
    """Tile z to a (B, size, size, latent) map (generator.py:101-112)."""

    latent_dims: int
    output_dims: int
    size: int = 4
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    def __call__(self, z, train: bool = True):
        del train
        assert self.latent_dims == self.output_dims
        z = z.astype(self.dtype)
        return jnp.broadcast_to(
            z[:, None, None, :],
            (z.shape[0], self.size, self.size, z.shape[-1]),
        )


class GeneratorOutput(nn.Module):
    """norm -> act -> 1x1 conv -> tanh (generator.py:115-129)."""

    in_dims: int
    out_dims: int
    norm: str = "bn"
    activation: str = "relu"
    output_activation: str = "tanh"  # 'tanh' | 'id'
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = Conv(self.out_dims, 1, in_features=self.in_dims,
                 dtype=self.dtype, ndim=self.ndim)(x)
        if self.output_activation == "tanh":
            x = jnp.tanh(x)
        return x


class DiscriminatorInput(nn.Module):
    """1x1 conv image->features (discriminator.py:11-22)."""

    in_dims: int
    out_dims: int
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        return Conv(self.out_dims, 1, in_features=self.in_dims,
                    dtype=self.dtype, ndim=self.ndim)(x.astype(self.dtype))


class DiscriminatorBlock(nn.Module):
    """Non-residual pre-activation down block (discriminator.py:25-46)."""

    in_dims: int
    out_dims: int
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if not self.first_block:
            x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = Conv(self.out_dims, 3, in_features=self.in_dims,
                 dtype=self.dtype, ndim=self.ndim)(x)
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = Conv(self.out_dims, 3, in_features=self.out_dims,
                 dtype=self.dtype, ndim=self.ndim)(x)
        return _avg_pool(x, self.ndim)


class ResidualDiscriminatorBlock(nn.Module):
    """Pre-activation residual down block (discriminator.py:49-95).

    main: [norm,act,]conv3(in->out), norm, act, conv3(out->out), avgpool2
    shortcut: bilinear 0.5x (align_corners=True), 1x1 projection iff in != out
    """

    in_dims: int
    out_dims: int
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = x
        if not self.first_block:
            h = NormAct(self.norm, self.activation, self.dtype)(h, train)
        h = Conv(self.out_dims, 3, in_features=self.in_dims,
                 dtype=self.dtype, ndim=self.ndim)(h)
        h = NormAct(self.norm, self.activation, self.dtype)(h, train)
        h = Conv(self.out_dims, 3, in_features=self.out_dims,
                 dtype=self.dtype, ndim=self.ndim)(h)
        h = _avg_pool(h, self.ndim)
        x = _shortcut_down(x, self.ndim)
        if self.in_dims != self.out_dims:
            x = Conv(self.out_dims, 1, in_features=self.in_dims,
                     dtype=self.dtype, ndim=self.ndim,
                     name="project_input")(x)
        return x + h


def _sum_pool(x):
    """Sum over all spatial axes, keep (B, C)."""
    axes = tuple(range(1, x.ndim - 1))
    return jnp.sum(x, axis=axes)


class DiscriminatorOutput(nn.Module):
    """norm -> act -> spatial sum-pool -> Linear (discriminator.py:126-146)."""

    in_dims: int
    out_dims: int
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = _sum_pool(x)
        return Dense(self.out_dims, in_features=self.in_dims,
                     dtype=self.dtype)(x)


class DiscriminatorPoolOnlyOutput(nn.Module):
    """norm -> act -> 1x1/4x4 conv -> avg/sum pool (discriminator.py:98-123)."""

    in_dims: int
    out_dims: int
    pool: str = "sum"  # 'sum' | 'avg' | 'conv'
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        kernel = 4 if self.pool == "conv" else 1
        feats = Conv(self.out_dims, kernel, in_features=self.in_dims,
                     dtype=self.dtype)(x)
        if self.pool == "avg":
            return jnp.mean(feats, axis=(1, 2))
        if self.pool == "sum":
            return jnp.sum(feats, axis=(1, 2, 3))[..., None]
        if self.pool == "conv":
            return feats
        raise ValueError(f"no pooling method named '{self.pool}'")


class IQNDiscriminatorOutput(nn.Module):
    """IQN head: sum-pool feats, mix with tau embedding, per-quantile linear
    output; computes the quantile-Huber loss in-graph when targets are given
    (discriminator.py:149-178). The whole head lives inside the jitted step.
    """

    in_dims: int
    out_dims: int
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, targets=None, rng=None):
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        feats = _sum_pool(x)  # (B, F)
        if rng is None:
            rng = self.make_rng("iqn")
        feats_tau, taus = IQN(self.in_dims, dtype=self.dtype)(feats, rng)
        p_target_tau = Dense(self.out_dims, in_features=self.in_dims,
                             dtype=self.dtype, name="to_output")(feats_tau)
        num_quantiles = feats_tau.shape[0] // feats.shape[0]
        p_target = p_target_tau.reshape(
            num_quantiles, -1, self.out_dims).mean(axis=0)
        if targets is not None:
            taus_r = jnp.tile(taus, (1, self.out_dims))
            loss = iqn_loss(p_target_tau, targets, taus_r)
            return p_target, loss
        return p_target


class LinearOutput(nn.Module):
    """Plain linear head (discriminator.py:204-213)."""

    in_dims: int
    out_dims: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Dense(self.out_dims, in_features=self.in_dims,
                     dtype=self.dtype)(x)


class GaussianParametersOutput(nn.Module):
    """Linear -> act -> Linear -> (mu, log_sigma) (discriminator.py:216-230)."""

    in_dims: int
    out_dims: int
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Dense(self.in_dims, in_features=self.in_dims, dtype=self.dtype)(x)
        h = activation_fn(self.activation)(h)
        h = Dense(2 * self.out_dims, in_features=self.in_dims,
                  dtype=self.dtype)(h)
        return h[:, :self.out_dims], h[:, self.out_dims:]


class MultiModelDiscriminatorOutput(nn.Module):
    """Shared norm/act/sum-pool trunk feeding several output heads
    (discriminator.py:181-201); used by the InfoGAN trainer.
    ``head_factories`` maps (in_dims, dtype) -> nn.Module.
    """

    in_dims: int
    head_factories: Tuple[Callable, ...] = ()
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        feats = _sum_pool(x)
        return [factory(self.in_dims, self.dtype)(feats)
                for factory in self.head_factories]
