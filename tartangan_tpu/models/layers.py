"""Shared layer primitives: norms, activations, convs (NHWC, mixed precision).

Design: params live in float32; compute dtype is configurable (bfloat16 on
TPU). BatchNorm always reduces in float32 for stability, and — matching how
the reference actually runs (models are kept in ``train()`` mode even while
sampling, trainer.py:127/cnn.py:110) — normalizes with *batch* statistics
during training while tracking a running average for export/eval paths.

Reference parity: norm/activation factory selection ``--norm {bn,id}`` /
``--activation {relu,selu,elu}`` (trainers/cnn.py:32-45), PixelNorm
(models/layers.py:16-22).
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from ..ops.init import torch_bias_uniform, torch_kaiming_uniform

Dtype = Any

ACTIVATIONS: dict[str, Callable] = {
    "relu": lambda x: nn.leaky_relu(x, 0.2),
    "selu": nn.selu,
    "elu": nn.elu,
}


def activation_fn(name: str) -> Callable:
    return ACTIVATIONS[name]


class BatchNorm(nn.Module):
    """BatchNorm over all axes but the channel axis (torch BatchNorm2d/1d).

    ``use_running_average=False`` (the training-mode default everywhere in the
    reference) normalizes by batch stats and updates the ``batch_stats``
    collection with torch's momentum-0.1 EMA.
    """

    momentum: float = 0.9  # flax convention: ra = momentum*ra + (1-m)*batch
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = False):
        y = nn.BatchNorm(
            use_running_average=use_running_average,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=jnp.float32,        # reduce/normalize in f32
            param_dtype=jnp.float32,
        )(x)
        return y.astype(self.dtype)


class NormAct(nn.Module):
    """The pre-activation `norm -> activation` pair used by every block."""

    norm: str = "bn"          # 'bn' | 'id'
    activation: str = "relu"  # 'relu' | 'selu' | 'elu'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.norm == "bn":
            x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        elif self.norm != "id":
            raise ValueError(f"unknown norm '{self.norm}'")
        return activation_fn(self.activation)(x)


def Conv(features: int, kernel: int = 3, *, in_features: int | None = None,
         use_bias: bool = True, dtype: Dtype = jnp.float32,
         name: str | None = None, ndim: int = 2) -> nn.Conv:
    """Conv with torch-default init, SAME padding, NHWC/NLC layout.

    ``in_features`` (when known) sets the torch-default bias bound
    ``1/sqrt(fan_in)`` with ``fan_in = in_features * kernel**ndim``.
    """
    ksize = (kernel,) * ndim
    fan_in = (in_features or features) * kernel ** ndim
    return nn.Conv(
        features=features,
        kernel_size=ksize,
        padding="SAME",
        use_bias=use_bias,
        kernel_init=torch_kaiming_uniform,
        bias_init=torch_bias_uniform(fan_in),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def Dense(features: int, *, in_features: int | None = None,
          use_bias: bool = True, dtype: Dtype = jnp.float32,
          name: str | None = None) -> nn.Dense:
    return nn.Dense(
        features=features,
        use_bias=use_bias,
        kernel_init=torch_kaiming_uniform,
        bias_init=torch_bias_uniform(in_features or features),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class PixelNorm(nn.Module):
    """x / sqrt(mean(x^2, channel) + eps) (reference models/layers.py:16-22)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        denom = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + self.eps)
        return x / denom
