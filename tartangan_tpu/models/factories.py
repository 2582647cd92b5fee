"""CLI-name -> module-factory assembly.

Parity: the factory wiring in the reference trainers' ``build_models``
(trainers/cnn.py:29-83, iqn.py:30-83, info.py:33-94): ``--g-base {mlp,tiledz}``,
``--norm {bn,id}``, ``--activation {relu,selu,elu}`` select how generator /
discriminator blocks are constructed.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from .blocks import (
    DiscriminatorInput,
    DiscriminatorOutput,
    GeneratorInputMLP,
    GeneratorInputMLP1d,
    GeneratorOutput,
    IQNDiscriminatorOutput,
    LinearOutput,
    MultiModelDiscriminatorOutput,
    ResidualDiscriminatorBlock,
    ResidualGeneratorBlock,
    TiledZGeneratorInput,
)

Dtype = Any

G_INPUTS = {
    "mlp": GeneratorInputMLP,
    "tiledz": TiledZGeneratorInput,
    "mlp1d": GeneratorInputMLP1d,
}


def g_input_factory(g_base: str, activation: str):
    cls = G_INPUTS[g_base]

    def factory(latent_dims, output_dims, size, dtype):
        return cls(latent_dims, output_dims, size,
                   activation=activation, dtype=dtype)
    return factory


def g_block_factory(norm: str, activation: str, ndim: int = 2,
                    remat: bool = False):
    """``remat=True`` wraps each block in ``nn.remat`` — activations are
    recomputed in the backward pass, trading FLOPs for HBM (useful for the
    512/1024-px configs at larger batch)."""
    import flax.linen as nn
    cls = (nn.remat(ResidualGeneratorBlock, static_argnums=(2,))
           if remat else ResidualGeneratorBlock)

    def factory(in_dims, out_dims, *, first_block=False, upsample=True,
                dtype=jnp.float32):
        return cls(
            in_dims, out_dims, upsample=upsample, first_block=first_block,
            norm=norm, activation=activation, ndim=ndim, dtype=dtype,
        )
    return factory


def d_block_factory(norm: str, activation: str, ndim: int = 2,
                    remat: bool = False):
    import flax.linen as nn
    cls = (nn.remat(ResidualDiscriminatorBlock, static_argnums=(2,))
           if remat else ResidualDiscriminatorBlock)

    def factory(in_dims, out_dims, *, first_block=False, dtype=jnp.float32):
        return cls(
            in_dims, out_dims, first_block=first_block,
            norm=norm, activation=activation, ndim=ndim, dtype=dtype,
        )
    return factory


def g_output_factory(norm: str, activation: str, output_activation="tanh",
                     ndim: int = 2):
    def factory(in_dims, out_dims, dtype):
        return GeneratorOutput(
            in_dims, out_dims, norm=norm, activation=activation,
            output_activation=output_activation, ndim=ndim, dtype=dtype,
        )
    return factory


def d_input_factory(ndim: int = 2):
    def factory(in_dims, out_dims, dtype):
        return DiscriminatorInput(in_dims, out_dims, ndim=ndim, dtype=dtype)
    return factory


def d_output_factory(norm: str, activation: str):
    def factory(in_dims, out_dims, dtype):
        return DiscriminatorOutput(in_dims, out_dims, norm=norm,
                                   activation=activation, dtype=dtype)
    return factory


def iqn_d_output_factory(norm: str, activation: str):
    def factory(in_dims, out_dims, dtype):
        return IQNDiscriminatorOutput(in_dims, out_dims, norm=norm,
                                      activation=activation, dtype=dtype)
    return factory


def info_d_output_factory(norm: str, activation: str, code_dims: int):
    """Two heads: adversarial logit + latent-code reconstruction
    (info.py:65-76)."""
    heads = (
        lambda in_dims, dtype: LinearOutput(in_dims, 1, dtype=dtype),
        lambda in_dims, dtype: LinearOutput(in_dims, code_dims, dtype=dtype),
    )

    def factory(in_dims, out_dims, dtype):
        del out_dims
        return MultiModelDiscriminatorOutput(
            in_dims, head_factories=heads, norm=norm, activation=activation,
            dtype=dtype,
        )
    return factory
