""""Pluggan": factory-composed GAN models.

Parity: reference tartangan/models/pluggan.py:31-196. The reference composes
``nn.Sequential`` stacks from injected ``input_factory``/``block_factory``/
``output_factory`` callables; here the same factories build a list of flax
submodules, and ``__call__`` folds the input through them (all static Python
control flow — XLA sees one flat graph).

A factory is ``f(in_dims, out_dims, *, first_block=..., upsample=..., dtype=...)
-> nn.Module``. ``tartangan_tpu.models.factories`` builds them from CLI names.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

from ..configs import GANConfig
from .attention import SelfAttention2d
from .blocks import (
    DiscriminatorBlock,
    DiscriminatorInput,
    DiscriminatorOutput,
    GeneratorBlock,
    GeneratorOutput,
    TiledZGeneratorInput,
)

Dtype = Any


def _default_g_input(latent_dims, output_dims, size, dtype):
    return TiledZGeneratorInput(latent_dims, output_dims, size, dtype=dtype)


def _default_g_block(in_dims, out_dims, *, first_block=False, upsample=True,
                     dtype=jnp.float32):
    return GeneratorBlock(in_dims, out_dims, upsample=upsample,
                          first_block=first_block, dtype=dtype)


def _default_g_output(in_dims, out_dims, dtype):
    return GeneratorOutput(in_dims, out_dims, dtype=dtype)


def _default_d_input(in_dims, out_dims, dtype):
    return DiscriminatorInput(in_dims, out_dims, dtype=dtype)


def _default_d_block(in_dims, out_dims, *, first_block=False, dtype=jnp.float32):
    return DiscriminatorBlock(in_dims, out_dims, first_block=first_block,
                              dtype=dtype)


def _default_d_output(in_dims, out_dims, dtype):
    return DiscriminatorOutput(in_dims, out_dims, dtype=dtype)


def _chain_parity_d_blocks(blocks):
    """Keep consecutive parity D blocks in the parity layout across the
    block seam: the earlier block emits s=2-parity half-res
    (pack_down_parity_conv — lane-filled N and no standard-layout
    round-trip) and the later one consumes it directly. Attention or
    non-parity blocks between them break the chain (they expect standard
    layout). Mutates ``blocks`` in place."""
    from .blocks import ParityResidualDiscriminatorBlock
    for i in range(len(blocks) - 1):
        if (isinstance(blocks[i], ParityResidualDiscriminatorBlock)
                and isinstance(blocks[i + 1],
                               ParityResidualDiscriminatorBlock)):
            blocks[i] = blocks[i].clone(emit_parity=True)
            blocks[i + 1] = blocks[i + 1].clone(accept_parity=True)


class Generator(nn.Module):
    """Upsampling stack: input -> per-scale blocks (+SA) -> output
    (pluggan.py:58-85)."""

    config: GANConfig
    input_factory: Optional[Callable] = None
    block_factory: Optional[Callable] = None
    output_factory: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    # G is only ever differentiated first-order, so the Pallas attention
    # kernel (a jax.custom_vjp) is safe here — unlike in D, which sits
    # under the R1 second-order gradient
    attn_use_pallas: bool = True

    @property
    def max_size(self) -> int:
        return self.config.max_size

    def setup(self):
        cfg = self.config
        input_factory = self.input_factory or _default_g_input
        block_factory = self.block_factory or _default_g_block
        output_factory = self.output_factory or _default_g_output

        self.input_block = input_factory(
            cfg.latent_dims, cfg.blocks[0], cfg.base_size, self.dtype
        )
        blocks = []
        in_dims = cfg.blocks[0]
        first_block = True
        for block_i, out_dims in enumerate(cfg.blocks):
            blocks.append(block_factory(
                in_dims, out_dims, first_block=first_block, upsample=True,
                dtype=self.dtype,
            ))
            first_block = False
            for _ in range(cfg.num_blocks_per_scale - 1):
                blocks.append(block_factory(
                    out_dims, out_dims, first_block=False, upsample=False,
                    dtype=self.dtype,
                ))
            if cfg.attention and block_i in cfg.attention:
                blocks.append(SelfAttention2d(out_dims, dtype=self.dtype,
                                 use_pallas=self.attn_use_pallas))
            in_dims = out_dims
        output_block = output_factory(in_dims, cfg.data_dims, self.dtype)
        # parity-domain output fusion: when the tower ends in a parity
        # block and the output stage is the standard norm/act/1x1/tanh,
        # keep the hand-off in the parity layout — the last block skips
        # its depth-to-space and the output stage runs 4x-lane-filled at
        # the small resolution (blocks.py::ParityGeneratorOutput; param
        # trees are unchanged, so checkpoints interoperate both ways)
        from .blocks import ParityGeneratorOutput, ParityResidualGeneratorBlock
        if (blocks and isinstance(blocks[-1], ParityResidualGeneratorBlock)
                and type(output_block) is GeneratorOutput
                and output_block.ndim == 2
                and output_block.norm in ("bn", "id")):
            blocks[-1] = blocks[-1].clone(emit_parity=True)
            output_block = ParityGeneratorOutput(
                in_dims, cfg.data_dims, norm=output_block.norm,
                activation=output_block.activation,
                output_activation=output_block.output_activation,
                dtype=self.dtype)
        self.blocks = blocks
        self.output_block = output_block

    def __call__(self, z, train: bool = True):
        x = self.input_block(z, train)
        for block in self.blocks:
            x = block(x, train)
        return self.output_block(x, train)


class Discriminator(nn.Module):
    """Downsampling mirror of the generator (pluggan.py:88-111)."""

    config: GANConfig
    input_factory: Optional[Callable] = None
    block_factory: Optional[Callable] = None
    output_factory: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    # the R1 gradient penalty differentiates D twice; the attention
    # kernel's DOUBLE-nested custom_vjp (ops/pallas/attention.py) buys
    # exactly the two differentiation levels that needs, so D keeps the
    # fused kernel (round 3 routed D to XLA; superseded in round 4).
    attn_use_pallas: bool = True

    @property
    def max_size(self) -> int:
        return self.config.max_size

    def setup(self):
        cfg = self.config
        input_factory = self.input_factory or _default_d_input
        block_factory = self.block_factory or _default_d_block
        output_factory = self.output_factory or _default_d_output

        first_block_input_dims = cfg.blocks[-1]
        input_block = input_factory(
            cfg.data_dims, first_block_input_dims, self.dtype
        )
        blocks = []
        in_dims = first_block_input_dims
        first_block = True
        for block_i, out_dims in reversed(list(enumerate(cfg.blocks))):
            blocks.append(block_factory(
                in_dims, out_dims, first_block=first_block, dtype=self.dtype,
            ))
            if cfg.attention and block_i in cfg.attention:
                blocks.append(SelfAttention2d(out_dims, dtype=self.dtype,
                                 use_pallas=self.attn_use_pallas))
            in_dims = out_dims
            first_block = False
        # parity-domain input fusion (mirror of the G output fusion):
        # when the first tower block is a parity block, parity-stack the
        # IMAGE and run the input 1x1 block-diagonally — the first block
        # consumes the parity layout directly and its bilinear shortcut
        # samples straight from the parity planes (blocks.py::
        # ParityDiscriminatorInput; param trees unchanged)
        from .blocks import (
            ParityDiscriminatorInput,
            ParityResidualDiscriminatorBlock,
        )
        if (blocks and isinstance(blocks[0], ParityResidualDiscriminatorBlock)
                and type(input_block) is DiscriminatorInput
                and input_block.ndim == 2):
            input_block = ParityDiscriminatorInput(
                cfg.data_dims, first_block_input_dims, dtype=self.dtype)
            blocks[0] = blocks[0].clone(accept_parity=True)
        _chain_parity_d_blocks(blocks)
        self.input_block = input_block
        self.blocks = blocks
        self.output_block = output_factory(in_dims, 1, self.dtype)

    def __call__(self, x, train: bool = True):
        x = self.input_block(x, train)
        for block in self.blocks:
            x = block(x, train)
        return self.output_block(x, train)


class IQNDiscriminator(nn.Module):
    """Discriminator whose output head is an IQN quantile head; loss is
    computed in-graph when ``targets`` is given (pluggan.py:114-132).

    Note: mirrors the reference in having *no* input 1x1 conv and no
    first_block special-casing (pluggan.py:117-127).
    """

    config: GANConfig
    input_factory: Optional[Callable] = None   # unused; parity with reference
    block_factory: Optional[Callable] = None
    output_factory: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    attn_use_pallas: bool = True  # see Discriminator (R1-safe nested vjp)

    @property
    def max_size(self) -> int:
        return self.config.max_size

    def setup(self):
        cfg = self.config
        block_factory = self.block_factory or _default_d_block
        output_factory = self.output_factory
        if output_factory is None:
            raise ValueError("IQNDiscriminator requires an IQN output factory")

        blocks = []
        in_dims = cfg.data_dims
        for block_i, out_dims in reversed(list(enumerate(cfg.blocks))):
            blocks.append(block_factory(
                in_dims, out_dims, first_block=False, dtype=self.dtype,
            ))
            if cfg.attention and block_i in cfg.attention:
                blocks.append(SelfAttention2d(out_dims, dtype=self.dtype,
                                 use_pallas=self.attn_use_pallas))
            in_dims = out_dims
        _chain_parity_d_blocks(blocks)
        self.blocks = blocks
        self.output_block = output_factory(in_dims, 1, self.dtype)

    def __call__(self, x, train: bool = True, targets=None, rng=None):
        x = x.astype(self.dtype)
        for block in self.blocks:
            x = block(x, train)
        return self.output_block(x, train=train, targets=targets, rng=rng)
