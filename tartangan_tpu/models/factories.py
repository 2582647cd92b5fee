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


# Parity (sub-pixel / space-to-depth) conv rewrites fill the MXU's
# 128-lane tiles at tower widths; the pass-count model (ops/parity.py)
# says the rewrite never loses for out_dims <= this bound and wins up to
# 4x below it, while above it conv2's block-structured weights cost more
# passes than they save.
PARITY_MAX_DIMS = 64

# --remat-policy: what jax.checkpoint may SAVE inside a rematted block.
# 'full' recomputes everything (classic remat, max memory saving);
# 'convs' saves the tagged main-path conv outputs (blocks.py::_ckpt) and
# recomputes only the cheap norm/act/resample chains — less backward
# FLOPs for most of the memory win; 'dots' saves dot_general results
# without batch dims (jax's stock policy — convs are not dots, so on
# these towers it behaves close to 'full'; included as the stock
# comparison point).
REMAT_POLICIES = ("full", "convs", "dots")


def remat_policy(name: str):
    """Resolve a --remat-policy name to a jax.checkpoint policy."""
    import jax
    if name in (None, "full"):
        return None
    if name == "convs":
        return jax.checkpoint_policies.save_only_these_names("block_conv")
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise ValueError(f"unknown remat policy '{name}'")


def resolve_parity(choice: str) -> bool:
    """--parity-blocks {auto,on,off}: 'auto' enables the parity conv
    rewrites on TPU (where MXU lane occupancy is the binding constraint)
    and keeps plain flax blocks elsewhere (CPU tests, interpret runs)."""
    if choice == "on":
        return True
    if choice == "off":
        return False
    import jax
    return jax.default_backend() == "tpu"


def g_block_factory(norm: str, activation: str, ndim: int = 2,
                    remat: bool = False, fused: bool = False,
                    parity: bool = False, remat_policy_name: str = "full"):
    """``remat=True`` wraps each block in ``nn.remat`` — activations are
    recomputed in the backward pass, trading FLOPs for HBM (useful for the
    512/1024-px configs at larger batch). ``parity=True``
    (--parity-blocks) computes thin tower blocks (upsample, not-first,
    2-D, out_dims <= PARITY_MAX_DIMS) in the sub-pixel parity domain
    (blocks.py::ParityResidualGeneratorBlock) — pure-XLA, autodiff-safe.
    ``fused=True`` instead uses the Pallas kernel transcription
    (ops/pallas/gblock.py) — a tests+docs-only negative-result baseline
    (measured slower than parity, R1-incompatible; no CLI flag since
    round 4)."""
    import flax.linen as nn
    policy = remat_policy(remat_policy_name) if remat else None
    cls = (nn.remat(ResidualGeneratorBlock, static_argnums=(2,),
                    policy=policy)
           if remat else ResidualGeneratorBlock)
    fused_ok = fused and norm == "bn" and activation == "relu" and ndim == 2
    parity_ok = parity and norm in ("bn", "id") and ndim == 2

    def factory(in_dims, out_dims, *, first_block=False, upsample=True,
                dtype=jnp.float32):
        if (parity_ok and upsample and not first_block
                and out_dims <= PARITY_MAX_DIMS):
            from .blocks import ParityResidualGeneratorBlock
            # --remat must cover the parity variants too: the thin
            # (out_dims <= PARITY_MAX_DIMS) blocks are exactly the
            # high-resolution ones whose activations dominate HBM at the
            # 512/1024px configs (ADVICE r3)
            pcls = (nn.remat(ParityResidualGeneratorBlock,
                             static_argnums=(2,), policy=policy)
                    if remat else ParityResidualGeneratorBlock)
            return pcls(
                in_dims, out_dims, upsample=upsample,
                first_block=first_block, norm=norm, activation=activation,
                ndim=ndim, dtype=dtype,
            )
        if fused_ok and upsample and not first_block:
            from .blocks import FusedResidualGeneratorBlock
            return FusedResidualGeneratorBlock(
                in_dims, out_dims, upsample=upsample,
                first_block=first_block, norm=norm, activation=activation,
                ndim=ndim, dtype=dtype,
            )
        return cls(
            in_dims, out_dims, upsample=upsample, first_block=first_block,
            norm=norm, activation=activation, ndim=ndim, dtype=dtype,
        )
    return factory


def d_block_factory(norm: str, activation: str, ndim: int = 2,
                    remat: bool = False, parity: bool = False,
                    remat_policy_name: str = "full"):
    import flax.linen as nn
    policy = remat_policy(remat_policy_name) if remat else None
    cls = (nn.remat(ResidualDiscriminatorBlock, static_argnums=(2,),
                    policy=policy)
           if remat else ResidualDiscriminatorBlock)
    parity_ok = parity and norm in ("bn", "id") and ndim == 2

    def factory(in_dims, out_dims, *, first_block=False, dtype=jnp.float32):
        if parity_ok and out_dims <= PARITY_MAX_DIMS:
            from .blocks import ParityResidualDiscriminatorBlock
            pcls = (nn.remat(ParityResidualDiscriminatorBlock,
                             static_argnums=(2,), policy=policy)
                    if remat else ParityResidualDiscriminatorBlock)
            return pcls(
                in_dims, out_dims, first_block=first_block,
                norm=norm, activation=activation, ndim=ndim, dtype=dtype,
            )
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
