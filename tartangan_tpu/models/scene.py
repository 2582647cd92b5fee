"""Scene-composition generator blocks.

Parity: reference tartangan/models/blocks/scene.py + the scene model
assemblies in pluggan.py:135-196. A latent drives affine-transformed patch
masks composited onto a canvas (``StructuredSceneGenerator``), which is then
refined by the standard conv-upsample stack. Patch placement uses our
from-scratch ``affine_grid``/``grid_sample`` (ops/grid_sample.py).

TPU notes: the per-patch loop of the reference (scene.py:152-166) is
vectorized — all P patches are sampled with one batched grid_sample over a
folded (N*P) batch axis.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import GANConfig
from ..ops.grid_sample import affine_grid, grid_sample
from ..ops.resize import upsample_nearest_2x
from .attention import SelfAttention2d
from .blocks import GeneratorOutput, ResidualGeneratorBlock
from .layers import Dense, NormAct

Dtype = Any


class SceneStructureBlock(nn.Module):
    """latent -> P affine-placed patch masks on a (scene, scene) canvas
    (reference scene.py:96-172). Output: (B, scene, scene, P)."""

    in_dims: int
    num_patches: int = 20
    patch_size: int = 3
    scene_size: int = 16
    refine_patches: bool = False
    patch_noise: bool = True
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @property
    def output_channels(self) -> int:
        return self.num_patches

    @nn.compact
    def __call__(self, z, train: bool = True):
        b = z.shape[0]
        p, ps, ss = self.num_patches, self.patch_size, self.scene_size

        if self.refine_patches:
            masks = Dense(p * ps * ps, in_features=self.in_dims,
                          dtype=jnp.float32,
                          name="masks")(z.astype(jnp.float32))
            masks = 1.0 - jax.nn.sigmoid(masks)
            masks = masks.reshape(b, p, ps, ps)
        else:
            masks = jnp.ones((b, p, ps, ps), jnp.float32)

        # affine params: zero-init weights, identity*2 bias (scene.py:113-125)
        init_scale = 2.0
        bias_proto = np.tile(
            np.array([init_scale, 0, 0, 0, init_scale, 0], np.float32), p)
        transforms = nn.Dense(
            6 * p, kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(bias_proto),
            dtype=jnp.float32, param_dtype=jnp.float32,
            name="patch_transforms",
        )(z.astype(jnp.float32))
        transforms = transforms.reshape(b, p, 2, 3)

        if self.patch_noise:
            noise = jax.random.normal(
                self.make_rng("scene"), (ps, ps), jnp.float32)
            masks = masks * noise

        # vectorize the reference per-patch loop: fold P into the batch
        masks_f = masks.reshape(b * p, ps, ps, 1)
        theta_f = transforms.reshape(b * p, 2, 3)
        grid = affine_grid(theta_f, (b * p, ss, ss), align_corners=False)
        patches = grid_sample(masks_f, grid, align_corners=False)
        patches = patches.reshape(b, p, ss, ss)
        return jnp.transpose(patches, (0, 2, 3, 1)).astype(self.dtype)


class ScenePatch(nn.Module):
    """latent -> alpha-masked tanh patch affine-placed on the canvas
    (reference scene.py:49-91). Returns (patch_on_canvas, mask_on_canvas)."""

    in_dims: int
    patch_size: int = 12
    patch_channels: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, b_z, canvas_hw):
        b = b_z.shape[0]
        ps, c = self.patch_size, self.patch_channels
        area = ps * ps * c
        z32 = b_z.astype(jnp.float32)

        patch = jnp.tanh(Dense(area, in_features=self.in_dims,
                               dtype=jnp.float32, name="patch")(z32))
        patch = patch.reshape(b, ps, ps, c)
        alpha = jax.nn.sigmoid(nn.Dense(
            area, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=jnp.float32, param_dtype=jnp.float32, name="alpha")(z32))
        alpha = alpha.reshape(b, ps, ps, c)
        patch = patch * alpha

        identity = np.array([1, 0, 0, 0, 1, 0], np.float32)
        theta = nn.Dense(
            6, kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(identity),
            dtype=jnp.float32, param_dtype=jnp.float32,
            name="patch_transform",
        )(z32).reshape(b, 2, 3)

        h, w = canvas_hw
        grid = affine_grid(theta, (b, h, w), align_corners=True)
        y = grid_sample(patch, grid, align_corners=True)
        mask = grid_sample(alpha, grid, align_corners=True)
        return y.astype(self.dtype), mask.astype(self.dtype)


class SceneBlock(nn.Module):
    """One compositing step: refine z, paint a patch, blend, 3x3-conv refine
    (reference scene.py:22-46). Carries (z, canvas)."""

    z_dims: int
    canvas_channels: int
    patch_size: int = 12
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        z, canvas = inputs
        patch_z = NormAct(self.norm, self.activation, jnp.float32)(
            z.astype(jnp.float32), train)
        patch_z = Dense(self.z_dims, in_features=self.z_dims,
                        dtype=jnp.float32, name="z_code")(patch_z)
        patch, mask = ScenePatch(
            self.z_dims, self.patch_size, self.canvas_channels,
            dtype=self.dtype, name="patch")(patch_z, canvas.shape[1:3])
        canvas = (1.0 - mask) * canvas + patch
        canvas = nn.Conv(
            self.canvas_channels, (3, 3), padding="SAME", dtype=self.dtype,
            param_dtype=jnp.float32, name="refine_canvas")(canvas)
        z = z - patch_z.astype(z.dtype)
        return z, canvas


class SceneUpscale(nn.Module):
    """Nearest 2x canvas upsample (reference scene.py:175-184)."""

    def __call__(self, inputs, train: bool = True):
        z, canvas = inputs
        return z, upsample_nearest_2x(canvas)


class SceneOutput(nn.Module):
    """tanh the canvas (reference scene.py:187-193)."""

    def __call__(self, inputs, train: bool = True):
        z, canvas = inputs
        return z, jnp.tanh(canvas)


class SceneGenerator(nn.Module):
    """Iterative patch-painting generator (pluggan.py:135-166): per scale,
    5*num_blocks_per_scale-1 SceneBlocks then a 2x canvas upscale."""

    config: GANConfig
    patch_size: int = 12
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @property
    def max_size(self) -> int:
        return self.config.max_size

    @nn.compact
    def __call__(self, z, train: bool = True, return_z_final: bool = False):
        cfg = self.config
        b = z.shape[0]
        canvas = jnp.zeros(
            (b, cfg.base_size, cfg.base_size, cfg.data_dims), self.dtype)
        state = (z.astype(self.dtype), canvas)
        num_blocks = 5 * cfg.num_blocks_per_scale
        for block_i in range(len(cfg.blocks) + 1):
            for _ in range(num_blocks - 1):
                state = SceneBlock(
                    cfg.latent_dims, cfg.data_dims, self.patch_size,
                    norm=self.norm, activation=self.activation,
                    dtype=self.dtype)(state, train)
            if block_i < len(cfg.blocks):
                state = SceneUpscale()(state, train)
        z_final, canvas = SceneOutput()(state, train)
        if return_z_final:
            return z_final, canvas
        return canvas


class StructuredSceneGenerator(nn.Module):
    """Structure masks -> conv-upsample stack (pluggan.py:169-196): the
    SceneStructureBlock emits a (scene, scene, P) map which the standard
    residual generator blocks upsample to full resolution."""

    config: GANConfig
    scene_size: int = 16
    patch_size: int = 3
    num_patches: int = 20
    refine_patches: bool = False
    patch_noise: bool = True
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @property
    def max_size(self) -> int:
        return self.config.max_size

    @nn.compact
    def __call__(self, z, train: bool = True):
        cfg = self.config
        structure = SceneStructureBlock(
            cfg.latent_dims, num_patches=self.num_patches,
            patch_size=self.patch_size, scene_size=self.scene_size,
            refine_patches=self.refine_patches,
            patch_noise=self.patch_noise,
            activation=self.activation, dtype=self.dtype,
            name="structure_generator",
        )
        x = structure(z, train)
        in_dims = structure.output_channels
        scene_i = int(np.log2(self.scene_size / 4))
        first_block = True
        for block_i, out_dims in enumerate(cfg.blocks[scene_i:]):
            x = ResidualGeneratorBlock(
                in_dims, out_dims, upsample=True, first_block=first_block,
                norm=self.norm, activation=self.activation,
                dtype=self.dtype)(x, train)
            first_block = False
            for _ in range(cfg.num_blocks_per_scale - 1):
                x = ResidualGeneratorBlock(
                    out_dims, out_dims, upsample=False, first_block=False,
                    norm=self.norm, activation=self.activation,
                    dtype=self.dtype)(x, train)
            if cfg.attention and block_i in cfg.attention:
                x = SelfAttention2d(out_dims, dtype=self.dtype)(x, train)
            in_dims = out_dims
        return GeneratorOutput(
            in_dims, cfg.data_dims, norm=self.norm,
            activation=self.activation, dtype=self.dtype)(x, train)
