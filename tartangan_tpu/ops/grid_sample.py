"""Affine grid generation + bilinear grid sampling (torch semantics).

The scene generator composites affine-transformed patches onto a canvas
(reference models/blocks/scene.py:76-91, 155-161 uses ``F.affine_grid`` +
``F.grid_sample``). JAX has no stock op with matching border/align semantics
(SURVEY.md section 7 'hard parts'), so these are implemented from scratch:
zero-padding, bilinear, with both align_corners conventions.

Gathers are expressed as flat ``take`` over the spatial plane — XLA lowers
these to efficient dynamic-gathers; the tensors involved are tiny (patch and
canvas sizes <= 64) so this is never a hot path.
"""
from __future__ import annotations

import jax.numpy as jnp


def affine_grid(theta, size, align_corners: bool = False):
    """theta: (N, 2, 3); size: (N, H, W) output spatial size.

    Returns a sampling grid (N, H, W, 2) of normalized (x, y) coords in
    [-1, 1], matching ``torch.nn.functional.affine_grid``.
    """
    n, h, w = size
    theta = theta.astype(jnp.float32)

    def base_coords(steps):
        if align_corners or steps == 1:
            return jnp.linspace(-1.0, 1.0, steps)
        # half-pixel convention: ((2i + 1) / steps) - 1
        return (2.0 * jnp.arange(steps) + 1.0) / steps - 1.0

    xs = base_coords(w)
    ys = base_coords(h)
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # (H, W)
    ones = jnp.ones_like(grid_x)
    base = jnp.stack([grid_x, grid_y, ones], axis=-1)  # (H, W, 3)
    # (N, H, W, 2) = base @ theta^T
    return jnp.einsum("hwk,nck->nhwc", base, theta)


def grid_sample(inputs, grid, align_corners: bool = False):
    """Bilinear sample ``inputs`` (N, H, W, C) at ``grid`` (N, Ho, Wo, 2)
    normalized (x, y) coords; zero padding — matches
    ``F.grid_sample(..., mode='bilinear', padding_mode='zeros')``.
    """
    n, h, w, c = inputs.shape
    x = grid[..., 0].astype(jnp.float32)
    y = grid[..., 1].astype(jnp.float32)

    if align_corners:
        ix = (x + 1.0) / 2.0 * (w - 1)
        iy = (y + 1.0) / 2.0 * (h - 1)
    else:
        ix = ((x + 1.0) * w - 1.0) / 2.0
        iy = ((y + 1.0) * h - 1.0) / 2.0

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    ix1 = ix0 + 1
    iy1 = iy0 + 1

    wx1 = ix - ix0
    wy1 = iy - iy0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(iy_, ix_):
        valid = ((ix_ >= 0) & (ix_ <= w - 1)
                 & (iy_ >= 0) & (iy_ <= h - 1))
        ixc = jnp.clip(ix_, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy_, 0, h - 1).astype(jnp.int32)
        flat_idx = iyc * w + ixc  # (N, Ho, Wo)
        flat = inputs.reshape(n, h * w, c)
        vals = jnp.take_along_axis(
            flat, flat_idx.reshape(n, -1, 1), axis=1
        ).reshape(*flat_idx.shape, c)
        return vals * valid[..., None].astype(inputs.dtype)

    out = (gather(iy0, ix0) * (wy0 * wx0)[..., None].astype(inputs.dtype)
           + gather(iy0, ix1) * (wy0 * wx1)[..., None].astype(inputs.dtype)
           + gather(iy1, ix0) * (wy1 * wx0)[..., None].astype(inputs.dtype)
           + gather(iy1, ix1) * (wy1 * wx1)[..., None].astype(inputs.dtype))
    return out
