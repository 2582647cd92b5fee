"""Host-side image grid rendering and saving.

Replaces the reference's ``torchvision.utils.save_image`` call sites
(e.g. components/image_sampler.py:24-45) without torch: arrays in, PNG out.
Our models produce NHWC float arrays in [-1, 1].
"""
from __future__ import annotations

import numpy as np
from PIL import Image

from .fs import smart_open


def to_uint8(images, value_range=(-1.0, 1.0)):
    """Normalize NHWC float images from ``value_range`` to uint8 [0, 255]."""
    images = np.asarray(images, dtype=np.float32)
    lo, hi = value_range
    images = (images - lo) / max(hi - lo, 1e-12)
    images = np.clip(images, 0.0, 1.0)
    return (images * 255.0 + 0.5).astype(np.uint8)


def make_grid(images, nrow=8, padding=2, pad_value=0):
    """Tile a batch of NHWC uint8 images into one grid image (HWC uint8)."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncols = min(nrow, n)
    nrows = (n + ncols - 1) // ncols
    grid = np.full(
        (nrows * h + (nrows + 1) * padding,
         ncols * w + (ncols + 1) * padding, c),
        pad_value, dtype=images.dtype,
    )
    for idx in range(n):
        r, col = divmod(idx, ncols)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y:y + h, x:x + w] = images[idx]
    return grid


def save_image(images, path_or_file, nrow=8, value_range=(-1.0, 1.0),
               fmt="png"):
    """Save a batch (NHWC) or single image (HWC) to a PNG grid.

    Mirrors ``torchvision.utils.save_image(..., normalize=True, range=(-1,1))``
    as used across the reference's sampler components.
    """
    images = np.asarray(images, dtype=np.float32)
    if images.ndim == 3:
        images = images[None]
    arr = make_grid(to_uint8(images, value_range), nrow=nrow)
    if arr.shape[-1] == 1:
        arr = arr[..., 0]
    img = Image.fromarray(arr)
    if hasattr(path_or_file, "write"):
        img.save(path_or_file, format=fmt)
    else:
        with smart_open(str(path_or_file), "wb") as f:
            img.save(f, format=fmt)
