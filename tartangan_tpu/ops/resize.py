"""Static-shape image resampling primitives, NHWC layout.

TPU-first design: bilinear resampling is expressed as two small dense
interpolation matrices applied with ``jnp.einsum`` — i.e. matmuls that XLA
tiles onto the MXU — instead of gather-based sampling. All shapes are static
so everything stays fully fusable under jit.

Behavioral parity targets in the reference:
- nearest 2x upsample in G blocks (blocks/generator.py:57-58)
- bilinear 0.5x with ``align_corners=True`` in D shortcuts
  (blocks/discriminator.py:55-57)
- bilinear resize to 299 with ``align_corners=True`` in the Inception
  wrapper (inception_utils.py:49)
- ``avg_pool2d(2)`` / ``max_pool2d(2)`` call sites in D blocks and attention
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """Dense (n_out, n_in) 1-D linear interpolation matrix.

    align_corners=True matches torch ``F.interpolate(..., align_corners=True)``:
    output index i samples input coordinate ``i * (n_in-1)/(n_out-1)``.
    align_corners=False uses half-pixel centers with edge clamping.
    """
    A = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        A[:, 0] = 1.0
        return A
    for i in range(n_out):
        if align_corners:
            src = i * (n_in - 1) / max(n_out - 1, 1)
        else:
            src = (i + 0.5) * n_in / n_out - 0.5
            src = min(max(src, 0.0), n_in - 1)
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        A[i, lo] += 1.0 - frac
        A[i, hi] += frac
    return A


def resize_bilinear(x, out_h: int, out_w: int, align_corners: bool = True):
    """Bilinear-resize NHWC ``x`` to (out_h, out_w) via two matmuls."""
    _, h, w, _ = x.shape
    if h == out_h and w == out_w:
        return x
    dtype = x.dtype
    Ah = jnp.asarray(_linear_interp_matrix(h, out_h, align_corners), dtype)
    Aw = jnp.asarray(_linear_interp_matrix(w, out_w, align_corners), dtype)
    x = jnp.einsum("oh,bhwc->bowc", Ah, x)
    x = jnp.einsum("ow,bhwc->bhoc", Aw, x)
    return x


def resize_linear_1d(x, out_l: int, align_corners: bool = False):
    """Linear-resize NLC ``x`` (1-D signals, e.g. text-GAN features)."""
    _, l, _ = x.shape
    if l == out_l:
        return x
    A = jnp.asarray(_linear_interp_matrix(l, out_l, align_corners), x.dtype)
    return jnp.einsum("ol,blc->boc", A, x)


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsample of NHWC (G block upsample path)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def upsample_nearest_2x_1d(x):
    b, l, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :], (b, l, 2, c))
    return x.reshape(b, l * 2, c)


def downsample_bilinear_half(x, align_corners: bool = True):
    """Bilinear 0.5x (D residual shortcut, discriminator.py:55-57)."""
    _, h, w, _ = x.shape
    return resize_bilinear(x, h // 2, w // 2, align_corners=align_corners)


def downsample_bilinear_half_parity(xp, c, align_corners: bool = True):
    """Bilinear 0.5x of a FULL-resolution tensor given only its
    parity-stacked (B, H/2, W/2, 4C) form (ops/parity.py layout, channel
    block 2*py + px): equals ``downsample_bilinear_half(depth_to_space(
    xp, c))`` without ever materializing the full-resolution tensor.

    The 1-D interpolation matrix's column index k = 2m + p regroups
    exactly into (coarse index m, parity p), so the H and W contractions
    become einsums over the split axes — still plain MXU matmuls. Used by
    the parity D block's shortcut when its input arrives parity-stacked
    (blocks.py::ParityResidualDiscriminatorBlock ``accept_parity``).
    """
    b, h2, w2, _ = xp.shape
    x6 = xp.reshape(b, h2, w2, 2, 2, c)
    dtype = xp.dtype
    Ah = jnp.asarray(
        _linear_interp_matrix(2 * h2, h2, align_corners), dtype
    ).reshape(h2, h2, 2)
    Aw = jnp.asarray(
        _linear_interp_matrix(2 * w2, w2, align_corners), dtype
    ).reshape(w2, w2, 2)
    x6 = jnp.einsum("imp,bmwpqc->biwqc", Ah, x6)
    return jnp.einsum("jwq,bhwqc->bhjc", Aw, x6)


def downsample_bilinear_half_parity_to_parity(xp, c, align_corners=True):
    """Bilinear 0.5x from s=2 parity planes TO s=2 parity planes: given
    the (B, H/2, W/2, 4C) parity form of a full-resolution tensor at
    (H, W), return the (B, H/4, W/4, 4C) parity form of its bilinear
    half-resolution downsample — neither full-resolution tensor ever
    materializes. Both the row index i = 2n + q and the column index
    k = 2m + p of the 1-D interpolation matrix regroup by parity, so the
    contraction splits into per-(q, p) quarter-size matmuls (one einsum
    per axis). Used by the parity D block's shortcut when it both
    receives and emits parity layout (``accept_parity + emit_parity``)."""
    b, h2, w2, _ = xp.shape
    x6 = xp.reshape(b, h2, w2, 2, 2, c)
    dtype = xp.dtype
    # rows (n, q), cols (m, p): A[2n+q, 2m+p]
    Ah = jnp.asarray(
        _linear_interp_matrix(2 * h2, h2, align_corners), dtype
    ).reshape(h2 // 2, 2, h2, 2)
    Aw = jnp.asarray(
        _linear_interp_matrix(2 * w2, w2, align_corners), dtype
    ).reshape(w2 // 2, 2, w2, 2)
    y = jnp.einsum("nqmp,bmwpxc->bnwqxc", Ah, x6)
    y = jnp.einsum("jQwx,bnwqxc->bnjqQc", Aw, y)
    return y.reshape(b, h2 // 2, w2 // 2, 4 * c)


def avg_pool_2x(x):
    """2x2/stride-2 average pool on NHWC."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def avg_pool_2x_1d(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 1), (1, 2, 1), "VALID"
    ) * 0.5


def max_pool_2x(x):
    """2x2/stride-2 max pool on NHWC (self-attention KV downsample)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def max_pool(x, window: int, stride: int, padding: str = "VALID"):
    """General max pool on NHWC (Inception stem uses 3x3/2)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1), padding,
    )
