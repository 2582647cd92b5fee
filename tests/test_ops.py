"""Unit tests for resampling ops against reference (torch) semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.ops import (
    avg_pool_2x,
    downsample_bilinear_half,
    max_pool_2x,
    resize_bilinear,
    upsample_nearest_2x,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def _nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


def _nchw(a):
    return torch.from_numpy(np.asarray(a, np.float32)).permute(0, 3, 1, 2)


def test_upsample_nearest_2x_matches_torch(rng):
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(upsample_nearest_2x(jnp.asarray(x)))
    theirs = _nhwc(TF.interpolate(_nchw(x), scale_factor=2, mode="nearest"))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_bilinear_half_matches_torch_align_corners(rng):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    ours = np.asarray(downsample_bilinear_half(jnp.asarray(x)))
    theirs = _nhwc(TF.interpolate(
        _nchw(x), scale_factor=0.5, mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_bilinear_upsample_299_matches_torch(rng):
    # the Inception wrapper path (inception_utils.py:49)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(x), 299, 299))
    theirs = _nhwc(TF.interpolate(
        _nchw(x), size=(299, 299), mode="bilinear", align_corners=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_avg_pool_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(avg_pool_2x(jnp.asarray(x)))
    theirs = _nhwc(TF.avg_pool2d(_nchw(x), 2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_max_pool_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    ours = np.asarray(max_pool_2x(jnp.asarray(x)))
    theirs = _nhwc(TF.max_pool2d(_nchw(x), 2))
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)
