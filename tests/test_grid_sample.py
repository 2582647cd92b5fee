"""affine_grid/grid_sample parity vs torch."""
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.ops.grid_sample import affine_grid, grid_sample

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


@pytest.mark.parametrize("align_corners", [True, False])
def test_affine_grid_matches_torch(rng, align_corners):
    theta = rng.standard_normal((3, 2, 3)).astype(np.float32) * 0.5
    ours = np.asarray(affine_grid(jnp.asarray(theta), (3, 5, 7),
                                  align_corners=align_corners))
    theirs = TF.affine_grid(torch.from_numpy(theta), (3, 1, 5, 7),
                            align_corners=align_corners).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("align_corners", [True, False])
def test_grid_sample_matches_torch(rng, align_corners):
    x = rng.standard_normal((2, 6, 5, 3)).astype(np.float32)
    theta = np.tile(
        np.array([[0.8, 0.1, 0.05], [-0.1, 1.2, -0.02]], np.float32),
        (2, 1, 1))
    grid_t = TF.affine_grid(torch.from_numpy(theta), (2, 3, 8, 9),
                            align_corners=align_corners)
    theirs = TF.grid_sample(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), grid_t,
        mode="bilinear", padding_mode="zeros", align_corners=align_corners,
    ).numpy().transpose(0, 2, 3, 1)

    grid_j = affine_grid(jnp.asarray(theta), (2, 8, 9),
                         align_corners=align_corners)
    ours = np.asarray(grid_sample(jnp.asarray(x), grid_j,
                                  align_corners=align_corners))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)
