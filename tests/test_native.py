"""Native C++ batcher: correctness vs the numpy path."""
import numpy as np
import pytest

from tartangan_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_crop_batch_matches_numpy(lib, rng):
    images = rng.integers(0, 256, (10, 12, 14, 3), dtype=np.uint8)
    indices = np.array([3, 1, 7, 7])
    ys = np.array([0, 2, 4, 1], np.int32)
    xs = np.array([5, 0, 3, 2], np.int32)
    size = 8
    out = native.crop_batch(images, indices, ys, xs, size)
    assert out is not None
    for row, (i, y, x) in enumerate(zip(indices, ys, xs)):
        np.testing.assert_array_equal(
            out[row], images[i, y:y + size, x:x + size])


def test_gather_batch_matches_numpy(lib, rng):
    images = rng.integers(0, 256, (6, 5, 5, 3), dtype=np.uint8)
    indices = np.array([5, 0, 2])
    out = native.gather_batch(images, indices)
    assert out is not None
    np.testing.assert_array_equal(out, images[indices])


def test_dataset_uses_native(lib, rng):
    from tartangan_tpu.data.image_bytes import ImageBytesDataset
    images = rng.integers(0, 256, (10, 16, 16, 3), dtype=np.uint8)
    ds = ImageBytesDataset(images, crop_size=8)
    batch = ds.batch(np.arange(4), rng)
    assert batch.shape == (4, 8, 8, 3)
    assert batch.dtype == np.uint8
