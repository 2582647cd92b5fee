"""Data-layer tests: bytes archive, prep CLI, folder dataset, prefetch."""
import numpy as np
from PIL import Image

from tartangan_tpu.data.image_bytes import ImageBytesDataset, main as prep_main
from tartangan_tpu.data.image_folder import ImageFolderDataset
from tartangan_tpu.data.prefetch import EpochBatcher, prefetch_to_device


def _write_images(root, n=6, size=(20, 24)):
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(1)
    for i in range(n):
        arr = rng.integers(0, 256, (*size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img_{i}.png")


def test_prep_cli_roundtrip(tmp_path):
    src = tmp_path / "imgs"
    _write_images(src)
    dst = tmp_path / "data.npz"
    prep_main([str(src), str(dst), "--resize", "8", "--square"])
    ds = ImageBytesDataset.from_path(str(dst))
    assert len(ds) == 6
    assert ds.images.shape == (6, 8, 8, 3)


def test_prep_cli_aspect_preserving(tmp_path):
    src = tmp_path / "imgs"
    _write_images(src, size=(20, 40))
    dst = tmp_path / "data.npz"
    prep_main([str(src), str(dst), "--resize", "8", "--trunc", "3"])
    ds = ImageBytesDataset.from_path(str(dst))
    assert ds.images.shape == (3, 8, 8, 3)


def test_random_crop_batch(tmp_path, rng):
    images = rng.integers(0, 256, (10, 16, 16, 3), dtype=np.uint8)
    ds = ImageBytesDataset(images, crop_size=8)
    batch = ds.batch(np.arange(4), rng)
    assert batch.shape == (4, 8, 8, 3)
    assert batch.dtype == np.uint8


def test_image_folder_dataset_and_cache(tmp_path):
    src = tmp_path / "imgs"
    _write_images(src)
    ds = ImageFolderDataset(str(src), image_size=8)
    batch = ds.batch(np.arange(4))
    assert batch.shape == (4, 8, 8, 3)
    cache = tmp_path / "cache.pkl"
    ds.save_cache(str(cache))
    ds2 = ImageFolderDataset(str(src), image_size=8)
    ds2.load_cache(str(cache))
    np.testing.assert_array_equal(ds2.batch(np.arange(4)), batch)


def test_epoch_batcher_drop_last(rng):
    images = rng.integers(0, 256, (10, 8, 8, 3), dtype=np.uint8)
    ds = ImageBytesDataset(images)
    batcher = EpochBatcher(ds, batch_size=4, seed=0)
    batches = list(batcher.epoch())
    assert len(batches) == 2  # drop_last
    assert all(b.shape == (4, 8, 8, 3) for b in batches)


def test_prefetch_passthrough(rng):
    items = [rng.standard_normal(3) for _ in range(5)]
    out = list(prefetch_to_device(iter(items), lambda x: x * 2))
    assert len(out) == 5
    np.testing.assert_allclose(out[0], items[0] * 2)
