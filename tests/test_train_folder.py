"""Trainer end-to-end over the ImageFolderDataset path (directory input),
including the --cache-dataset save/load cycle — reference trainer.py:53-66,
108-111."""
import os

import numpy as np
from PIL import Image

from tartangan_tpu.train.cnn import CNNTrainer


def _write_images(root, n=24, size=20):
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(5)
    for i in range(n):
        arr = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img_{i}.png")


def test_folder_dataset_training_with_cache(tmp_path):
    img_dir = tmp_path / "imgs"
    _write_images(img_dir)
    cache_tpl = str(tmp_path / "cache" / "{root}_{size}.pkl")
    argv = [
        str(img_dir), "--config", "8", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", "folder",
        "--dtype", "f32", "--quiet-logs",
        "--cache-dataset", "--dataset-cache", cache_tpl,
    ]
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()
    assert trainer.steps == 3
    # cache written after epoch 1
    cache_dir = tmp_path / "cache"
    assert cache_dir.exists() and len(os.listdir(cache_dir)) == 1

    # second run loads the cache (exercises prepare_dataset's load path)
    trainer2 = CNNTrainer.create_from_cli(
        argv[:argv.index("folder")] + ["folder2"] + argv[
            argv.index("folder") + 1:])
    trainer2.train()
    assert trainer2.steps == 3
    assert len(trainer2.dataset._image_cache) == 24  # preloaded from pickle
