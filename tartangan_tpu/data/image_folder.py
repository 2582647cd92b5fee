"""Lazy-resize image-folder dataset with a pickleable RAM cache.

Parity: reference tartangan/image_folder_dataset.py:10-49 + the transform
applied in trainer.py:57-61 (LANCZOS resize to the model size, normalize to
[-1, 1]). We cache resized *uint8* arrays (4x smaller than float tensors);
normalization happens on device.
"""
from __future__ import annotations

import os
import pickle

import numpy as np
from PIL import Image

from ..utils.fs import list_files_recursive, maybe_makedirs
from .image_bytes import IMG_EXTENSIONS


class ImageFolderDataset:
    def __init__(self, root, image_size: int):
        self.root = root
        self.image_size = image_size
        self.image_filenames = list_files_recursive(root, IMG_EXTENSIONS)
        self._image_cache: dict[str, np.ndarray] = {}

    def __len__(self):
        return len(self.image_filenames)

    def _load(self, filename) -> np.ndarray:
        cached = self._image_cache.get(filename)
        if cached is None:
            img = Image.open(filename).convert("RGB")
            img = img.resize((self.image_size, self.image_size), Image.LANCZOS)
            cached = np.asarray(img, dtype=np.uint8)
            self._image_cache[filename] = cached
        return cached

    def batch(self, indices: np.ndarray, rng=None) -> np.ndarray:
        del rng  # no crop augmentation on this path (parity with reference)
        return np.stack([
            self._load(self.image_filenames[i]) for i in indices
        ])

    def load_cache(self, filename):
        """(image_folder_dataset.py:28-31)"""
        if os.path.exists(filename):
            with open(filename, "rb") as infile:
                self._image_cache = pickle.load(infile)

    def save_cache(self, filename):
        """(image_folder_dataset.py:33-37)"""
        if os.path.dirname(filename):
            maybe_makedirs(os.path.dirname(filename), exist_ok=True)
        with open(filename, "wb") as outfile:
            pickle.dump(self._image_cache, outfile)
