"""Pre-resized uint8 image archive dataset + offline prep CLI.

Parity: reference tartangan/image_bytes_dataset.py. The archive is an
``.npz`` with an ``images`` array of shape (N, H, W, C) uint8, built offline
by LANCZOS-resizing a folder of images (``python -m
tartangan_tpu.data.image_bytes SRC DST --resize N [--square] [--trunc K]``).

TPU-first dataflow: the whole archive lives in host RAM as uint8; per step we
take a vectorized random crop (numpy, zero-copy-ish) and ship the *uint8*
crops to device — normalization to [-1, 1] happens on-chip inside the jitted
train step, quartering host->HBM transfer bytes vs sending float32. The
reference instead runs PIL->RandomCrop->ToTensor->Normalize per item on host
(trainer.py:68-77).
"""
from __future__ import annotations

import numpy as np
from PIL import Image

from ..utils.fs import list_files_recursive, smart_open

IMG_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm",
                  ".tif", ".tiff", ".webp")


class ImageBytesDataset:
    """In-RAM uint8 archive; yields random-cropped uint8 NHWC batches."""

    def __init__(self, images: np.ndarray, crop_size: int | None = None):
        assert images.dtype == np.uint8 and images.ndim == 4
        self.images = images
        self.crop_size = crop_size

    def __len__(self):
        return self.images.shape[0]

    @property
    def image_size(self):
        return self.crop_size or self.images.shape[1]

    def batch(self, indices: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        """Gather + random-crop a batch (uint8 NHWC).

        Uses the native C++ batcher (native/crop.cpp) when available —
        one OpenMP pass of row memcpys — with a numpy fallback.
        """
        from .. import native

        _, h, w, _ = self.images.shape
        size = self.crop_size
        if size is None or (h == size and w == size):
            out = native.gather_batch(self.images, np.asarray(indices))
            return out if out is not None else self.images[indices]
        n = len(indices)
        ys = rng.integers(0, h - size + 1, size=n)
        xs = rng.integers(0, w - size + 1, size=n)
        out = native.crop_batch(self.images, np.asarray(indices), ys, xs,
                                size)
        if out is not None:
            return out
        imgs = self.images[indices]
        out = np.empty((n, size, size, imgs.shape[3]), dtype=np.uint8)
        for i in range(n):
            out[i] = imgs[i, ys[i]:ys[i] + size, xs[i]:xs[i] + size]
        return out

    @classmethod
    def from_path(cls, path, crop_size: int | None = None):
        """Load an ``.npz``/``.npy`` archive (image_bytes_dataset.py:43-49)."""
        with smart_open(path, "rb") as infile:
            images = np.load(infile)
            if isinstance(images, np.lib.npyio.NpzFile):
                images = images["images"]
            images = np.asarray(images)
        if images.ndim == 4 and images.shape[1] in (1, 3) \
                and images.shape[-1] not in (1, 3):
            # tolerate NCHW archives
            images = images.transpose(0, 2, 3, 1)
        return cls(np.ascontiguousarray(images, dtype=np.uint8),
                   crop_size=crop_size)

    @classmethod
    def prepare_data_from_path(cls, path, resize: int = 64, square: bool = False,
                               trunc: int | None = None) -> np.ndarray:
        """Walk a folder, LANCZOS-resize, stack to uint8
        (image_bytes_dataset.py:28-41, 64-92)."""
        filenames = list_files_recursive(path, IMG_EXTENSIONS)
        if trunc is not None:
            filenames = filenames[:trunc]
        images = []
        for filename in filenames:
            img = Image.open(filename).convert("RGB")
            img = _resize_lanczos(img, resize, square)
            images.append(np.asarray(img, dtype=np.uint8)[None])
        return np.vstack(images)


def _resize_lanczos(img: Image.Image, size: int, square: bool) -> Image.Image:
    if square:
        return img.resize((size, size), Image.LANCZOS)
    # preserve aspect ratio (short side = size), then center-crop to square —
    # the reference random-crops at prep time; center crop is deterministic
    # and the train-time RandomCrop still provides augmentation.
    w, h = img.size
    if w < h:
        nw, nh = size, max(round(h * size / w), size)
    else:
        nw, nh = max(round(w * size / h), size), size
    img = img.resize((nw, nh), Image.LANCZOS)
    left = (nw - size) // 2
    top = (nh - size) // 2
    return img.crop((left, top, left + size, top + size))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="Create image data from a folder.")
    p.add_argument("source", help="Root path of images")
    p.add_argument("destination", help="Output location of dataset")
    p.add_argument("--resize", type=int, default=64,
                   help="Width/height of saved images")
    p.add_argument("--trunc", type=int, default=None,
                   help="Take only first N samples")
    p.add_argument("--square", action="store_true",
                   help="Don't preserve aspect ratio")
    args = p.parse_args(argv)

    print(f'preparing data from "{args.source}"')
    data = ImageBytesDataset.prepare_data_from_path(
        args.source, resize=args.resize, square=args.square, trunc=args.trunc
    )
    print(f'saving dataset to "{args.destination}"')
    with smart_open(args.destination, "wb") as outfile:
        np.savez_compressed(outfile, images=data)


if __name__ == "__main__":
    main()
