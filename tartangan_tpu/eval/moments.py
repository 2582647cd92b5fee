"""Offline dataset Inception-moments CLI.

Parity: reference calculate_inception_moments.py — iterate the dataset
through the Inception net, compute mu/sigma of pool3 activations + the
dataset IS, save npz. Usage:

    python -m tartangan_tpu.eval.moments DATASET OUT.npz [--batch-size N]
"""
from __future__ import annotations

import numpy as np

from ..data.image_bytes import ImageBytesDataset
from ..utils.fs import smart_open
from .fid import inception_score
from .inception import InceptionWrapper, accumulate_activations


def calculate_inception_moments(dataset, batch_size=32, quiet=False,
                                net=None, shuffle=True, seed=0):
    """Returns (mu, sigma) of the dataset's Inception pool activations and
    prints the dataset IS (reference calculate_inception_moments.py:28-55).
    """
    net = net or InceptionWrapper()
    rng = np.random.default_rng(seed)
    n = len(dataset)
    order = rng.permutation(n) if shuffle else np.arange(n)
    num_batches = n // batch_size
    pos = {"i": 0}

    def sample_fn():
        i = pos["i"] % num_batches
        pos["i"] += 1
        idx = order[i * batch_size:(i + 1) * batch_size]
        imgs = dataset.batch(idx, rng).astype(np.float32) / 127.5 - 1.0
        return imgs

    total = num_batches * batch_size
    if total <= 2048 and not quiet:
        print(f"WARNING: only {total} activations — the 2048-dim pool "
              "covariance is rank-deficient; FID against these moments "
              "leans on the eps-offset fallback (use > 2048 images for "
              "trustworthy numbers)")
    probs, mu, sigma = accumulate_activations(sample_fn, net, total)
    if not quiet:
        is_mean, is_std = inception_score(probs)
        print("Training data from dataset has IS of "
              f"{is_mean:.5f} +/- {is_std:.5f}")
    return mu, sigma


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Calculate Inception moments of a dataset.")
    p.add_argument("source", help="Root path of dataset (npz archive)")
    p.add_argument("destination", help="Output npz location")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--quiet-logs", action="store_true")
    p.add_argument("--inception-weights", default=None,
                   help="Ported Inception-weights npz (see "
                        "tartangan_tpu.eval.port_weights); falls back to "
                        "$TARTANGAN_INCEPTION_WEIGHTS")
    args = p.parse_args(argv)

    print(f"Loading dataset from {args.source}")
    dataset = ImageBytesDataset.from_path(args.source)
    net = InceptionWrapper(weights=args.inception_weights)
    if not net.pretrained:
        print("WARNING: no pretrained Inception weights — the moments below "
              "come from a random-init network and are not comparable to "
              "published FID numbers")
    mu, sigma = calculate_inception_moments(
        dataset, batch_size=args.batch_size, quiet=args.quiet_logs, net=net)
    print(f'Saving calculated means and covariances to "{args.destination}"')
    with smart_open(args.destination, "wb") as outfile:
        np.savez(outfile, mu=mu, sigma=sigma)


if __name__ == "__main__":
    main()
