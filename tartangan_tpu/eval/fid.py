"""FID + Inception Score math.

Parity: reference inception_utils.py —
- Newton-Schulz matrix sqrt, 20 iterations (:129-144, :232) — pure matmuls,
  expressed as a ``lax.fori_loop`` so it is one compiled loop on the MXU
- Frechet distance (:205-235) with the scipy ``sqrtm`` numpy fallback
  (:149-202)
- Inception Score over softmax'd logits with split KL (:239-246)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def sqrt_newton_schulz(a, num_iters: int = 20):
    """Matrix square root of a (single) PSD matrix via Newton-Schulz."""
    a = a.astype(jnp.float32)
    dim = a.shape[0]
    norm_a = jnp.sqrt(jnp.sum(a * a))
    y0 = a / norm_a
    eye = jnp.eye(dim, dtype=jnp.float32)

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - z @ y)
        return y @ t, t @ z

    y, _ = jax.lax.fori_loop(0, num_iters, body, (y0, eye))
    return y * jnp.sqrt(norm_a)


@jax.jit
def frechet_distance(mu1, sigma1, mu2, sigma2):
    """d^2 = ||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2))
    (reference inception_utils.py:205-235)."""
    mu1 = mu1.astype(jnp.float32)
    mu2 = mu2.astype(jnp.float32)
    sigma1 = sigma1.astype(jnp.float32)
    sigma2 = sigma2.astype(jnp.float32)
    diff = mu1 - mu2
    covmean = sqrt_newton_schulz(sigma1 @ sigma2, 20)
    return (diff @ diff + jnp.trace(sigma1) + jnp.trace(sigma2)
            - 2.0 * jnp.trace(covmean))


def numpy_frechet_distance(mu1, sigma1, mu2, sigma2, eps=1e-6):
    """scipy.linalg.sqrtm reference path (inception_utils.py:149-202)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    def _sqrtm(m):
        out = linalg.sqrtm(m)
        return out[0] if isinstance(out, tuple) else out

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def inception_score(probs: np.ndarray, num_splits: int = 10):
    """Split-KL Inception Score over softmax'd logits
    (reference inception_utils.py:239-246)."""
    scores = []
    chunk = probs.shape[0] // num_splits
    for index in range(num_splits):
        part = probs[index * chunk:(index + 1) * chunk]
        kl = part * (np.log(part) - np.log(np.mean(part, axis=0, keepdims=True)))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))


def prepare_inception_metrics(moments_path, dtype=None, no_fid: bool = False,
                              weights=None):
    """Load the dataset moments and return a closure
    ``get_inception_metrics(sample_fn, num_images, num_splits, use_jax)``
    -> (IS_mean, IS_std, FID) (reference inception_utils.py:285-328).
    ``weights`` optionally names a ported Inception-weights npz."""
    import jax.numpy as jnp

    from ..utils.fs import smart_open
    from .inception import InceptionWrapper, accumulate_activations

    with smart_open(moments_path, "rb") as infile:
        data = np.load(infile)
        data_mu = np.asarray(data["mu"])
        data_sigma = np.asarray(data["sigma"])

    net = InceptionWrapper(dtype=dtype or jnp.float32, weights=weights)

    def get_inception_metrics(sample_fn, num_inception_images,
                              num_splits=10, prints=False, use_jax=True):
        if prints:
            print("Gathering activations...")
        probs, mu, sigma = accumulate_activations(
            sample_fn, net, num_inception_images)
        is_mean, is_std = inception_score(probs, num_splits)
        if no_fid:
            fid = 9999.0
        elif use_jax:
            fid = float(frechet_distance(
                jnp.asarray(mu), jnp.asarray(sigma),
                jnp.asarray(data_mu), jnp.asarray(data_sigma)))
            if not np.isfinite(fid):
                # f32 Newton-Schulz can diverge on ill-conditioned
                # covariances; fall back to float64 scipy sqrtm
                fid = numpy_frechet_distance(mu, sigma, data_mu, data_sigma)
        else:
            fid = numpy_frechet_distance(mu, sigma, data_mu, data_sigma)
        return is_mean, is_std, fid

    return get_inception_metrics
