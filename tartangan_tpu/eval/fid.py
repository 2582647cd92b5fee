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
    """scipy.linalg.sqrtm reference path (inception_utils.py:149-202).

    Deviation from the reference: the eps-offset retry also fires when the
    result comes back *negative*, not only non-finite — rank-deficient
    covariances (fewer activations than the 2048 feature dims) make
    sqrtm(S1 S2) overestimate its trace, and a squared distance below 0 is
    definitionally a numerical failure. For trustworthy absolute numbers
    feed >= 2048 samples on both sides; the retry keeps small-sample
    smoke runs sane rather than silently wrong-signed.
    """
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    def _sqrtm(m):
        out = linalg.sqrtm(m)
        return out[0] if isinstance(out, tuple) else out

    def _distance(s1, s2):
        covmean = _sqrtm(s1.dot(s2))
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        diff = mu1 - mu2
        return float(diff.dot(diff) + np.trace(s1) + np.trace(s2)
                     - 2 * np.trace(covmean))

    value = _distance(sigma1, sigma2)
    if not np.isfinite(value) or value < 0:
        offset = np.eye(sigma1.shape[0]) * eps
        value = _distance(sigma1 + offset, sigma2 + offset)
    return value


def inception_score(probs: np.ndarray, num_splits: int = 10):
    """Split-KL Inception Score over softmax'd logits
    (reference inception_utils.py:239-246).

    Probabilities are floored at a tiny eps before the logs: f32 softmax
    underflows to exact 0 for saturated logits, which turns the reference
    formula into nan (0 * -inf) without changing any non-degenerate score.
    """
    scores = []
    chunk = probs.shape[0] // num_splits
    eps = np.float64(1e-16)
    for index in range(num_splits):
        part = np.maximum(probs[index * chunk:(index + 1) * chunk], eps)
        kl = part * (np.log(part) - np.log(np.mean(part, axis=0, keepdims=True)))
        scores.append(np.exp(np.mean(np.sum(kl, axis=1))))
    return float(np.mean(scores)), float(np.std(scores))


def robust_frechet(mu, sigma, data_mu, data_sigma):
    """FID via the on-device Newton-Schulz path, falling back to float64
    scipy sqrtm whenever the f32 iteration fails.

    Failure shows up two ways on ill-conditioned covariances (e.g. when
    fewer than 2048 activations make sigma rank-deficient): non-finite
    values, and *finite but negative* distances — the squared Frechet
    distance is nonnegative by definition, so either triggers the fallback.
    """
    import jax.numpy as jnp

    fid = float(frechet_distance(
        jnp.asarray(mu), jnp.asarray(sigma),
        jnp.asarray(data_mu), jnp.asarray(data_sigma)))
    if not np.isfinite(fid) or fid < 0:
        fid = numpy_frechet_distance(mu, sigma, data_mu, data_sigma)
    return fid


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
            fid = robust_frechet(mu, sigma, data_mu, data_sigma)
        else:
            fid = numpy_frechet_distance(mu, sigma, data_mu, data_sigma)
        return is_mean, is_std, fid

    return get_inception_metrics
