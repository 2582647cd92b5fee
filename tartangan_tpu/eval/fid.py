"""FID + Inception Score math.

Parity: reference inception_utils.py —
- Newton-Schulz matrix sqrt, 20 iterations (:129-144, :232) — pure matmuls,
  expressed as a ``lax.fori_loop`` so it is one compiled loop on the MXU
- Frechet distance (:205-235) with the scipy ``sqrtm`` numpy fallback
  (:149-202)
- Inception Score over softmax'd logits with split KL (:239-246)
"""
from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


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
    """Float64 host fallback for the Frechet distance
    (reference inception_utils.py:149-202).

    Deviation from the reference's ``scipy.linalg.sqrtm(S1 S2)``: the
    trace of the matrix square root is computed through the symmetric
    form ``tr sqrt(S1 S2) = tr sqrt(R2 S1 R2)`` with ``R2 = sqrt(S2)``,
    both square roots via ``eigh`` with negative eigenvalues clipped to
    zero. For PSD covariances this is the same quantity, but it cannot
    go complex or overestimate the trace the way non-symmetric sqrtm
    does on rank-deficient inputs (fewer activations than the 2048
    feature dims) — which previously produced *negative* "FIDs" that the
    eps-offset retry did not always repair. The result is clamped at 0:
    the squared Frechet distance is nonnegative by definition, so
    anything below is numerical noise. For trustworthy absolute numbers
    feed >= 2048 samples on both sides.
    """
    mu1 = np.atleast_1d(np.asarray(mu1, np.float64))
    mu2 = np.atleast_1d(np.asarray(mu2, np.float64))
    sigma1 = np.atleast_2d(np.asarray(sigma1, np.float64))
    sigma2 = np.atleast_2d(np.asarray(sigma2, np.float64))

    def _psd_sqrt(m):
        vals, vecs = np.linalg.eigh((m + m.T) / 2.0)
        vals = np.sqrt(np.clip(vals, 0.0, None))
        return (vecs * vals) @ vecs.T

    def _tr_sqrt(s1, s2):
        r2 = _psd_sqrt(s2)
        inner = r2 @ s1 @ r2
        vals = np.linalg.eigvalsh((inner + inner.T) / 2.0)
        return (float(np.sum(np.sqrt(np.clip(vals, 0.0, None)))),
                float(vals.min(initial=0.0)),
                float(np.abs(vals).max(initial=0.0)))

    # eps-free first pass; the offset is a *retry* for materially indefinite
    # inputs only (matching the reference's conditional offset,
    # inception_utils.py:170-178) — applying it unconditionally biases every
    # FID by a small constant (ADVICE r2). The indefiniteness test is
    # RELATIVE to the spectrum's scale (eigenvalues of r2 s1 r2 scale with
    # activation magnitude squared — an absolute cutoff spuriously fires on
    # large-scale covariances and misses small-scale ones; ADVICE r3).
    tr_covmean, min_eig, scale = _tr_sqrt(sigma1, sigma2)
    if min_eig < -1e-6 * max(scale, np.finfo(np.float64).tiny):
        logger.info(
            "FID sqrtm retry with eps=%g offset (min eigenvalue %.3g)",
            eps, min_eig)
        eye = np.eye(sigma1.shape[0])
        tr_covmean, _, _ = _tr_sqrt(sigma1 + eye * eps, sigma2 + eye * eps)
    diff = mu1 - mu2
    value = float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                  - 2.0 * tr_covmean)
    if value < 0:
        # numerical noise below the mathematical floor — say so rather
        # than reporting an ambiguous exact 0
        logger.info(
            "FID clamped to 0 (raw %.4g: below numerical resolution — "
            "distributions match to within noise)", value)
        value = 0.0
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
                              weights=None, mesh=None):
    """Load the dataset moments and return a closure
    ``get_inception_metrics(sample_fn, num_images, num_splits, use_jax)``
    -> (IS_mean, IS_std, FID) (reference inception_utils.py:285-328).
    ``weights`` optionally names a ported Inception-weights npz. ``mesh``
    replicates the Inception weights over a device mesh so batch-sharded
    sample batches stream through under data parallelism."""
    import jax.numpy as jnp

    from ..utils.fs import smart_open
    from .inception import InceptionWrapper, accumulate_activations

    with smart_open(moments_path, "rb") as infile:
        data = np.load(infile)
        data_mu = np.asarray(data["mu"])
        data_sigma = np.asarray(data["sigma"])

    net = InceptionWrapper(dtype=dtype or jnp.float32, weights=weights)
    if mesh is not None and mesh.devices.size > 1:
        net.replicate_over(mesh)

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
