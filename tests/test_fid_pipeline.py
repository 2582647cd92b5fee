"""FID pipeline integration: moments CLI -> FID training component.

Validates plumbing and that FID(dataset, dataset-like generator) is finite
and ordering-sane. Uses a small deterministic stand-in net (64-dim pool):
at 2048 dims the Newton-Schulz sqrtm alone costs ~30 s of 1-core CPU per
FID call, and the REAL InceptionV3 graph at full width is already pinned
end-to-end (moments CLI -> --fid training) by test_fid_recipe.py.
"""
import numpy as np
import pytest

import tartangan_tpu.eval.inception as einc


class _TinyNet:
    """InceptionWrapper stand-in: fixed random projection -> (pool, probs).

    Deterministic and input-sensitive, so moments/FID over it behave like
    a real feature extractor (same-distribution FID small, noise FID big).
    """

    pool_dims = 64

    def __init__(self, *a, **kw):
        rng = np.random.default_rng(7)
        self.w = rng.standard_normal((3 * 8 * 8, self.pool_dims)).astype(
            np.float32) / 8.0
        self.wc = rng.standard_normal((self.pool_dims, 10)).astype(
            np.float32)

    def __call__(self, images):
        x = np.asarray(images, np.float32)
        b, h, w, c = x.shape
        # 8x8 average-pool grid -> flatten -> fixed projection
        x = x.reshape(b, 8, h // 8, 8, w // 8, c).mean((2, 4))
        pool = np.tanh(x.reshape(b, -1) @ self.w)
        logits = pool @ self.wc
        e = np.exp(logits - logits.max(-1, keepdims=True))
        return pool, e / e.sum(-1, keepdims=True)


@pytest.fixture(scope="module")
def small_net():
    return _TinyNet()


def test_moments_and_fid_closure(tmp_path, rng, small_net, monkeypatch):
    from tartangan_tpu.data.image_bytes import ImageBytesDataset
    from tartangan_tpu.eval import fid as efid
    from tartangan_tpu.eval.moments import calculate_inception_moments
    from tartangan_tpu.utils.fs import smart_open

    images = rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
    ds = ImageBytesDataset(images)
    mu, sigma = calculate_inception_moments(
        ds, batch_size=8, quiet=True, net=small_net)
    assert mu.shape == (small_net.pool_dims,)
    assert sigma.shape == (small_net.pool_dims, small_net.pool_dims)

    moments_path = tmp_path / "moments.npz"
    with smart_open(str(moments_path), "wb") as f:
        np.savez(f, mu=mu, sigma=sigma)

    # patch the closure to reuse the module-scoped net (skip re-init cost)
    monkeypatch.setattr(
        einc, "InceptionWrapper",
        lambda dtype=None, weights=None, **kw: small_net)
    get_metrics = efid.prepare_inception_metrics(str(moments_path))

    def sample_fn():
        idx = rng.integers(0, len(ds), 8)
        return ds.images[idx].astype(np.float32) / 127.5 - 1.0

    is_mean, is_std, fid = get_metrics(sample_fn, 16, num_splits=2)
    assert np.isfinite(is_mean) and np.isfinite(is_std)
    assert np.isfinite(fid)
    # samples drawn from the same distribution => small FID
    assert fid < 50.0

    # ordering sanity: a very different distribution must score worse
    def noise_fn():
        return rng.uniform(-1.0, 1.0, (8, 32, 32, 3)).astype(np.float32)

    _, _, fid_noise = get_metrics(noise_fn, 16, num_splits=2)
    assert fid_noise > fid


def test_inception_score_saturated_probs_finite():
    """f32 softmax can underflow to exact one-hot rows; IS must stay
    finite (reference formula nans on 0 * -inf)."""
    from tartangan_tpu.eval.fid import inception_score
    probs = np.zeros((40, 10), np.float32)
    probs[np.arange(40), np.arange(40) % 10] = 1.0
    mean, std = inception_score(probs, num_splits=4)
    assert np.isfinite(mean) and np.isfinite(std)
    assert mean > 1.0  # one-hot over 10 balanced classes => high IS


def test_robust_frechet_rank_deficient_falls_back():
    """Finite-but-negative f32 Newton-Schulz results must trigger the f64
    fallback: the squared Frechet distance is nonnegative by definition."""
    from tartangan_tpu.eval.fid import numpy_frechet_distance, robust_frechet
    rng = np.random.default_rng(0)
    # rank-8 covariance in 64 dims, large scale spread (ill-conditioned)
    a = rng.normal(0, 100.0, (8, 64))
    b = rng.normal(0, 0.01, (8, 64))
    sigma1 = a.T @ a / 8
    sigma2 = b.T @ b / 8
    mu1, mu2 = rng.normal(0, 1, 64), rng.normal(0, 1, 64)
    fid = robust_frechet(mu1, sigma1, mu2, sigma2)
    assert np.isfinite(fid) and fid >= 0
    ref = numpy_frechet_distance(mu1, sigma1, mu2, sigma2)
    np.testing.assert_allclose(fid, ref, rtol=1e-3)
