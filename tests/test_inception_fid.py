"""Eval-stack tests: InceptionV3 port parity + FID math parity."""
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.eval.fid import (
    frechet_distance,
    inception_score,
    numpy_frechet_distance,
    sqrt_newton_schulz,
)

torch = pytest.importorskip("torch")


def _random_cov(rng, dim):
    a = rng.standard_normal((dim, dim)).astype(np.float32)
    return a @ a.T / dim + np.eye(dim, dtype=np.float32)


def test_newton_schulz_vs_scipy(rng):
    from scipy import linalg
    a = _random_cov(rng, 16)
    ours = np.asarray(sqrt_newton_schulz(jnp.asarray(a)))
    theirs = np.real(linalg.sqrtm(a.astype(np.float64)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_frechet_jax_matches_numpy(rng):
    dim = 12
    mu1 = rng.standard_normal(dim).astype(np.float32)
    mu2 = rng.standard_normal(dim).astype(np.float32)
    s1 = _random_cov(rng, dim)
    s2 = _random_cov(rng, dim)
    ours = float(frechet_distance(
        jnp.asarray(mu1), jnp.asarray(s1), jnp.asarray(mu2), jnp.asarray(s2)))
    theirs = numpy_frechet_distance(mu1, s1, mu2, s2)
    assert abs(ours - theirs) / max(abs(theirs), 1.0) < 1e-2


def test_inception_score_formula(rng):
    probs = rng.random((100, 10)).astype(np.float64)
    probs /= probs.sum(axis=1, keepdims=True)
    mean, std = inception_score(probs, num_splits=5)
    # reference formula transliteration
    scores = []
    for i in range(5):
        chunk = probs[i * 20:(i + 1) * 20]
        kl = chunk * (np.log(chunk) - np.log(np.expand_dims(
            np.mean(chunk, 0), 0)))
        scores.append(np.exp(np.mean(np.sum(kl, 1))))
    assert abs(mean - np.mean(scores)) < 1e-8
    assert abs(std - np.std(scores)) < 1e-8


@pytest.mark.slow
def test_inception_port_matches_torchvision(rng):
    """Port random torchvision weights into our flax model and compare
    pool/logits outputs — validates the architecture + porting exactly,
    with no pretrained download needed."""
    torchvision = pytest.importorskip("torchvision")
    from tartangan_tpu.models.inception import (
        init_inception,
        port_torch_state_dict,
    )

    net = torchvision.models.inception_v3(
        weights=None, transform_input=False, aux_logits=True, init_weights=False)
    net.eval()

    model, variables = init_inception()
    variables = port_torch_state_dict(variables, net.state_dict())

    x = rng.standard_normal((2, 299, 299, 3)).astype(np.float32) * 0.1
    pool_j, logits_j = model.apply(variables, jnp.asarray(x))

    with torch.no_grad():
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        # replicate the WrapInception layer sequence (pool3 + fc)
        import torch.nn.functional as TF
        h = net.Conv2d_1a_3x3(xt)
        h = net.Conv2d_2a_3x3(h)
        h = net.Conv2d_2b_3x3(h)
        h = TF.max_pool2d(h, kernel_size=3, stride=2)
        h = net.Conv2d_3b_1x1(h)
        h = net.Conv2d_4a_3x3(h)
        h = TF.max_pool2d(h, kernel_size=3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            h = getattr(net, name)(h)
        pool_t = torch.mean(h.view(h.size(0), h.size(1), -1), 2)
        logits_t = net.fc(pool_t)

    np.testing.assert_allclose(
        np.asarray(pool_j), pool_t.numpy(), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), rtol=1e-3, atol=1e-3)
