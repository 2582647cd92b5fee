"""Numeric parity tests for losses vs torch reference formulas."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.models.iqn import iqn_loss
from tartangan_tpu.models.losses import (
    bce_with_logits,
    discriminator_hinge_loss,
    generator_hinge_loss,
    r1_gradient_penalty,
)

torch = pytest.importorskip("torch")


def test_bce_with_logits_matches_torch(rng):
    logits = rng.standard_normal((16, 1)).astype(np.float32)
    labels = (rng.random((16, 1)) > 0.5).astype(np.float32)
    ours = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = float(torch.nn.functional.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(labels)))
    assert abs(ours - theirs) < 1e-4


def test_hinge_losses(rng):
    real = rng.standard_normal((8, 1)).astype(np.float32)
    fake = rng.standard_normal((8, 1)).astype(np.float32)
    lr, lf = discriminator_hinge_loss(jnp.asarray(real), jnp.asarray(fake))
    assert abs(float(lr) - np.mean(np.maximum(0, 1 - real))) < 1e-4
    assert abs(float(lf) - np.mean(np.maximum(0, 1 + fake))) < 1e-4
    assert abs(float(generator_hinge_loss(jnp.asarray(fake)))
               - (-np.mean(fake))) < 1e-4


def test_r1_penalty_quadratic():
    # D(x) = sum(a * x): grad = a, penalty = sum(a^2) (constant in x)
    a = jnp.arange(6, dtype=jnp.float32).reshape(1, 2, 3, 1)

    def d_fn(x):
        return jnp.sum(x * a, axis=(1, 2, 3), keepdims=False)[..., None]

    x = jnp.ones((4, 2, 3, 1))
    penalty, logits = r1_gradient_penalty(d_fn, x)
    assert abs(float(penalty) - float(jnp.sum(a * a))) < 1e-5
    assert logits.shape == (4, 1)


def test_iqn_loss_matches_torch_reference(rng):
    """Check against the exact reference formula (models/iqn.py:111-130)."""
    batch, q = 6, 8
    preds = rng.standard_normal((q * batch, 1)).astype(np.float32)
    target = (rng.random((batch, 1)) > 0.5).astype(np.float32)
    taus = rng.random((q * batch, 1)).astype(np.float32)

    ours = float(iqn_loss(jnp.asarray(preds), jnp.asarray(target),
                          jnp.asarray(taus)))

    # torch transliteration of the reference
    t_preds = torch.from_numpy(preds)
    t_target = torch.from_numpy(target)
    t_taus = torch.from_numpy(taus)
    k = 1.0
    num_quantiles = t_preds.shape[0] // batch
    t_taus = t_taus.reshape(-1, batch, 1)
    t_preds = t_preds.reshape(-1, batch, 1)
    t_target = t_target.repeat(num_quantiles, 1).reshape(-1, batch, 1)
    err = t_target - t_preds
    loss = torch.where(err.abs() <= k, 0.5 * err.pow(2),
                       k * (err.abs() - 0.5 * k))
    expected = float(((t_taus - (err < 0).float()).abs() * loss).sum(0).mean())
    assert abs(ours - expected) < 1e-5


def test_grad_of_r1_exists():
    """R1 must be twice differentiable (grad-of-grad for the D update)."""
    w = jnp.ones((3, 1))

    def loss(w):
        def d_fn(x):
            return jnp.tanh(x.reshape(x.shape[0], -1) @ w)
        x = jnp.ones((2, 3, 1, 1))
        penalty, _ = r1_gradient_penalty(d_fn, x)
        return penalty

    g = jax.grad(loss)(w)
    assert np.all(np.isfinite(np.asarray(g)))
