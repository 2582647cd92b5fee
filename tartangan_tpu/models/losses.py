"""GAN losses: BCE-with-logits, hinge, R1 gradient penalty.

Parity: reference tartangan/models/losses.py plus the BCE path the live
trainers actually use (trainers/cnn.py:131,147). The R1 penalty is expressed
as ``jax.grad`` through the discriminator w.r.t. its *input* — the JAX-native
form of ``torch.autograd.grad(create_graph=True)`` (losses.py:17-30) — and
differentiates cleanly again for the parameter gradient (grad-of-grad).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits, labels):
    """Mean binary cross entropy on raw logits (torch BCEWithLogitsLoss)."""
    logits = logits.astype(jnp.float32)
    labels = labels.astype(jnp.float32)
    neg_abs = -jnp.abs(logits)
    loss = jnp.maximum(logits, 0.0) - logits * labels + jnp.log1p(jnp.exp(neg_abs))
    return jnp.mean(loss)


def discriminator_hinge_loss(real, fake):
    """(losses.py:7-10)"""
    loss_real = jnp.mean(jax.nn.relu(1.0 - real.astype(jnp.float32)))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + fake.astype(jnp.float32)))
    return loss_real, loss_fake


def generator_hinge_loss(fake):
    """(losses.py:13-14)"""
    return -jnp.mean(fake.astype(jnp.float32))


def r1_gradient_penalty(d_apply_fn, real):
    """R1 penalty: sum over pixels of ||d D(x)/dx||^2, mean over batch
    (losses.py:17-30, https://arxiv.org/pdf/1801.04406.pdf).

    ``d_apply_fn(x) -> logits`` must be differentiable; we grad the summed
    logits w.r.t. the input image batch. Returns (penalty, logits).
    """
    def summed(x):
        logits = d_apply_fn(x)
        return jnp.sum(logits.astype(jnp.float32)), logits

    grads, logits = jax.grad(summed, has_aux=True)(real)
    grads = grads.astype(jnp.float32)
    penalty = jnp.mean(jnp.sum(
        jnp.square(grads).reshape(real.shape[0], -1), axis=1))
    return penalty, logits
