"""Implicit Quantile Network head + quantile-Huber regression loss.

Parity: reference tartangan/models/iqn.py. The tau sampling is threaded
through JAX PRNG keys (no global RNG) so the whole head — tau sampling,
cosine embedding, multiplicative mix, and loss — fuses into the jitted
train step as one compute region.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import BatchNorm, Dense

Dtype = Any


class CosineQuantileEmbedding(nn.Module):
    """tau -> cos(pi * tau * [1..E]) -> Linear -> tanh (iqn.py:27-46)."""

    state_dims: int
    embedding_dims: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, quantiles, train: bool = True):
        # quantiles: (N, 1)
        rng = jnp.arange(1, self.embedding_dims + 1, dtype=jnp.float32)
        qs = quantiles.astype(jnp.float32) * np.pi * rng  # (N, E)
        qs = jnp.cos(qs).astype(self.dtype)
        qs = Dense(self.state_dims, in_features=self.embedding_dims,
                   dtype=self.dtype, name="to_state")(qs)
        return jnp.tanh(qs)


class QuantileEmbedding(nn.Module):
    """tau tiled -> Linear -> lrelu -> BN -> Linear -> BN (iqn.py:7-24)."""

    state_dims: int
    embedding_dims: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, quantiles, train: bool = True):
        qs = jnp.tile(quantiles.astype(self.dtype), (1, self.embedding_dims))
        qs = Dense(self.embedding_dims, in_features=self.embedding_dims,
                   dtype=self.dtype)(qs)
        qs = nn.leaky_relu(qs, 0.2)
        qs = BatchNorm(dtype=self.dtype)(qs, use_running_average=not train)
        qs = Dense(self.state_dims, in_features=self.embedding_dims,
                   dtype=self.dtype)(qs)
        return BatchNorm(dtype=self.dtype)(qs, use_running_average=not train)


class WeightedQuantileEmbedding(nn.Module):
    """Inverse-distance-weighted mixture over a learned quantile embedding
    table (iqn.py:49-73)."""

    state_dims: int
    num_embeddings: int = 20
    use_softmax: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, quantiles, train: bool = True):
        table = self.param(
            "quantile_embeddings",
            nn.initializers.normal(1.0),
            (self.num_embeddings, self.state_dims),
        ).astype(self.dtype)
        indexes = jnp.linspace(0.0, 1.0, self.num_embeddings)
        w = 1.0 / (jnp.abs(quantiles - indexes) + 1e-8)
        if self.use_softmax:
            w = jax.nn.softmax(w, axis=-1)
        else:
            w = w / jnp.sum(w, axis=-1, keepdims=True)
        return (w.astype(self.dtype) @ table)


class IQN(nn.Module):
    """Tile features per quantile and mix in the tau embedding (iqn.py:76-108).

    Reference instantiates the cosine embedding with ``quantile_dims=20``
    cosine features (iqn.py:78-85).
    """

    feature_dims: int
    quantile_dims: int = 20
    num_quantiles: int = 8
    mix: str = "mult"  # 'mult' | 'add'
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, rng, train: bool = True):
        batch_size = x.shape[0]
        x = jnp.tile(x, (self.num_quantiles, 1))  # (Q*B, F)
        taus = jax.random.uniform(
            rng, (batch_size * self.num_quantiles, 1), dtype=jnp.float32
        )
        emb = CosineQuantileEmbedding(
            self.feature_dims, self.quantile_dims, dtype=self.dtype,
            name="quantile_embedding",
        )(taus, train)
        if self.mix == "add":
            return x + emb, taus
        if self.mix.startswith("mult"):
            return x * emb, taus
        raise ValueError(f"Unknown mix method {self.mix}")


def iqn_loss(preds, target, taus, k: float = 1.0):
    """tau-weighted Huber quantile regression loss (iqn.py:111-130).

    preds: (Q*B, O); target: (B, O) or (B,); taus: (Q*B, O).
    """
    target = jax.lax.stop_gradient(target)
    if target.ndim == 1:
        target = target[..., None]
    batch_size = target.shape[0]
    output_dims = target.shape[-1]
    preds = preds.astype(jnp.float32)
    taus = jnp.reshape(taus, (-1, batch_size, output_dims))
    preds = jnp.reshape(preds, (-1, batch_size, output_dims))
    num_quantiles = preds.shape[0]
    target = jnp.broadcast_to(target[None], (num_quantiles, batch_size, output_dims))
    err = target.astype(jnp.float32) - preds
    huber = jnp.where(
        jnp.abs(err) <= k,
        0.5 * jnp.square(err),
        k * (jnp.abs(err) - 0.5 * k),
    )
    weight = jnp.abs(taus - (err < 0).astype(jnp.float32))
    return jnp.mean(jnp.sum(weight * huber, axis=0))
