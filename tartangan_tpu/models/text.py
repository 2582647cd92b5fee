"""SkipGram embedding model (negative sampling) + nearest-neighbor decode.

Parity: reference tartangan/models/text.py:28-69. The embedding is trained
jointly with the text GAN (trainers/text_cnn.py:163-182); ``lookup`` decodes
generated embedding sequences back to vocab indices by scaled dot-product
nearest neighbor, skipping the <unk> row (text.py:57-69 — whose off-by-one
on the skipped row we fix by adding the offset back).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class SkipGram(nn.Module):
    num_items: int
    item_dims: int
    dtype: Dtype = jnp.float32

    def setup(self):
        init = nn.initializers.normal(1.0)
        self.embedding_u = self.param(
            "embedding_u", init, (self.num_items, self.item_dims))
        self.embedding_v = self.param(
            "embedding_v", init, (self.num_items, self.item_dims))

    def __call__(self, x):
        """Embed token ids -> (B, L, D)."""
        return jnp.take(self.embedding_u, x, axis=0).astype(self.dtype)

    def loss(self, words, contexts, neg_rng):
        """Negative-sampling skip-gram loss (text.py:42-55).
        words: (B,), contexts: (B, C)."""
        emb_u = jnp.take(self.embedding_u, words, axis=0)      # (B, D)
        emb_v = jnp.take(self.embedding_v, contexts, axis=0)   # (B, C, D)
        scores = jnp.einsum("bcd,bd->bc", emb_v, emb_u)
        pos_loss = jnp.sum(jax.nn.log_sigmoid(scores), axis=1)

        negatives = jax.random.randint(
            neg_rng, contexts.shape, 0, self.num_items)
        emb_v_neg = jnp.take(self.embedding_v, negatives, axis=0)
        neg_scores = jnp.einsum("bcd,bd->bc", emb_v_neg, emb_u)
        neg_loss = jnp.sum(jax.nn.log_sigmoid(-neg_scores), axis=1)
        return -jnp.mean(pos_loss + neg_loss)


def skipgram_lookup(embedding_u, zs, skip_first: int = 1):
    """Nearest-vocab decode of generated embeddings.

    embedding_u: (V, D); zs: (B, L, D) -> (B, L) int32 ids.
    Scores are ``(w @ z) / ||w||`` as in the reference (text.py:62-68).
    """
    w = embedding_u.astype(jnp.float32)
    w_norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=1))[:, None]
    scores = jnp.einsum("vd,bld->bvl", w, zs.astype(jnp.float32))
    scores = scores / w_norm
    return jnp.argmax(scores[:, skip_first:, :], axis=1) + skip_first
