"""Shared pieces of the jitted train steps."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..ops.init import selu_normal


def normalize_batch(batch_u8, dtype):
    """uint8 NHWC -> dtype in [-1, 1]. Runs on device inside the step
    (the reference normalizes on host: trainer.py:72-77)."""
    return batch_u8.astype(dtype) / jnp.asarray(127.5, dtype) - 1.0


def apply_model(model, params, stats, *args, train=True, rngs=None, **kwargs):
    """Apply a flax module threading BatchNorm batch_stats.

    Returns (output, new_stats). ``stats`` may be an empty dict when the
    model has no norm layers (``--norm id``).
    """
    variables = {"params": params}
    if stats:
        variables["batch_stats"] = stats
    out, updates = model.apply(
        variables, *args, train=train, mutable=["batch_stats"],
        rngs=rngs, **kwargs,
    )
    return out, updates.get("batch_stats", stats)


def make_adam(lr: float):
    """torch.optim.Adam(lr, betas=(0., 0.999)) equivalent
    (reference trainers/cnn.py:84-85)."""
    return optax.adam(lr, b1=0.0, b2=0.999, eps=1e-8)


def ema_update(new_params, target_params, factor):
    """target += (new - target) * factor (reference trainers/cnn.py:158-165)."""
    return optax.incremental_update(new_params, target_params, factor)


def selu_reinit(key, params):
    """Re-initialize for SELU: matrix/conv params ~ N(0, 1/fan_in), 1-D
    params zeroed (reference trainers/cnn.py:97-105)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    new_leaves = []
    for k, leaf in zip(keys, leaves):
        if leaf.ndim <= 1:
            new_leaves.append(jnp.zeros_like(leaf))
        else:
            # fan_in = prod of all dims but the last (out features)
            fan_in = int(leaf.size // leaf.shape[-1])
            new_leaves.append(
                selu_normal(fan_in)(k, leaf.shape, leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def bce_labels(batch_size, real_first=True):
    """[1]*B + [0]*B adversarial labels (reference trainer.py:166-171)."""
    ones = jnp.ones((batch_size, 1), jnp.float32)
    zeros = jnp.zeros((batch_size, 1), jnp.float32)
    return jnp.concatenate([ones, zeros] if real_first else [zeros, ones], 0)
