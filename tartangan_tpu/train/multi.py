"""Step chunking: run K train steps per device dispatch via ``lax.scan``.

TPU rationale: every launch of a compiled program through this relay
carries a ~60-67 ms fixed launch+fence cost (docs/PERF.md round-3 chip
model; on directly-attached TPUs the analogous cost is ~ms-scale
dispatch overhead). Folding K steps into ONE jitted ``lax.scan`` program
amortizes that fixed cost K-fold — at the '128' b128 step size it is a
~3x lever. The reference has no equivalent — its loop crosses the host
boundary several times per batch (reference trainers/cnn.py:109,153-156).

Two input modes:

- ``broadcast``: every inner step sees the same ``inputs`` operand — used
  with the ``--device-data`` HBM-resident archive, where each step samples
  its own batch on device (data/device.py).
- ``scan``: ``inputs`` carries a leading ``(K, ...)`` axis and inner step i
  consumes slice i — used for host-streamed batches, stacked K-at-a-time so
  the chunk costs one host->device transfer instead of K.

RNG: the chunk receives one key; the body splits it exactly like the host
loop's ``Trainer.next_key`` chain, so a fixed seed is deterministic for a
fixed ``--steps-per-call`` (the stream differs between different K — same
as the reference, where any change to the batch schedule shifts the rng
draw order).

Metrics: each leaf comes back stacked ``(K,)``; logs consumers take the
last element (``utils.scalars.last_scalar``).
"""
from __future__ import annotations

import jax


def chunk_train_step(step_fn, steps_per_call: int, batch_mode: str,
                     alt_step_fn=None, alt_interval: int = 1):
    """Wrap ``step_fn(state, batch, rng) -> (state, metrics)`` into a
    ``lax.scan`` over ``steps_per_call`` steps (one device dispatch).

    ``batch_mode``: 'broadcast' passes ``inputs`` unchanged to every inner
    step; 'scan' slices a leading (K, ...) axis off ``inputs``.

    ``alt_step_fn`` (with ``alt_interval > 1``) runs on every inner step
    whose GLOBAL index (``step0`` + chunk-local index) is NOT a multiple
    of ``alt_interval``; the primary ``step_fn`` runs on the multiples.
    Both branches compile once and must return identical tree structures
    — used for lazy R1 regularization (train/cnn.py ``r1_interval``).
    The trainer passes its running step counter as ``step0`` (a traced
    scalar operand, no recompiles), so the cadence is exact across chunk
    boundaries even when ``steps_per_call`` is not a multiple of
    ``alt_interval`` (ADVICE r3: the previous chunk-local indexing fired
    R1 on every chunk's step 0 — over-regularizing at the N-scaled
    weight whenever K < N).
    """
    if steps_per_call < 1:
        raise ValueError(f"steps_per_call must be >= 1: {steps_per_call}")
    if batch_mode not in ("broadcast", "scan"):
        raise ValueError(f"unknown batch_mode: {batch_mode}")

    def multi_step(state, inputs, rng, step0=0):
        import jax.numpy as jnp

        def body(carry, xs):
            st, key = carry
            i, x = xs
            key, sub = jax.random.split(key)
            batch = inputs if batch_mode == "broadcast" else x
            if alt_step_fn is None:
                st, metrics = step_fn(st, batch, sub)
            else:
                st, metrics = jax.lax.cond(
                    (step0 + i) % alt_interval == 0, step_fn, alt_step_fn,
                    st, batch, sub)
            return (st, key), metrics

        idx = jnp.arange(steps_per_call)
        xs = (idx, None) if batch_mode == "broadcast" else (idx, inputs)
        (state, _), metrics = jax.lax.scan(body, (state, rng), xs)
        return state, metrics

    return multi_step


def stack_batches(batch_iter, k: int):
    """Group a host batch iterator into stacked ``(K, B, ...)`` arrays.

    A trailing partial group is DROPPED — a smaller stack would be a new
    shape and force a recompile. With shuffled epochs the loss is at most
    K-1 batches per epoch.
    """
    import numpy as np

    group = []
    for batch in batch_iter:
        group.append(batch)
        if len(group) == k:
            yield np.stack(group)
            group = []
