"""Device-resident dataset: random batch gather + crop inside the jitted step.

Why this exists: the reference's hot loop ships every batch across the
host->device boundary (`imgs.to(self.device)`, reference trainers/cnn.py:109).
Here that per-step upload costs ~18 ms through the relay (measured honest,
docs/PERF.md) — a 33% end-to-end tax at config '128' b128, and far more on
hardware where the step itself is ~1 ms. The pre-resized uint8 archive is
small (N x H x W x 3 bytes — the 128px tartan archive is well under 1 GB),
so the TPU-first answer is to park the WHOLE archive in HBM once and move the
per-step work on-chip:

    host per step:   nothing (one rng-split + one dispatch)
    device per step: uniform index sample -> gather -> per-image random crop
                     (vmapped dynamic_slice) -> the usual fused train step

The sampling is uniform-with-replacement rather than the reference's
shuffled-epochs-without-replacement (trainer.py:84-86): an epoch is
``len(dataset) // batch_size`` steps, identical in expectation, and for GAN
training the distinction is statistically irrelevant while buying a
streaming-free design. This path is opt-in via ``--device-data``.

Under a data mesh the archive is sharded over its sample axis (each chip
holds N/D images) and the gathered batch is constrained to the batch
sharding; XLA's SPMD partitioner inserts the collective gather. With
tensor parallelism the archive stays sharded over the data axis only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_device_sampler(archive_shape, crop_size: int | None,
                        batch_size: int):
    """Build ``sample(archive_u8, key) -> uint8 (B, S, S, C)`` — the
    on-device equivalent of ImageBytesDataset.batch (gather + random crop,
    reference trainer.py:68-77's RandomCrop)."""
    n, h, w, c = archive_shape
    s = crop_size or h
    if s > h or s > w:
        raise ValueError(
            f"crop size {s} exceeds archive images ({h}x{w})")

    def sample(archive, key):
        k_idx, k_y, k_x = jax.random.split(key, 3)
        idx = jax.random.randint(k_idx, (batch_size,), 0, n)
        imgs = jnp.take(archive, idx, axis=0)
        if h == s and w == s:
            return imgs
        ys = jax.random.randint(k_y, (batch_size,), 0, h - s + 1)
        xs = jax.random.randint(k_x, (batch_size,), 0, w - s + 1)
        crop = jax.vmap(
            lambda img, y, x: jax.lax.dynamic_slice(img, (y, x, 0), (s, s, c))
        )
        return crop(imgs, ys, xs)

    return sample


def wrap_step_with_device_data(train_step, sampler, batch_sharding=None):
    """Fuse on-device batch sampling into a ``(state, batch_u8, rng)`` train
    step, producing ``(state, archive_u8, rng) -> (state, metrics)``.

    The archive argument is NOT donated (it is reused every step); jit the
    result with ``donate_argnums=(0,)`` exactly like the host-path step.
    """
    def device_step(state, archive, rng):
        k_batch, k_step = jax.random.split(rng)
        batch = sampler(archive, k_batch)
        if batch_sharding is not None:
            batch = jax.lax.with_sharding_constraint(batch, batch_sharding)
        return train_step(state, batch, k_step)

    return device_step


def archive_sharding(mesh):
    """Sharding for the resident archive: sample axis over ``data``."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS
    return NamedSharding(mesh, P(DATA_AXIS, None, None, None))
