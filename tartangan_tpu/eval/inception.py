"""Inception wrapper + activation accumulation for FID/IS.

Parity: reference inception_utils.py:35-92 (WrapInception: renormalize
[-1,1] images to VGG stats, bilinear-resize to 299 with align_corners=True,
run the net, return pool2048 + logits) and :249-268 (accumulation loop).

TPU design: the normalize+resize+forward is one jitted function; moment
accumulation is streaming (sum / outer-product sums on device) instead of
materializing a (N, 2048) matrix on host. Under data parallelism the caller
feeds batch-sharded images (the FID component shards ``sample_g`` over the
trainer mesh) and replicates the net via ``replicate_over``; GSPMD then
shards the activation stack and inserts the psums for the axis-0 moment
reductions (SURVEY.md section 5 'Distributed' row; pinned 1-vs-8-device by
``tests/test_distributed_equivalence.py::test_fid_moments_match_across_mesh_sizes``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.inception import init_inception, resolve_pretrained
from ..ops.resize import resize_bilinear

VGG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
VGG_STD = np.array([0.229, 0.224, 0.225], np.float32)


class InceptionWrapper:
    """Callable (B,H,W,3) in [-1,1] -> (pool (B,2048) f32, softmax logits).

    ``weights`` names a ported-weights npz (see
    ``tartangan_tpu.eval.port_weights``); when omitted the
    TARTANGAN_INCEPTION_WEIGHTS env var and a local torchvision install are
    tried before falling back to random init (``self.pretrained`` records
    which happened — FID from a random-init Inception is NOT comparable to
    published numbers).
    """

    def __init__(self, dtype=jnp.float32, pretrained: bool = True,
                 weights: str | None = None):
        self.model, variables = init_inception(dtype=dtype)
        if pretrained:
            variables, self.pretrained = resolve_pretrained(
                variables, weights_path=weights)
        else:
            self.pretrained = False
        self.variables = variables
        self._forward = _inception_forward

    def replicate_over(self, mesh):
        """Replicate the Inception weights over a device mesh so the jitted
        forward accepts batch-sharded images (GSPMD then shards the whole
        activation stack over the data axis and psums the moment sums)."""
        from ..parallel.mesh import replicated_sharding
        self.variables = jax.device_put(
            self.variables, replicated_sharding(mesh))

    def __call__(self, images):
        return self._forward(self.model, self.variables, images)


@functools.partial(jax.jit, static_argnums=0)
def _inception_forward(model, variables, images):
    # module-level so the compiled forward is shared across wrapper
    # instances (flax modules hash by config; weights arrive as args)
    x = (images.astype(jnp.float32) + 1.0) / 2.0
    x = (x - VGG_MEAN) / VGG_STD
    if x.shape[1] != 299 or x.shape[2] != 299:
        x = resize_bilinear(x, 299, 299, align_corners=True)
    pool, logits = model.apply(variables, x)
    return pool, jax.nn.softmax(logits, axis=-1)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _accumulate_moments(sum_x, sum_xxt, pool):
    pool = pool.astype(jnp.float32)
    return sum_x + jnp.sum(pool, axis=0), sum_xxt + pool.T @ pool


def accumulate_activations(sample_fn, net: InceptionWrapper,
                           num_images: int):
    """Loop ``sample_fn()`` batches through the net until ``num_images``
    activations are gathered (reference inception_utils.py:249-268).

    Returns (softmax_logits ndarray (N,1000), mu (P,), sigma (P,P)) with
    moments computed via streaming sums on device; P is the net's pool
    width (2048 for InceptionV3), taken from the first batch.
    """
    logits_chunks = []
    n = 0
    sum_x = sum_xxt = None
    while n < num_images:
        images = sample_fn()
        pool, probs = net(images)
        if sum_x is None:
            p = pool.shape[-1]
            sum_x = jnp.zeros((p,), jnp.float32)
            sum_xxt = jnp.zeros((p, p), jnp.float32)
        sum_x, sum_xxt = _accumulate_moments(sum_x, sum_xxt, pool)
        logits_chunks.append(np.asarray(probs))
        n += images.shape[0]

    sum_x = np.asarray(sum_x, np.float64)
    sum_xxt = np.asarray(sum_xxt, np.float64)
    mu = sum_x / n
    # unbiased covariance, matching np.cov / torch_cov (fact = 1/(n-1))
    sigma = (sum_xxt - n * np.outer(mu, mu)) / max(n - 1, 1)
    return np.concatenate(logits_chunks, axis=0)[:], mu, sigma
