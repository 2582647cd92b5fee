"""Coverage for the less-traveled blocks: pool-only D output, Gaussian
head, PixelNorm, alternative quantile embeddings, non-residual blocks."""
import jax
import jax.numpy as jnp
import numpy as np

from tartangan_tpu.models.blocks import (
    DiscriminatorBlock,
    DiscriminatorPoolOnlyOutput,
    GaussianParametersOutput,
    GeneratorBlock,
)
from tartangan_tpu.models.iqn import (
    QuantileEmbedding,
    WeightedQuantileEmbedding,
)
from tartangan_tpu.models.layers import PixelNorm


def test_pixel_norm():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 8)),
                    jnp.float32)
    y = PixelNorm().apply({}, x)
    norms = np.mean(np.square(np.asarray(y)), axis=-1)
    np.testing.assert_allclose(norms, np.ones_like(norms), rtol=1e-3)


def test_pool_only_outputs():
    x = jnp.ones((2, 8, 8, 6))
    for pool, expected_shape in (("sum", (2, 1)), ("avg", (2, 4))):
        mod = DiscriminatorPoolOnlyOutput(6, 4, pool=pool)
        variables = mod.init(jax.random.PRNGKey(0), x, train=True)
        out, _ = mod.apply(variables, x, train=True,
                           mutable=["batch_stats"])
        assert out.shape == expected_shape


def test_gaussian_parameters_output():
    x = jnp.ones((3, 12))
    mod = GaussianParametersOutput(12, 5)
    variables = mod.init(jax.random.PRNGKey(0), x)
    mu, log_sigma = mod.apply(variables, x)
    assert mu.shape == (3, 5)
    assert log_sigma.shape == (3, 5)


def test_quantile_embeddings():
    taus = jnp.asarray(
        np.random.default_rng(0).random((8, 1)), jnp.float32)
    for cls in (QuantileEmbedding, WeightedQuantileEmbedding):
        mod = cls(16)
        variables = mod.init(jax.random.PRNGKey(0), taus, train=True)
        out, _ = mod.apply(variables, taus, train=True,
                           mutable=["batch_stats"])
        assert out.shape == (8, 16)
        assert np.all(np.isfinite(np.asarray(out)))


def test_non_residual_blocks_dim_change():
    """The reference versions crash when in != out (generator.py:15-17);
    ours must handle it (documented deviation)."""
    g = GeneratorBlock(8, 12, first_block=False)
    x = jnp.ones((2, 4, 4, 8))
    variables = g.init(jax.random.PRNGKey(0), x, train=True)
    out, _ = g.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 8, 8, 12)

    d = DiscriminatorBlock(12, 8, first_block=False)
    variables = d.init(jax.random.PRNGKey(0), out, train=True)
    out2, _ = d.apply(variables, out, train=True, mutable=["batch_stats"])
    assert out2.shape == (2, 4, 4, 8)
