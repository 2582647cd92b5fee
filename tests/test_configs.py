"""Config registry integrity + model assembly across named configs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.configs import GAN_CONFIGS
from tartangan_tpu.models import factories as F
from tartangan_tpu.models.pluggan import Discriminator, Generator

EXPECTED_SIZES = {
    "8": 8,  # ours: minimal test/smoke config
    "16": 16, "32": 32, "64": 64, "128": 128, "128big": 128,
    "256": 256, "256big": 256, "512": 512, "512thin": 512,
    "512thin-test": 512, "1024": 1024, "1024thin": 1024,
    "test128": 128, "test256": 256,
}


def test_all_reference_configs_present():
    assert set(GAN_CONFIGS) == set(EXPECTED_SIZES)
    for name, cfg in GAN_CONFIGS.items():
        assert cfg.max_size == EXPECTED_SIZES[name], name


def test_scale_model():
    cfg = GAN_CONFIGS["64"].scale_model(0.5)
    assert cfg.blocks == (64, 64, 32, 16)
    assert cfg.latent_dims == 128  # unscaled


@pytest.mark.parametrize("name", ["16", "32", "test128"])
def test_build_and_forward(name):
    """test128 exercises the self-attention insertion (attention=(3,))."""
    cfg = GAN_CONFIGS[name]
    g = Generator(
        cfg,
        input_factory=F.g_input_factory("mlp", "relu"),
        block_factory=F.g_block_factory("bn", "relu"),
        output_factory=F.g_output_factory("bn", "relu"),
    )
    d = Discriminator(
        cfg,
        block_factory=F.d_block_factory("bn", "relu"),
        output_factory=F.d_output_factory("bn", "relu"),
    )
    z = jnp.zeros((2, cfg.latent_dims), jnp.float32)
    g_vars = g.init(jax.random.PRNGKey(0), z, train=True)
    imgs, _ = g.apply(g_vars, z, train=True, mutable=["batch_stats"])
    assert imgs.shape == (2, cfg.max_size, cfg.max_size, cfg.data_dims)

    d_vars = d.init(jax.random.PRNGKey(1), imgs, train=True)
    logits, _ = d.apply(d_vars, imgs, train=True, mutable=["batch_stats"])
    assert logits.shape == (2, 1)
    assert np.all(np.isfinite(np.asarray(logits)))
