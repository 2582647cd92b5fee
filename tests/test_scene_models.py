"""Scene model family: SceneGenerator (iterative painting) + structure."""
import jax
import jax.numpy as jnp
import numpy as np

from tartangan_tpu.configs import GANConfig
from tartangan_tpu.models.scene import (
    SceneGenerator,
    SceneStructureBlock,
    StructuredSceneGenerator,
)


def _cfg():
    return GANConfig(base_size=4, latent_dims=16, data_dims=3,
                     blocks=(8, 8), num_blocks_per_scale=1)


def test_scene_generator_paints_canvas():
    cfg = _cfg()
    g = SceneGenerator(cfg, patch_size=4)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16)),
                    jnp.float32)
    variables = g.init(jax.random.PRNGKey(0), z, train=True)
    out, _ = g.apply(variables, z, train=True, mutable=["batch_stats"])
    assert out.shape == (2, 16, 16, 3)
    assert np.all(np.abs(np.asarray(out)) <= 1.0)  # tanh canvas

    (zf, canvas), _ = g.apply(variables, z, train=True,
                              return_z_final=True,
                              mutable=["batch_stats"])
    assert zf.shape == (2, 16)


def test_structure_block_shapes():
    blk = SceneStructureBlock(16, num_patches=5, patch_size=3, scene_size=8,
                              patch_noise=True)
    z = jnp.ones((4, 16))
    key = jax.random.PRNGKey(0)
    variables = blk.init({"params": key, "scene": key}, z, train=True)
    out = blk.apply(variables, z, train=True, rngs={"scene": key})
    assert out.shape == (4, 8, 8, 5)


def test_structure_block_refine_patches():
    blk = SceneStructureBlock(16, num_patches=3, patch_size=3, scene_size=8,
                              patch_noise=False, refine_patches=True)
    z = jnp.ones((2, 16))
    key = jax.random.PRNGKey(0)
    variables = blk.init({"params": key, "scene": key}, z, train=True)
    out = blk.apply(variables, z, train=True)
    assert out.shape == (2, 8, 8, 3)


def test_structured_scene_generator_full_size():
    cfg = _cfg()  # max_size = 16
    g = StructuredSceneGenerator(cfg, scene_size=8, patch_size=3,
                                 num_patches=4, patch_noise=True)
    z = jnp.ones((2, 16))
    key = jax.random.PRNGKey(0)
    variables = g.init({"params": key, "scene": key}, z, train=True)
    out, _ = g.apply(variables, z, train=True, mutable=["batch_stats"],
                     rngs={"scene": key})
    assert out.shape == (2, 16, 16, 3)
