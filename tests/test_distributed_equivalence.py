"""Data-parallel correctness: one fused train step on an 8-device mesh must
match the single-device result (params replicated, batch sharded, BatchNorm
and gradients reduced over the global batch by XLA collectives). Covers the
CNN and IQN steps, plus a 2-D dp x tp mesh with tensor-parallel weights."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.configs import GAN_CONFIGS
from tartangan_tpu.models import factories as F
from tartangan_tpu.models.pluggan import (
    Discriminator,
    Generator,
    IQNDiscriminator,
)
from tartangan_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    param_sharding,
    replicated_sharding,
)
from tartangan_tpu.train.cnn import make_cnn_train_step
from tartangan_tpu.train.common import make_adam
from tartangan_tpu.train.iqn import make_iqn_train_step
from tartangan_tpu.train.state import GANTrainState


def _build(cfg, workload="cnn"):
    g = Generator(
        cfg,
        input_factory=F.g_input_factory("mlp", "relu"),
        block_factory=F.g_block_factory("bn", "relu"),
        output_factory=F.g_output_factory("bn", "relu"),
    )
    key = jax.random.PRNGKey(0)
    g_vars = g.init(key, jnp.zeros((2, cfg.latent_dims)), train=True)
    img0 = jnp.zeros((2, cfg.max_size, cfg.max_size, 3))
    if workload == "iqn":
        d = IQNDiscriminator(
            cfg,
            block_factory=F.d_block_factory("bn", "relu"),
            output_factory=F.iqn_d_output_factory("bn", "relu"),
        )
        d_vars = d.init({"params": key, "iqn": key}, img0, train=True,
                        targets=jnp.ones((2, 1)))
    else:
        d = Discriminator(
            cfg,
            block_factory=F.d_block_factory("bn", "relu"),
            output_factory=F.d_output_factory("bn", "relu"),
        )
        d_vars = d.init(key, img0, train=True)
    opt_g, opt_d = make_adam(1e-4), make_adam(4e-4)
    state = GANTrainState(
        g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
        target_g_params=jax.tree_util.tree_map(jnp.copy, g_vars["params"]),
        d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
        opt_g=opt_g.init(g_vars["params"]),
        opt_d=opt_d.init(d_vars["params"]),
    )
    make = make_iqn_train_step if workload == "iqn" else make_cnn_train_step
    step = jax.jit(make(
        g, d, opt_g, opt_d, latent_dims=cfg.latent_dims,
        grad_penalty=5.0, ema_factor=1e-3, dtype=jnp.float32))
    return step, state


def _run_on_mesh(step, state, batch, key, mesh, tp=False):
    if tp:
        state = param_sharding(state, mesh)
    else:
        state = jax.device_put(state, replicated_sharding(mesh))
    dev_batch = jax.device_put(batch, data_sharding(mesh))
    new_state, metrics = step(state, dev_batch, key)
    return jax.device_get(new_state), jax.device_get(metrics)


@pytest.mark.parametrize("workload", ["cnn", "iqn"])
def test_step_matches_across_mesh_sizes(rng, workload):
    cfg = GAN_CONFIGS["8"]
    batch = rng.integers(0, 256, (16, cfg.max_size, cfg.max_size, 3),
                         dtype=np.uint8)
    key = jax.random.PRNGKey(42)

    results = {}
    for n_dev in (1, 8):
        step, state = _build(cfg, workload)
        results[n_dev] = _run_on_mesh(step, state, batch, key,
                                      make_mesh(n_dev))

    (s1, m1), (s8, m8) = results[1], results[8]
    for k in m1:
        assert abs(float(m1[k]) - float(m8[k])) < 1e-3, (k, m1[k], m8[k])
    # params go through Adam, whose first-step update is +-lr * sign(grad):
    # reduction-order fp noise can flip near-zero gradient signs, so the
    # bound is a couple of lr (1e-4), not fp epsilon
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s8.g_params)):
        np.testing.assert_allclose(a, b, atol=5e-4)
    # batch stats: means include activations of generated images, which
    # accumulate reduction-order noise through the conv stack (~1e-4 abs
    # observed); variances are tight
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_stats),
                    jax.tree_util.tree_leaves(s8.d_stats)):
        np.testing.assert_allclose(a, b, atol=1e-3)


@pytest.mark.parametrize("workload", ["cnn", "iqn"])
def test_dp_tp_mesh_matches_single_device(rng, workload):
    """2-D (data=4, model=2) mesh with tensor-parallel weight sharding must
    reproduce the 1-device step (GSPMD inserts the channel collectives)."""
    cfg = GAN_CONFIGS["8"]
    batch = rng.integers(0, 256, (16, cfg.max_size, cfg.max_size, 3),
                         dtype=np.uint8)
    key = jax.random.PRNGKey(7)

    step, state = _build(cfg, workload)
    s1, m1 = _run_on_mesh(step, state, batch, key, make_mesh(1))
    step, state = _build(cfg, workload)
    s2, m2 = _run_on_mesh(step, state, batch, key, make_mesh(8, tp=2),
                          tp=True)

    for k in m1:
        assert abs(float(m1[k]) - float(m2[k])) < 1e-3, (k, m1[k], m2[k])
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s2.g_params)):
        np.testing.assert_allclose(a, b, atol=5e-4)
