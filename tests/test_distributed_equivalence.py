"""Data-parallel correctness: one fused train step on an 8-device mesh must
match the single-device result (params replicated, batch sharded, BatchNorm
and gradients reduced over the global batch by XLA collectives). Covers
every train-step family — CNN, IQN, InfoGAN (cat/cont code rngs), scene
(patch-noise rng collection), text (SkipGram + 1-D GAN), shared filter
bank — plus a 2-D dp x tp mesh with tensor-parallel weights and the FID
moment accumulation (SURVEY.md section 5 'Distributed' row)."""
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


def _build(cfg, workload="cnn", parity=False):
    g = Generator(
        cfg,
        input_factory=F.g_input_factory("mlp", "relu"),
        block_factory=F.g_block_factory("bn", "relu", parity=parity),
        output_factory=F.g_output_factory("bn", "relu"),
    )
    key = jax.random.PRNGKey(0)
    g_vars = g.init(key, jnp.zeros((2, cfg.latent_dims)), train=True)
    img0 = jnp.zeros((2, cfg.max_size, cfg.max_size, 3))
    if workload == "iqn":
        d = IQNDiscriminator(
            cfg,
            block_factory=F.d_block_factory("bn", "relu", parity=parity),
            output_factory=F.iqn_d_output_factory("bn", "relu"),
        )
        d_vars = d.init({"params": key, "iqn": key}, img0, train=True,
                        targets=jnp.ones((2, 1)))
    else:
        d = Discriminator(
            cfg,
            block_factory=F.d_block_factory("bn", "relu", parity=parity),
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


def test_parity_step_matches_across_mesh_sizes(rng):
    """The parity-domain block rewrites (the TPU default via
    --parity-blocks auto) must shard exactly like the flax blocks:
    folded BatchNorm statistics reduce over the global batch, and the
    space-to-depth/depth-to-space reshapes stay batch-sharded. Config
    '16' so the G tower (64 -> 32, upsample) actually routes to
    ParityResidualGeneratorBlock."""
    cfg = GAN_CONFIGS["16"]
    batch = rng.integers(0, 256, (16, cfg.max_size, cfg.max_size, 3),
                         dtype=np.uint8)
    key = jax.random.PRNGKey(7)

    from tartangan_tpu.models.blocks import ParityResidualGeneratorBlock
    gf = F.g_block_factory("bn", "relu", parity=True)
    assert isinstance(gf(cfg.blocks[0], cfg.blocks[1]),
                      ParityResidualGeneratorBlock)

    results = {}
    for n_dev in (1, 8):
        step, state = _build(cfg, "cnn", parity=True)
        results[n_dev] = _run_on_mesh(step, state, batch, key,
                                      make_mesh(n_dev))
    (s1, m1), (s8, m8) = results[1], results[8]
    _assert_state_close(s1, s8, m1, m8)


def _assert_state_close(s1, s8, m1, m8):
    for k in m1:
        assert abs(float(m1[k]) - float(m8[k])) < 1e-3, (k, m1[k], m8[k])
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_params),
                    jax.tree_util.tree_leaves(s8.g_params)):
        np.testing.assert_allclose(a, b, atol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.d_stats),
                    jax.tree_util.tree_leaves(s8.d_stats)):
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_info_step_matches_across_mesh_sizes(rng):
    """InfoGAN: the cat/cont code sampling rides the step rng — identical
    keys must give identical codes whatever the mesh, and the code-loss
    reductions must psum over the sharded batch."""
    from tartangan_tpu.train.info import make_info_train_step

    cfg = GAN_CONFIGS["8"]
    batch = rng.integers(0, 256, (16, cfg.max_size, cfg.max_size, 3),
                         dtype=np.uint8)
    key = jax.random.PRNGKey(11)

    def build():
        g = Generator(
            cfg,
            input_factory=F.g_input_factory("mlp", "relu"),
            block_factory=F.g_block_factory("bn", "relu"),
            output_factory=F.g_output_factory("bn", "relu"),
        )
        k = jax.random.PRNGKey(0)
        g_vars = g.init(k, jnp.zeros((2, cfg.latent_dims)), train=True)
        d = Discriminator(
            cfg,
            block_factory=F.d_block_factory("bn", "relu"),
            output_factory=F.info_d_output_factory("bn", "relu", 4 + 2),
        )
        d_vars = d.init(
            k, jnp.zeros((2, cfg.max_size, cfg.max_size, 3)), train=True)
        opt_g, opt_d = make_adam(1e-4), make_adam(4e-4)
        state = GANTrainState(
            g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
            target_g_params=jax.tree_util.tree_map(
                jnp.copy, g_vars["params"]),
            d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
            opt_g=opt_g.init(g_vars["params"]),
            opt_d=opt_d.init(d_vars["params"]),
        )
        step = jax.jit(make_info_train_step(
            g, d, opt_g, opt_d, latent_dims=cfg.latent_dims,
            cat_dims=4, cont_dims=2, info_w=1.0,
            grad_penalty=5.0, ema_factor=1e-3, dtype=jnp.float32))
        return step, state

    results = {}
    for n_dev in (1, 8):
        step, state = build()
        results[n_dev] = _run_on_mesh(step, state, batch, key,
                                      make_mesh(n_dev))
    (s1, m1), (s8, m8) = results[1], results[8]
    _assert_state_close(s1, s8, m1, m8)


def test_scene_step_matches_across_mesh_sizes(rng):
    """Scene: the 'scene' patch-noise rng collection is threaded through G
    applies inside the step — per-sample noise must land identically on a
    sharded batch."""
    from tartangan_tpu.models.scene import StructuredSceneGenerator

    cfg = GAN_CONFIGS["8"]
    batch = rng.integers(0, 256, (16, cfg.max_size, cfg.max_size, 3),
                         dtype=np.uint8)
    key = jax.random.PRNGKey(13)

    def build():
        g = StructuredSceneGenerator(
            cfg, scene_size=4, patch_size=3, num_patches=4,
            patch_noise=True)
        k = jax.random.PRNGKey(0)
        g_vars = g.init({"params": k, "scene": k},
                        jnp.zeros((2, cfg.latent_dims)), train=True)
        d = Discriminator(
            cfg,
            block_factory=F.d_block_factory("bn", "relu"),
            output_factory=F.d_output_factory("bn", "relu"),
        )
        d_vars = d.init(
            k, jnp.zeros((2, cfg.max_size, cfg.max_size, 3)), train=True)
        opt_g, opt_d = make_adam(1e-4), make_adam(4e-4)
        state = GANTrainState(
            g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
            target_g_params=jax.tree_util.tree_map(
                jnp.copy, g_vars["params"]),
            d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
            opt_g=opt_g.init(g_vars["params"]),
            opt_d=opt_d.init(d_vars["params"]),
        )
        step = jax.jit(make_cnn_train_step(
            g, d, opt_g, opt_d, latent_dims=cfg.latent_dims,
            grad_penalty=5.0, ema_factor=1e-3, dtype=jnp.float32,
            g_rng_name="scene"))
        return step, state

    results = {}
    for n_dev in (1, 8):
        step, state = build()
        results[n_dev] = _run_on_mesh(step, state, batch, key,
                                      make_mesh(n_dev))
    (s1, m1), (s8, m8) = results[1], results[8]
    _assert_state_close(s1, s8, m1, m8)


def test_text_step_matches_across_mesh_sizes(rng):
    """Text: the SkipGram window offsets and negative samples ride the step
    rng; the int32 index batch shards over the data axis; the embedding
    gradient must psum over shards."""
    import dataclasses

    from tartangan_tpu.models.text import SkipGram
    from tartangan_tpu.train.text_cnn import make_text_train_steps
    from tartangan_tpu.train.state import TextGANTrainState

    cfg = dataclasses.replace(GAN_CONFIGS["8"], data_dims=16)
    vocab = 50
    batch = rng.integers(0, vocab, (16, cfg.max_size), dtype=np.int32)
    key = jax.random.PRNGKey(17)

    def build():
        g = Generator(
            cfg,
            input_factory=F.g_input_factory("mlp1d", "relu"),
            block_factory=F.g_block_factory("bn", "relu", ndim=1),
            output_factory=F.g_output_factory(
                "bn", "relu", output_activation="id", ndim=1),
        )
        d = Discriminator(
            cfg,
            input_factory=F.d_input_factory(ndim=1),
            block_factory=F.d_block_factory("bn", "relu", ndim=1),
            output_factory=F.d_output_factory("bn", "relu"),
        )
        emb = SkipGram(vocab, cfg.data_dims)
        k = jax.random.PRNGKey(0)
        g_vars = g.init(k, jnp.zeros((2, cfg.latent_dims)), train=True)
        d_vars = d.init(
            k, jnp.zeros((2, cfg.max_size, cfg.data_dims)), train=True)
        emb_vars = emb.init(k, jnp.zeros((2, 3), jnp.int32))
        opt_g, opt_d = make_adam(1e-4), make_adam(4e-4)
        import optax
        opt_emb = optax.sgd(4e-4)
        state = TextGANTrainState(
            g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
            target_g_params=jax.tree_util.tree_map(
                jnp.copy, g_vars["params"]),
            d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
            opt_g=opt_g.init(g_vars["params"]),
            opt_d=opt_d.init(d_vars["params"]),
            emb_params=emb_vars["params"],
            opt_emb=opt_emb.init(emb_vars["params"]),
        )
        _, full_step = make_text_train_steps(
            g, d, emb, opt_g, opt_d, opt_emb,
            latent_dims=cfg.latent_dims, context=1,
            grad_penalty=5.0, ema_factor=1e-3, dtype=jnp.float32)
        return jax.jit(full_step), state

    results = {}
    for n_dev in (1, 8):
        step, state = build()
        results[n_dev] = _run_on_mesh(step, state, batch, key,
                                      make_mesh(n_dev))
    (s1, m1), (s8, m8) = results[1], results[8]
    _assert_state_close(s1, s8, m1, m8)
    for a, b in zip(jax.tree_util.tree_leaves(s1.emb_params),
                    jax.tree_util.tree_leaves(s8.emb_params)):
        np.testing.assert_allclose(a, b, atol=5e-4)


def test_shared_step_matches_across_mesh_sizes(rng):
    """Shared filter bank: one global parameter read by every block — its
    gradient accumulates contributions from all blocks and must psum
    correctly over the sharded batch."""
    from tartangan_tpu.models.shared import (
        SharedDiscriminator,
        SharedGenerator,
    )

    cfg = GAN_CONFIGS["8"]
    batch = rng.integers(0, 256, (16, cfg.max_size, cfg.max_size, 3),
                         dtype=np.uint8)
    key = jax.random.PRNGKey(19)

    def build():
        g = SharedGenerator(cfg)
        d = SharedDiscriminator(cfg)
        k = jax.random.PRNGKey(0)
        g_vars = g.init(k, jnp.zeros((2, cfg.latent_dims)), train=True)
        d_vars = d.init(
            k, jnp.zeros((2, cfg.max_size, cfg.max_size, 3)), train=True)
        opt_g, opt_d = make_adam(1e-4), make_adam(4e-4)
        state = GANTrainState(
            g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
            target_g_params=jax.tree_util.tree_map(
                jnp.copy, g_vars["params"]),
            d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
            opt_g=opt_g.init(g_vars["params"]),
            opt_d=opt_d.init(d_vars["params"]),
        )
        step = jax.jit(make_cnn_train_step(
            g, d, opt_g, opt_d, latent_dims=cfg.latent_dims,
            grad_penalty=5.0, ema_factor=1e-3, dtype=jnp.float32))
        return step, state

    results = {}
    for n_dev in (1, 8):
        step, state = build()
        results[n_dev] = _run_on_mesh(step, state, batch, key,
                                      make_mesh(n_dev))
    (s1, m1), (s8, m8) = results[1], results[8]
    _assert_state_close(s1, s8, m1, m8)


def test_fid_moments_match_across_mesh_sizes(rng):
    """The FID moment accumulation (eval/inception.py) is mesh-transparent:
    when the caller feeds batch-sharded activations, the streaming
    sum/outer-product sums psum over the data axis and mu/sigma match the
    single-device result (makes the module docstring's claim real)."""
    from tartangan_tpu.eval.inception import accumulate_activations

    feats = rng.standard_normal((64, 2048)).astype(np.float32)
    w = rng.standard_normal((2048, 1000)).astype(np.float32) * 0.01

    class TinyNet:
        """Stand-in for InceptionWrapper: jitted (B,2048)->(pool, probs)."""

        def __init__(self, mesh):
            self.w = jax.device_put(jnp.asarray(w), replicated_sharding(mesh))

            @jax.jit
            def fwd(wts, x):
                return x, jax.nn.softmax(x @ wts, axis=-1)

            self._fwd = fwd

        def __call__(self, x):
            return self._fwd(self.w, x)

    results = {}
    for n_dev in (1, 8):
        mesh = make_mesh(n_dev)
        net = TinyNet(mesh)
        batches = iter(np.split(feats, 4))

        def sample_fn():
            return jax.device_put(jnp.asarray(next(batches)),
                                  data_sharding(mesh))

        results[n_dev] = accumulate_activations(sample_fn, net, 64)

    (p1, mu1, s1), (p8, mu8, s8) = results[1], results[8]
    np.testing.assert_allclose(p1, p8, atol=1e-5)
    np.testing.assert_allclose(mu1, mu8, atol=1e-5)
    np.testing.assert_allclose(s1, s8, atol=1e-4)


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
