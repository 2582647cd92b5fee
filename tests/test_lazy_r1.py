"""Lazy R1 regularization (--r1-interval): in-graph alternation between
the R1 and no-R1 step variants, weight scaling, and the e2e trainer path.

The feature is a deliberate, opt-in departure from the reference's
every-step penalty (StyleGAN2 lazy regularization); --r1-interval 1 (the
default) must be bit-identical to the old code path.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tartangan_tpu.configs import GAN_CONFIGS
from tartangan_tpu.models import factories as F
from tartangan_tpu.models.pluggan import Discriminator, Generator
from tartangan_tpu.train.cnn import make_cnn_train_step
from tartangan_tpu.train.common import make_adam
from tartangan_tpu.train.multi import chunk_train_step
from tartangan_tpu.train.state import GANTrainState


def _tiny_setup(grad_penalty=5.0, r1_interval=1):
    cfg = GAN_CONFIGS["8"]
    g = Generator(cfg, input_factory=F.g_input_factory("mlp", "relu"),
                  block_factory=F.g_block_factory("bn", "relu"),
                  output_factory=F.g_output_factory("bn", "relu"))
    d = Discriminator(cfg, block_factory=F.d_block_factory("bn", "relu"),
                      output_factory=F.d_output_factory("bn", "relu"))
    key = jax.random.PRNGKey(0)
    g_vars = g.init(key, jnp.zeros((2, cfg.latent_dims)), train=True)
    d_vars = d.init(key, jnp.zeros((2, cfg.max_size, cfg.max_size, 3)),
                    train=True)
    opt_g, opt_d = make_adam(1e-4), make_adam(4e-4)
    state = GANTrainState(
        g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
        target_g_params=jax.tree_util.tree_map(jnp.copy, g_vars["params"]),
        d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
        opt_g=opt_g.init(g_vars["params"]),
        opt_d=opt_d.init(d_vars["params"]),
    )
    step = make_cnn_train_step(
        g, d, opt_g, opt_d, latent_dims=cfg.latent_dims,
        grad_penalty=grad_penalty, ema_factor=1e-3, dtype=jnp.float32,
        r1_interval=r1_interval)
    return cfg, step, state


def test_interval_1_has_no_variants():
    _, step, _ = _tiny_setup(r1_interval=1)
    assert not hasattr(step, "no_r1")


def test_no_r1_variant_skips_penalty(rng):
    cfg, step, state = _tiny_setup(r1_interval=4)
    assert step.r1_interval == 4
    batch = jnp.asarray(rng.integers(
        0, 256, (8, cfg.max_size, cfg.max_size, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(1)
    _, m_on = jax.jit(step)(state, batch, key)
    _, m_off = jax.jit(step.no_r1)(state, batch, key)
    assert float(m_on["gp"]) > 0.0
    assert float(m_off["gp"]) == 0.0
    # identical metric tree (required by lax.cond)
    assert set(m_on) == set(m_off)


def test_r1_weight_scales_with_interval(rng):
    """The applied penalty weight is grad_penalty * interval: the d_loss
    of the interval-N step exceeds the interval-1 step by (N-1)*gp*w."""
    cfg, step1, state = _tiny_setup(grad_penalty=5.0, r1_interval=1)
    _, step4, _ = _tiny_setup(grad_penalty=5.0, r1_interval=4)
    batch = jnp.asarray(rng.integers(
        0, 256, (8, cfg.max_size, cfg.max_size, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(2)
    _, m1 = jax.jit(step1)(state, batch, key)
    _, m4 = jax.jit(step4)(state, batch, key)
    np.testing.assert_allclose(
        float(m4["d_loss"]) - float(m1["d_loss"]),
        3 * 5.0 * float(m1["gp"]), rtol=1e-4, atol=1e-5)


def test_chunked_alternation(rng):
    """Under chunking, R1 applies on chunk-local indices 0, N, 2N, ...
    (gp metric nonzero there, exactly zero elsewhere)."""
    cfg, step, state = _tiny_setup(r1_interval=2)
    chunk = jax.jit(chunk_train_step(
        step, 4, "broadcast", alt_step_fn=step.no_r1, alt_interval=2))
    batch = jnp.asarray(rng.integers(
        0, 256, (8, cfg.max_size, cfg.max_size, 3), dtype=np.uint8))
    _, metrics = chunk(state, batch, jax.random.PRNGKey(3))
    gp = np.asarray(metrics["gp"])
    assert gp.shape == (4,)
    assert gp[0] > 0 and gp[2] > 0
    assert gp[1] == 0 and gp[3] == 0


def test_chunked_alternation_scan_mode(rng):
    """'scan' batch mode (stacked host batches) must thread the chunk
    index alongside the per-step batch slices."""
    cfg, step, state = _tiny_setup(r1_interval=2)
    chunk = jax.jit(chunk_train_step(
        step, 4, "scan", alt_step_fn=step.no_r1, alt_interval=2))
    stacked = jnp.asarray(rng.integers(
        0, 256, (4, 8, cfg.max_size, cfg.max_size, 3), dtype=np.uint8))
    _, metrics = chunk(state, stacked, jax.random.PRNGKey(4))
    gp = np.asarray(metrics["gp"])
    assert gp.shape == (4,)
    assert gp[0] > 0 and gp[2] > 0 and gp[1] == 0 and gp[3] == 0


def test_chunked_alternation_global_cadence(rng):
    """When K < N, the cadence rides the GLOBAL step (step0 operand), not
    the chunk-local index — R1 fires every N steps across chunk
    boundaries, never on every chunk's step 0 (ADVICE r3)."""
    cfg, step, state = _tiny_setup(r1_interval=4)
    chunk = jax.jit(chunk_train_step(
        step, 2, "broadcast", alt_step_fn=step.no_r1, alt_interval=4))
    batch = jnp.asarray(rng.integers(
        0, 256, (8, cfg.max_size, cfg.max_size, 3), dtype=np.uint8))
    gps = []
    for c in range(3):  # global steps 0..5: R1 only at 0 and 4
        state, metrics = chunk(state, batch, jax.random.PRNGKey(c),
                               np.int32(2 * c))
        gps.extend(np.asarray(metrics["gp"]))
    assert gps[0] > 0 and gps[4] > 0
    assert gps[1] == 0 and gps[2] == 0 and gps[3] == 0 and gps[5] == 0


def test_trainer_e2e_lazy_r1_k_not_multiple(tiny_archive, tmp_path):
    """Full CNNTrainer with --steps-per-call 2 --r1-interval 4: the
    trainer must thread its global step into the chunk so the cadence is
    exact (fires at steps 0 and 4 only across the first three chunks)."""
    from tartangan_tpu.train.cnn import CNNTrainer
    argv = [
        tiny_archive, "--config", "16", "--batch-size", "8",
        "--epochs", "3", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", "lazyr1k",
        "--dtype", "f32", "--quiet-logs",
        "--r1-interval", "4", "--steps-per-call", "2",
    ]
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()
    assert trainer.steps >= 6
    gp = np.concatenate([np.asarray(g) for g in trainer.logs["gp"][:3]])
    assert float(gp[0]) > 0 and float(gp[4]) > 0
    assert all(float(g) == 0 for g in (gp[1], gp[2], gp[3], gp[5]))


def test_trainer_e2e_lazy_r1(tiny_archive, tmp_path):
    """Full CNNTrainer run with --r1-interval 2 --steps-per-call 2."""
    from tartangan_tpu.train.cnn import CNNTrainer
    argv = [
        tiny_archive, "--config", "16", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", "lazyr1",
        "--dtype", "f32", "--quiet-logs",
        "--r1-interval", "2", "--steps-per-call", "2",
    ]
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()
    assert trainer.steps >= 2
    gp = np.asarray(trainer.logs["gp"][0])
    assert gp.shape == (2,)
    assert float(gp[0]) > 0 and float(gp[1]) == 0
    for v in trainer.logs["g_loss"]:
        assert np.all(np.isfinite(np.asarray(v)))
