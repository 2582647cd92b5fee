"""--iters-d: N discriminator updates per generator update."""
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
from tartangan_tpu.train.cnn import CNNTrainer
from tartangan_tpu.train.common import make_adam
from tartangan_tpu.train.info import make_info_train_step
from tartangan_tpu.train.iqn import make_iqn_train_step
from tartangan_tpu.train.state import GANTrainState


def _train(tiny_archive, tmp_path, run_id, iters_d):
    argv = [
        tiny_archive, "--config", "8", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", run_id,
        "--dtype", "f32", "--quiet-logs", "--seed", "3",
        "--iters-d", str(iters_d),
    ]
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()
    return trainer


def test_iters_d_runs_and_differs(tiny_archive, tmp_path):
    t1 = _train(tiny_archive, tmp_path, "d1", 1)
    t2 = _train(tiny_archive, tmp_path, "d2", 2)
    assert all(np.isfinite(float(v)) for v in t2.logs["d_loss"])
    # two D updates per step must move D differently than one
    a = jax.tree_util.tree_leaves(t1.state.d_params)[0]
    b = jax.tree_util.tree_leaves(t2.state.d_params)[0]
    assert float(np.abs(np.asarray(a) - np.asarray(b)).max()) > 1e-6


def _make_step(workload, cfg, iters_d):
    g = Generator(cfg, input_factory=F.g_input_factory("mlp", "relu"),
                  block_factory=F.g_block_factory("bn", "relu"),
                  output_factory=F.g_output_factory("bn", "relu"))
    key = jax.random.PRNGKey(0)
    g_vars = g.init(key, jnp.zeros((2, cfg.latent_dims)), train=True)
    img0 = jnp.zeros((2, cfg.max_size, cfg.max_size, 3))
    if workload == "iqn":
        d = IQNDiscriminator(
            cfg, block_factory=F.d_block_factory("bn", "relu"),
            output_factory=F.iqn_d_output_factory("bn", "relu"))
        d_vars = d.init({"params": key, "iqn": key}, img0, train=True,
                        targets=jnp.ones((2, 1)))
        step = make_iqn_train_step(
            g, d, make_adam(1e-4), make_adam(4e-4),
            latent_dims=cfg.latent_dims, grad_penalty=5.0,
            ema_factor=1e-3, dtype=jnp.float32, iters_d=iters_d)
    else:  # info
        d = Discriminator(
            cfg, block_factory=F.d_block_factory("bn", "relu"),
            output_factory=F.info_d_output_factory("bn", "relu", 8))
        d_vars = d.init(key, img0, train=True)
        step = make_info_train_step(
            g, d, make_adam(1e-4), make_adam(4e-4),
            latent_dims=cfg.latent_dims, cat_dims=4, cont_dims=4,
            info_w=1.0, grad_penalty=5.0, ema_factor=1e-3,
            dtype=jnp.float32, iters_d=iters_d)
    state = GANTrainState(
        g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
        target_g_params=jax.tree_util.tree_map(jnp.copy, g_vars["params"]),
        d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
        opt_g=make_adam(1e-4).init(g_vars["params"]),
        opt_d=make_adam(4e-4).init(d_vars["params"]))
    return jax.jit(step), state


@pytest.mark.parametrize("workload", ["iqn", "info"])
def test_step_iters_d_runs_and_differs(rng, workload):
    cfg = GAN_CONFIGS["8"]
    batch = rng.integers(0, 256, (8, cfg.max_size, cfg.max_size, 3),
                         dtype=np.uint8)
    key = jax.random.PRNGKey(11)
    finals = {}
    for n in (1, 2):
        step, state = _make_step(workload, cfg, n)
        new_state, metrics = step(state, batch, key)
        assert all(np.isfinite(float(v)) for v in metrics.values()), metrics
        finals[n] = jax.tree_util.tree_leaves(new_state.d_params)[0]
    diff = float(np.abs(np.asarray(finals[1]) - np.asarray(finals[2])).max())
    assert diff > 1e-6


def test_text_full_step_iters_d(tmp_path, rng):
    """Text full step with iters_d=2 runs finite and moves D differently."""
    from tartangan_tpu.train.text_cnn import TextCNNTrainer
    path = tmp_path / "docs.txt"
    words = ["tartan", "plaid", "weave", "thread", "loom", "kilt"]
    path.write_text("\n".join(
        " ".join(rng.choice(words, 12)) for _ in range(16)))
    finals = {}
    for n in (1, 2):
        argv = [str(path), "--config", "16", "--batch-size", "4",
                "--epochs", "1", "--output", str(tmp_path / "out"),
                "--gen-freq", "1000", "--run-id", f"t{n}",
                "--dtype", "f32", "--quiet-logs", "--seed", "3",
                "--num-devices", "1",
                "--pretrain-embedding", "0", "--iters-d", str(n)]
        trainer = TextCNNTrainer.create_from_cli(argv)
        trainer.train()
        assert all(np.isfinite(float(v)) for v in trainer.logs["d_loss"])
        finals[n] = jax.tree_util.tree_leaves(trainer.state.d_params)[0]
    diff = float(np.abs(np.asarray(finals[1]) - np.asarray(finals[2])).max())
    assert diff > 1e-6
