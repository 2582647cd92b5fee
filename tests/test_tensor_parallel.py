"""Tensor parallelism: a (data=2, model=4) mesh step must match the
replicated data-parallel result — GSPMD partitions the conv output channels
and inserts the collectives."""
import jax
import jax.numpy as jnp
import numpy as np

from tartangan_tpu.configs import GAN_CONFIGS
from tartangan_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    param_sharding,
    replicated_sharding,
)
from tartangan_tpu.train.cnn import CNNTrainer


def test_mesh_2d_construction():
    mesh = make_mesh(8, tp=4)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["data"] == 2 and mesh.shape["model"] == 4


def test_param_sharding_specs():
    mesh = make_mesh(8, tp=4)
    tree = {
        "kernel": jnp.zeros((3, 3, 16, 32)),   # 32 % 4 == 0 -> sharded
        "odd": jnp.zeros((3, 3, 16, 6)),       # 6 % 4 != 0 -> replicated
        "bias": jnp.zeros((32,)),              # rank 1 -> replicated
    }
    placed = param_sharding(tree, mesh)
    assert "model" in str(placed["kernel"].sharding.spec)
    assert "model" not in str(placed["odd"].sharding.spec)
    assert "model" not in str(placed["bias"].sharding.spec)


def _run_step(tiny_archive, tmp_path, run_id, tp):
    argv = [
        tiny_archive, "--config", "16", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", run_id,
        "--dtype", "f32", "--quiet-logs", "--seed", "5",
        "--num-devices", "8", "--tp", str(tp),
    ]
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()
    return trainer


def test_tp_training_matches_dp(tiny_archive, tmp_path):
    t_dp = _run_step(tiny_archive, tmp_path, "dp", 1)
    t_tp = _run_step(tiny_archive, tmp_path, "tp", 4)
    for k in ("g_loss", "d_loss"):
        a = [float(v) for v in t_dp.logs[k]]
        b = [float(v) for v in t_tp.logs[k]]
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(t_dp.state.g_params),
                    jax.tree_util.tree_leaves(t_tp.state.g_params)):
        np.testing.assert_allclose(
            jax.device_get(a), jax.device_get(b), atol=5e-3)
