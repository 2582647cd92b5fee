"""Bit-exact reproducibility: two runs with the same --seed must produce
identical parameters (host shuffle, z sampling, and tau/noise rngs are all
derived from the one seed)."""
import jax
import numpy as np

from tartangan_tpu.train.cnn import CNNTrainer


def _run(tiny_archive, tmp_path, run_id):
    argv = [
        tiny_archive, "--config", "8", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", run_id,
        "--dtype", "f32", "--quiet-logs", "--seed", "11",
    ]
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()
    return trainer


def test_same_seed_same_params(tiny_archive, tmp_path):
    t1 = _run(tiny_archive, tmp_path, "r1")
    t2 = _run(tiny_archive, tmp_path, "r2")
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.g_params),
                    jax.tree_util.tree_leaves(t2.state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(t1.state.d_params),
                    jax.tree_util.tree_leaves(t2.state.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
