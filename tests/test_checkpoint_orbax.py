"""Orbax checkpoint format roundtrip."""
import numpy as np

from tartangan_tpu.train.cnn import CNNTrainer


def test_orbax_checkpoint_roundtrip(tiny_archive, tmp_path):
    argv = [
        tiny_archive, "--config", "8", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", "orb",
        "--dtype", "f32", "--quiet-logs",
        "--checkpoint-format", "orbax",
    ]
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()
    steps = trainer.steps
    ckpt = tmp_path / "out" / "orb" / "checkpoints" / str(steps)
    assert (ckpt / "g.orbax").exists()

    resumed = CNNTrainer.create_from_cli(
        argv + ["--resume-training-step", str(steps), "--epochs", "0"])
    resumed.train()
    import jax
    a = jax.tree_util.tree_leaves(trainer.state.g_params)
    b = jax.tree_util.tree_leaves(resumed.state.g_params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
