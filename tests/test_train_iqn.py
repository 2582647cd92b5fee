"""End-to-end IQN trainer smoke test (CPU, config '16')."""
import numpy as np

from tartangan_tpu.train.iqn import IQNTrainer


def test_iqn_train_steps(tiny_archive, tmp_path):
    argv = [
        tiny_archive,
        "--config", "16",
        "--batch-size", "8",
        "--epochs", "1",
        "--output", str(tmp_path / "out"),
        "--gen-freq", "100",
        "--run-id", "iqnrun",
        "--dtype", "f32",
        "--quiet-logs",
    ]
    trainer = IQNTrainer.create_from_cli(argv)
    trainer.train()
    assert trainer.steps == 3
    for key in ("g_loss", "d_loss", "gp"):
        assert all(np.isfinite(float(v)) for v in trainer.logs[key])


def test_iqn_no_grad_penalty(tiny_archive, tmp_path):
    argv = [
        tiny_archive, "--config", "16", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--grad-penalty", "0", "--run-id", "iqnrun2",
        "--dtype", "f32", "--quiet-logs", "--gen-freq", "100",
    ]
    trainer = IQNTrainer.create_from_cli(argv)
    trainer.train()
    assert all(float(v) == 0.0 for v in trainer.logs["gp"])
