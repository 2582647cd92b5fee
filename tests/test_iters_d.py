"""--iters-d: N discriminator updates per generator update."""
import jax
import numpy as np

from tartangan_tpu.train.cnn import CNNTrainer


def _train(tiny_archive, tmp_path, run_id, iters_d):
    argv = [
        tiny_archive, "--config", "16", "--batch-size", "8",
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
