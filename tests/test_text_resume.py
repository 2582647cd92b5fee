"""Text trainer checkpoint/resume roundtrip (embedding + opt_emb artifacts)."""
import numpy as np


def _corpus(tmp_path):
    docs = ["the quick brown fox jumps over the lazy dog"] * 20
    path = tmp_path / "docs.txt"
    path.write_text("\n".join(docs))
    return str(path)


def test_text_checkpoint_resume(tmp_path):
    from tartangan_tpu.train.text_cnn import TextCNNTrainer

    argv = [
        _corpus(tmp_path), "--config", "16", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", "txt",
        "--dtype", "f32", "--quiet-logs",
        "--embedding-dims", "8", "--pretrain-embedding", "0",
        "--context", "2",
    ]
    trainer = TextCNNTrainer.create_from_cli(argv)
    trainer.train()
    steps = trainer.steps
    ckpt = tmp_path / "out" / "txt" / "checkpoints" / str(steps)
    assert (ckpt / "embedding.msgpack").exists()
    assert (ckpt / "opt_emb.msgpack").exists()

    resumed = TextCNNTrainer.create_from_cli(
        argv + ["--resume-training-step", str(steps), "--epochs", "0"])
    resumed.train()
    import jax
    a = jax.tree_util.tree_leaves(trainer.state.emb_params)
    b = jax.tree_util.tree_leaves(resumed.state.emb_params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)
