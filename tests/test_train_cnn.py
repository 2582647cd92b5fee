"""End-to-end CNN trainer tests on the smallest reference config (CPU).

This is the rebuild's analogue of the reference's de-facto smoke method
(SURVEY.md section 4): train config '16'/'32'-class models for a few steps
on a tiny bytes archive and assert losses are finite, samples render, and
checkpoints round-trip.
"""
import json
import os

import numpy as np
import pytest

from tartangan_tpu.train.cnn import CNNTrainer


def make_trainer(tiny_archive, tmp_path, extra=()):
    argv = [
        tiny_archive,
        "--config", "16",
        "--batch-size", "8",
        "--epochs", "1",
        "--output", str(tmp_path / "out"),
        "--gen-freq", "2",
        "--checkpoint-freq", "2",
        "--run-id", "testrun",
        "--dtype", "f32",
        "--quiet-logs",
        *extra,
    ]
    return CNNTrainer.create_from_cli(argv)


def test_train_one_epoch_and_sample(tiny_archive, tmp_path):
    trainer = make_trainer(tiny_archive, tmp_path)
    trainer.train()
    assert trainer.steps == 24 // 8
    for key in ("g_loss", "d_loss", "gp"):
        vals = [float(v) for v in trainer.logs[key]]
        assert len(vals) == trainer.steps
        assert all(np.isfinite(v) for v in vals)
    out = tmp_path / "out" / "testrun"
    assert (out / "config.args").exists()
    samples = os.listdir(out / "samples")
    assert any(s.startswith("sample_") for s in samples)
    assert any(s.startswith("grid_") for s in samples)
    # final checkpoint written at train end
    ckpt = out / "checkpoints" / str(trainer.steps)
    assert (ckpt / "g.msgpack").exists()
    assert (ckpt / "trainer.json").exists()
    state = json.loads((ckpt / "trainer.json").read_text())
    assert state["steps"] == trainer.steps


def test_checkpoint_resume_roundtrip(tiny_archive, tmp_path):
    trainer = make_trainer(tiny_archive, tmp_path)
    trainer.train()
    steps = trainer.steps
    g_params_before = trainer.state.g_params

    resumed = make_trainer(
        tiny_archive, tmp_path,
        extra=["--resume-training-step", str(steps), "--epochs", "0"],
    )
    resumed.train()  # epochs=0: loads checkpoint then exits
    assert resumed.steps == steps

    import jax
    a = jax.tree_util.tree_leaves(g_params_before)
    b = jax.tree_util.tree_leaves(resumed.state.g_params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6)


def test_resume_latest(tiny_archive, tmp_path):
    trainer = make_trainer(tiny_archive, tmp_path)
    trainer.train()
    resumed = make_trainer(
        tiny_archive, tmp_path,
        extra=["--resume-training-latest", "--epochs", "0"],
    )
    resumed.train()
    assert resumed.steps == trainer.steps


def test_multi_device_data_parallel(tiny_archive, tmp_path):
    """Batch sharded over the 8 virtual CPU devices; params replicated."""
    trainer = make_trainer(tiny_archive, tmp_path,
                           extra=["--num-devices", "8"])
    assert trainer.mesh.size == 8
    trainer.train()
    assert all(np.isfinite(float(v)) for v in trainer.logs["g_loss"])


def test_norm_id_and_tiledz(tiny_archive, tmp_path):
    trainer = make_trainer(
        tiny_archive, tmp_path,
        extra=["--norm", "id", "--g-base", "tiledz", "--model-scale", "1.5625"],
    )
    # tiledz requires latent == first block width: 100*1.5625? -> instead use
    # scale 1.0 with config '16' latent 100 != blocks[0] 64; pick mlp there.
    # For tiledz parity we only check construction with a matching config.
    trainer.args.epochs = 0
    trainer.train()


def test_block_variant_flags(tiny_archive, tmp_path):
    """--parity-blocks on trains end-to-end through the CLI. (The fused
    Pallas gblock is a tests+docs-only comparison baseline since round 4 —
    measured slower than the parity rewrite and R1-incompatible, its CLI
    flag was dropped; tests/test_fused_gblock.py keeps it honest.)"""
    # sampling/checkpointing off: this test asserts training only, and the
    # sampler would compile a second (eval-mode) parity executable
    t2 = make_trainer(tiny_archive, tmp_path,
                      extra=["--parity-blocks", "on", "--run-id", "pb",
                             "--gen-freq", "100", "--checkpoint-freq", "100"])
    t2.train()
    assert all(np.isfinite(float(v)) for v in t2.logs["g_loss"])
    # parity blocks share the flax param tree; routing is pinned by
    # tests/test_parity_blocks.py::test_factory_routes_parity_blocks


def test_ema_start_reference_quirk(tiny_archive, tmp_path):
    trainer = make_trainer(tiny_archive, tmp_path,
                           extra=["--ema-start", "reference"])
    trainer.args.epochs = 0
    trainer.train()
    import jax
    g = jax.tree_util.tree_leaves(trainer.state.g_params)
    t = jax.tree_util.tree_leaves(trainer.state.target_g_params)
    # with the reference quirk target != g at init
    diffs = [float(np.abs(np.asarray(x) - np.asarray(y)).max())
             for x, y in zip(g, t)]
    assert max(diffs) > 1e-3
