"""Smoke tests for the secondary workloads: InfoGAN, Scene, shared-family."""
import numpy as np
import pytest


def _run(trainer_cls, tiny_archive, tmp_path, run_id, extra=()):
    argv = [
        tiny_archive, "--config", "16", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", run_id,
        "--dtype", "f32", "--quiet-logs", *extra,
    ]
    trainer = trainer_cls.create_from_cli(argv)
    trainer.train()
    assert trainer.steps == 3
    for v in trainer.logs["g_loss"]:
        assert np.isfinite(float(v))
    return trainer


def test_info_trainer(tiny_archive, tmp_path):
    from tartangan_tpu.train.info import InfoTrainer
    t = _run(InfoTrainer, tiny_archive, tmp_path, "info",
             extra=["--info-cat-dims", "4", "--info-cont-dims", "2"])
    assert all(np.isfinite(float(v)) for v in t.logs["d_code_loss"])
    # info sampler wrote sweep grids
    import os
    samples = os.listdir(tmp_path / "out" / "info" / "samples")
    assert any(s.startswith("info_cont_") for s in samples)
    assert any(s.startswith("info_cat_") for s in samples)


def test_shared_cnn_trainer(tiny_archive, tmp_path):
    from tartangan_tpu.train.shared.cnn import SharedCNNTrainer
    t = _run(SharedCNNTrainer, tiny_archive, tmp_path, "shared")
    # single shared bank parameter exists
    assert "shared_filters" in t.state.g_params
    assert t.state.g_params["shared_filters"].shape == (3, 3, 100, 64)


def test_shared_iqn_trainer(tiny_archive, tmp_path):
    from tartangan_tpu.train.shared.iqn import SharedIQNTrainer
    _run(SharedIQNTrainer, tiny_archive, tmp_path, "sharediqn")


@pytest.fixture()
def scene_archive(tmp_path, rng):
    # scene trainer needs max_size >= scene_size * something; config '16'
    # gives max 16 with scene_size 8 -> one upsample block
    images = rng.integers(0, 256, size=(24, 16, 16, 3), dtype=np.uint8)
    path = tmp_path / "scene.npz"
    np.savez_compressed(path, images=images)
    return str(path)


def test_scene_trainer(scene_archive, tmp_path):
    from tartangan_tpu.train.scene import SceneTrainer
    _run(SceneTrainer, scene_archive, tmp_path, "scene",
         extra=["--scene-size", "8", "--patch-size", "3",
                "--num-patches", "5", "--patch-noise"])
