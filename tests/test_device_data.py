"""Device-resident dataset path (``--device-data``).

The sampler's gather+crop must reproduce the host ImageBytesDataset
semantics (every crop is a contiguous window of a real archive image), and
the wrapped trainer must train end-to-end with zero per-step host->device
batch transfers while keeping the epoch/step cadence of the host path.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tartangan_tpu.data.device import (
    archive_sharding,
    make_device_sampler,
    wrap_step_with_device_data,
)


def test_sampler_no_crop_returns_archive_rows(rng):
    # each image is constant-valued = its index, so provenance is checkable
    n, h = 24, 16
    images = np.broadcast_to(
        np.arange(n, dtype=np.uint8)[:, None, None, None], (n, h, h, 3)
    ).copy()
    sample = make_device_sampler(images.shape, crop_size=h, batch_size=8)
    batch = np.asarray(sample(jnp.asarray(images), jax.random.PRNGKey(0)))
    assert batch.shape == (8, h, h, 3)
    for img in batch:
        assert img.min() == img.max()  # one archive row, unmixed
        assert 0 <= img[0, 0, 0] < n


def test_sampler_crop_is_contiguous_window(rng):
    # pixel value encodes (row, col) so a crop's provenance is decodable
    n, h, s = 4, 12, 5
    base = (np.arange(h, dtype=np.uint8)[:, None] * 16
            + np.arange(h, dtype=np.uint8)[None, :])
    images = np.stack([base] * n)[..., None].repeat(3, -1)
    sample = make_device_sampler(images.shape, crop_size=s, batch_size=16)
    batch = np.asarray(sample(jnp.asarray(images), jax.random.PRNGKey(1)))
    assert batch.shape == (16, s, s, 3)
    for img in batch:
        rows = img[:, 0, 0].astype(np.int32)
        cols = img[0, :, 0].astype(np.int32)
        # contiguous window: consecutive row deltas 16, col deltas 1
        assert np.all(np.diff(rows) == 16)
        assert np.all(np.diff(cols) == 1)
        y0, x0 = divmod(int(img[0, 0, 0]), 16)
        assert 0 <= y0 <= h - s and 0 <= x0 <= h - s


def test_sampler_indices_cover_archive():
    # with replacement, but over many draws every image should appear
    n, h = 8, 4
    images = np.broadcast_to(
        np.arange(n, dtype=np.uint8)[:, None, None, None], (n, h, h, 3)
    ).copy()
    sample = make_device_sampler(images.shape, crop_size=h, batch_size=32)
    seen = set()
    key = jax.random.PRNGKey(2)
    for _ in range(8):
        key, sub = jax.random.split(key)
        batch = np.asarray(sample(jnp.asarray(images), sub))
        seen.update(int(v) for v in batch[:, 0, 0, 0])
    assert seen == set(range(n))


def test_sampler_rejects_oversize_crop():
    with pytest.raises(ValueError):
        make_device_sampler((4, 8, 8, 3), crop_size=16, batch_size=2)


def test_wrapped_step_threads_batch_and_state():
    n, h, b = 6, 4, 3
    images = jnp.asarray(
        np.broadcast_to(np.arange(n, dtype=np.uint8)[:, None, None, None],
                        (n, h, h, 3)).copy())
    sample = make_device_sampler(images.shape, crop_size=h, batch_size=b)

    def fake_step(state, batch_u8, rng):
        assert batch_u8.shape == (b, h, h, 3)
        return state + 1, {"mean": jnp.mean(batch_u8.astype(jnp.float32))}

    step = jax.jit(wrap_step_with_device_data(fake_step, sample))
    state, metrics = step(jnp.int32(0), images, jax.random.PRNGKey(0))
    assert int(state) == 1
    assert 0.0 <= float(metrics["mean"]) < n


def test_archive_sharding_spec():
    from tartangan_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    s = archive_sharding(mesh)
    assert s.spec[0] == "data"


def test_cnn_trainer_device_data_end_to_end(tiny_archive, tmp_path):
    from tartangan_tpu.train.cnn import CNNTrainer
    argv = [
        tiny_archive, "--config", "16", "--batch-size", "8",
        "--epochs", "2", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--checkpoint-freq", "100",
        "--run-id", "dd", "--dtype", "f32", "--quiet-logs",
        "--device-data",
    ]
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()
    # epoch cadence identical to the host path: len(ds)//bs steps per epoch
    assert trainer.steps == 2 * (24 // 8)
    for key in ("g_loss", "d_loss", "gp"):
        vals = [float(v) for v in trainer.logs[key]]
        assert len(vals) == trainer.steps
        assert all(np.isfinite(v) for v in vals)


def test_text_trainer_rejects_device_data(tmp_path):
    from tartangan_tpu.train.text_cnn import TextCNNTrainer
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("hello world " * 64)
    argv = [str(corpus), "--config", "16", "--batch-size", "4",
            "--output", str(tmp_path / "out"), "--run-id", "t",
            "--quiet-logs", "--device-data"]
    trainer = TextCNNTrainer.create_from_cli(argv)
    with pytest.raises(NotImplementedError):
        trainer.train()
