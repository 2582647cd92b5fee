"""--steps-per-call chunking (train/multi.py).

K fused steps run inside one jitted lax.scan dispatch; metrics come back
stacked (K,); the step counter advances K at a time and periodic components
fire on chunk boundaries. Covers both input modes: on-chip sampling
(--device-data) and stacked host batches.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tartangan_tpu.train.multi import chunk_train_step, stack_batches


def test_chunk_broadcast_runs_k_steps():
    def step(state, batch, rng):
        return state + batch, {"s": state}

    multi = jax.jit(chunk_train_step(step, 4, "broadcast"))
    state, metrics = multi(jnp.int32(0), jnp.int32(10), jax.random.PRNGKey(0))
    assert int(state) == 40
    assert metrics["s"].shape == (4,)
    assert list(np.asarray(metrics["s"])) == [0, 10, 20, 30]


def test_chunk_scan_slices_leading_axis():
    def step(state, batch, rng):
        return state + jnp.sum(batch), {"b": jnp.sum(batch)}

    multi = jax.jit(chunk_train_step(step, 3, "scan"))
    xs = jnp.asarray([[1, 1], [2, 2], [3, 3]], jnp.int32)
    state, metrics = multi(jnp.int32(0), xs, jax.random.PRNGKey(0))
    assert int(state) == 12
    assert list(np.asarray(metrics["b"])) == [2, 4, 6]


def test_chunk_rng_matches_host_split_chain():
    # the in-scan split sequence must equal the host next_key chain so a
    # seed + steps-per-call pair is deterministic and auditable
    captured = []

    def step(state, batch, rng):
        return state, {"k": jax.random.key_data(rng)}

    root = jax.random.PRNGKey(7)
    _, metrics = jax.jit(chunk_train_step(step, 3, "broadcast"))(
        jnp.int32(0), jnp.int32(0), root)
    key = root
    for i in range(3):
        key, sub = jax.random.split(key)
        captured.append(np.asarray(jax.random.key_data(sub)))
    np.testing.assert_array_equal(np.asarray(metrics["k"]), captured)


def test_chunk_validates_args():
    step = lambda s, b, r: (s, {})
    with pytest.raises(ValueError):
        chunk_train_step(step, 0, "broadcast")
    with pytest.raises(ValueError):
        chunk_train_step(step, 2, "nope")


def test_stack_batches_groups_and_drops_remainder():
    batches = [np.full((2, 3), i, np.uint8) for i in range(7)]
    stacks = list(stack_batches(iter(batches), 3))
    assert len(stacks) == 2
    assert stacks[0].shape == (3, 2, 3)
    assert stacks[1][0, 0, 0] == 3  # second group starts at batch 3


def test_component_every_chunk_aware():
    from tartangan_tpu.train.components.base import TrainerComponent

    class C(TrainerComponent):
        pass

    class FakeTrainer:
        steps_per_call = 4

    c = C(args=None)
    c.trainer = FakeTrainer()
    fired = [s for s in range(0, 32, 4) if c.every(10, s)]
    # windows [8,12) and [20,24) and [28,32) contain 10, 20, 30; plus 0
    assert fired == [0, 8, 20, 28]
    c.trainer.steps_per_call = 1
    fired = [s for s in range(0, 8) if c.every(3, s)]
    assert fired == [0, 3, 6]


@pytest.mark.parametrize("device_data", [True, False])
def test_cnn_trainer_steps_per_call_end_to_end(tiny_archive, tmp_path,
                                               device_data):
    from tartangan_tpu.train.cnn import CNNTrainer
    argv = [
        tiny_archive, "--config", "8", "--batch-size", "8",
        "--epochs", "2", "--output", str(tmp_path / "out"),
        "--gen-freq", "2", "--checkpoint-freq", "4",
        "--run-id", "spc", "--dtype", "f32", "--quiet-logs",
        "--steps-per-call", "2",
        *(["--device-data"] if device_data else []),
    ]
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()
    # 24 imgs / bs 8 = 3 batches; chunked to 2 per epoch (remainder dropped)
    assert trainer.steps == 2 * 2
    for key in ("g_loss", "d_loss", "gp"):
        chunks = trainer.logs[key]
        assert len(chunks) == 2  # one (K,) entry per dispatch
        flat = np.concatenate([np.ravel(np.asarray(c)) for c in chunks])
        assert flat.shape == (4,)
        assert np.all(np.isfinite(flat))
    # checkpoint fired on the chunk crossing step 4
    assert (tmp_path / "out" / "spc" / "checkpoints" / "4").exists()
    # samples rendered (gen_freq=2 crossings)
    assert any((tmp_path / "out" / "spc" / "samples").iterdir())


def test_steps_per_call_deterministic(tiny_archive, tmp_path):
    from tartangan_tpu.train.cnn import CNNTrainer

    def run(run_id):
        trainer = CNNTrainer.create_from_cli([
            tiny_archive, "--config", "8", "--batch-size", "8",
            "--epochs", "1", "--output", str(tmp_path / run_id),
            "--gen-freq", "100", "--checkpoint-freq", "100",
            "--run-id", run_id, "--dtype", "f32", "--quiet-logs",
            "--steps-per-call", "2", "--device-data", "--seed", "5",
        ])
        trainer.train()
        return np.concatenate([
            np.ravel(np.asarray(c)) for c in trainer.logs["g_loss"]])

    np.testing.assert_array_equal(run("a"), run("b"))


def test_text_trainer_rejects_steps_per_call(tmp_path):
    from tartangan_tpu.train.text_cnn import TextCNNTrainer
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("hello world " * 64)
    trainer = TextCNNTrainer.create_from_cli([
        str(corpus), "--config", "8", "--batch-size", "4",
        "--output", str(tmp_path / "out"), "--run-id", "t",
        "--quiet-logs", "--steps-per-call", "2"])
    with pytest.raises(NotImplementedError):
        trainer.train()


# -- per-family coverage: the chunked + device-data paths are generic over
#    make_train_step; pin that for the IQN, InfoGAN and scene workloads too
def _run_chunked(trainer_cls, archive, tmp_path, run_id, extra=()):
    argv = [
        archive, "--config", "8", "--batch-size", "8",
        "--epochs", "2", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--checkpoint-freq", "100",
        "--run-id", run_id, "--dtype", "f32", "--quiet-logs",
        "--steps-per-call", "2", "--device-data", *extra,
    ]
    trainer = trainer_cls.create_from_cli(argv)
    trainer.train()
    assert trainer.steps == 2 * 2  # 3 batches/epoch -> 1 chunk of 2
    flat = np.concatenate([
        np.ravel(np.asarray(c)) for c in trainer.logs["g_loss"]])
    assert flat.shape == (4,)
    assert np.all(np.isfinite(flat))
    return trainer


def test_iqn_trainer_chunked_device_data(tiny_archive, tmp_path):
    from tartangan_tpu.train.iqn import IQNTrainer
    _run_chunked(IQNTrainer, tiny_archive, tmp_path, "iqnspc")


def test_info_trainer_chunked_device_data(tiny_archive, tmp_path):
    from tartangan_tpu.train.info import InfoTrainer
    t = _run_chunked(InfoTrainer, tiny_archive, tmp_path, "infospc",
                     extra=["--info-cat-dims", "4", "--info-cont-dims", "2"])
    for c in t.logs["d_code_loss"]:
        assert np.all(np.isfinite(np.asarray(c)))


def test_scene_trainer_chunked_device_data(tiny_archive, tmp_path):
    from tartangan_tpu.train.scene import SceneTrainer
    argv = [
        tiny_archive, "--config", "16", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--checkpoint-freq", "100",
        "--run-id", "scenespc", "--dtype", "f32", "--quiet-logs",
        "--steps-per-call", "2", "--device-data",
        "--scene-size", "8", "--patch-size", "3",
        "--num-patches", "5", "--patch-noise",
    ]
    trainer = SceneTrainer.create_from_cli(argv)
    trainer.train()
    assert trainer.steps == 2
    assert np.all(np.isfinite(np.ravel(np.asarray(
        trainer.logs["g_loss"][0]))))
