"""Text stack tests: tokenizer/vocab/dataset, skipgram, text trainer."""
import numpy as np

from tartangan_tpu.data.text import TextDataset, basic_english_tokenizer


def _corpus(tmp_path):
    docs = [
        "The quick brown fox jumps over the lazy dog .",
        "A stitch in time saves nine , they say !",
        "To be or not to be , that is the question ?",
        "All that glitters is not gold .",
        "The early bird catches the worm .",
        "Better late than never , better safe than sorry .",
        "Actions speak louder than words .",
        "The pen is mightier than the sword .",
    ] * 3
    path = tmp_path / "docs.txt"
    path.write_text("\n".join(docs))
    return str(path)


def test_tokenizer_basic_english():
    toks = basic_english_tokenizer("Hello, World! It's fine.")
    assert toks == ["hello", ",", "world", "!", "it", "'", "s", "fine", "."]


def test_text_dataset_batch(tmp_path):
    ds = TextDataset.from_path(_corpus(tmp_path), doc_len=16)
    assert len(ds) == 24
    batch = ds.batch([0, 1, 2])
    assert batch.shape == (3, 16)
    assert batch.dtype == np.int32
    # padded with <pad>
    assert ds.vocab.pad_id in batch[3 % 3]
    assert ds.vocab.itos[ds.vocab.pad_id] == "<pad>"


def test_skipgram_lookup_roundtrip():
    import jax.numpy as jnp
    from tartangan_tpu.models.text import skipgram_lookup

    rng = np.random.default_rng(0)
    table = rng.standard_normal((10, 4)).astype(np.float32)
    ids = np.array([[3, 7, 2], [9, 1, 5]])
    # feed scaled embedding vectors; nearest neighbor should recover the ids
    zs = table[ids] * 10.0
    out = np.asarray(skipgram_lookup(jnp.asarray(table), jnp.asarray(zs)))
    # ids >= 1 recoverable (index 0 = <unk> is skipped by design)
    mask = ids >= 1
    np.testing.assert_array_equal(out[mask], ids[mask])


def test_text_trainer_pretrain_and_gan(tmp_path):
    from tartangan_tpu.train.text_cnn import TextCNNTrainer

    argv = [
        _corpus(tmp_path),
        "--config", "16", "--batch-size", "8", "--epochs", "1",
        "--output", str(tmp_path / "out"), "--gen-freq", "100",
        "--run-id", "text", "--dtype", "f32", "--quiet-logs",
        "--embedding-dims", "16", "--pretrain-embedding", "2",
        "--context", "2",
    ]
    trainer = TextCNNTrainer.create_from_cli(argv)
    trainer.train()
    assert trainer.steps == 3
    emb_losses = [float(v) for v in trainer.logs["embedding_loss"]]
    assert all(np.isfinite(v) for v in emb_losses)
    # first 2 steps pretrain only (g_loss 0), step 3 runs the GAN
    g_losses = [float(v) for v in trainer.logs["g_loss"]]
    assert g_losses[0] == 0.0 and g_losses[1] == 0.0
    assert g_losses[2] != 0.0
    # text samples written
    import os
    samples = os.listdir(tmp_path / "out" / "text" / "samples")
    assert any(s.endswith(".txt") for s in samples)
