"""Text sample renderer: decode generated embedding sequences to text files.

Parity: reference components/text_sampler.py:13-50 — fixed 32-z panel at
train begin; every ``--gen-freq`` steps decode 16 generated docs by
nearest-vocab lookup and write them wrapped to ``samples/sample_{steps}.txt``.
"""
from __future__ import annotations

import textwrap

import jax
import numpy as np

from ...utils.fs import maybe_makedirs, smart_open
from .base import TrainerComponent


class TextSamplerComponent(TrainerComponent):
    def on_train_begin(self, steps, logs):
        maybe_makedirs(self.sample_root, exist_ok=True)
        self.progress_samples = self.trainer.sample_z(32)

    def on_train_end(self, steps, logs):
        self.output_samples(f"{self.sample_root}/sample_{steps}.txt")

    def on_batch_end(self, steps, logs):
        if self.every(self.trainer.args.gen_freq, steps):
            self.output_samples(f"{self.sample_root}/sample_{steps}.txt")

    def output_samples(self, filename, n=None):
        trainer = self.trainer
        generated = trainer.sample_g(z=self.progress_samples)[:16]
        ids = np.asarray(jax.device_get(trainer.lookup(generated)))
        vocab = trainer.dataset.vocab
        with smart_open(filename, "w") as outfile:
            for row in ids:
                doc = " ".join(vocab.itos[i] for i in row)
                outfile.writelines(
                    [s + "\n" for s in textwrap.wrap(doc, 70)])
                outfile.write("-" * 40 + "\n")

    @property
    def sample_root(self):
        return f"{self.trainer.output_root}/samples"
