"""Periodic sample rendering: fixed-z panels + slerp interpolation grid.

Parity: reference components/image_sampler.py:12-57 — at train begin fix a
32-z panel; every ``--gen-freq`` steps render 16 target-G + 16 G samples to
``samples/sample_{steps}.png`` and a 5x5 slerp grid to ``grid_sample_...``.
"""
from __future__ import annotations

import os

import jax
import numpy as np

from ...utils.fs import maybe_makedirs
from ...utils.imaging import save_image
from ...utils.slerp import slerp_grid
from .base import TrainerComponent


class ImageSamplerComponent(TrainerComponent):
    def on_train_begin(self, steps, logs):
        maybe_makedirs(self.sample_root, exist_ok=True)
        self.progress_samples = self.trainer.sample_z(32)

    def on_train_end(self, steps, logs):
        self.output_samples(f"{self.sample_root}/sample_{steps}.png")

    def on_batch_end(self, steps, logs):
        if self.every(self.trainer.args.gen_freq, steps):
            self.output_samples(f"{self.sample_root}/sample_{steps}.png")

    def output_samples(self, filename, n=None):
        trainer = self.trainer
        imgs_target = trainer.sample_g(z=self.progress_samples,
                                       target_g=True)[:16]
        imgs_g = trainer.sample_g(z=self.progress_samples)[:16]
        imgs = np.concatenate([
            np.asarray(jax.device_get(imgs_target), np.float32),
            np.asarray(jax.device_get(imgs_g), np.float32),
        ], axis=0)
        save_image(imgs, filename, nrow=8)

        if not hasattr(self, "_latent_grid_samples"):
            self._latent_grid_samples = self.sample_latent_grid(5, 5)
        grid_imgs = trainer.sample_g(z=self._latent_grid_samples,
                                     target_g=True)
        grid_filename = os.path.join(
            os.path.dirname(filename), f"grid_{os.path.basename(filename)}"
        )
        save_image(np.asarray(jax.device_get(grid_imgs), np.float32),
                   grid_filename, nrow=5)

    def sample_latent_grid(self, nrows, ncols):
        corners = np.asarray(jax.device_get(self.trainer.sample_z(4)))
        return slerp_grid(*corners, nrows, ncols)

    @property
    def sample_root(self):
        return f"{self.trainer.output_root}/samples"
