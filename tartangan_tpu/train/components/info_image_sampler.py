"""InfoGAN sample sweeps: continuous-code sweeps + categorical one-hots.

Parity: reference components/info_image_sampler.py:13-61 — one grid sweeping
each continuous code from -2..2 over 7 points (plus a non-controlled dim
row), one grid rendering each categorical one-hot for a few base latents.
"""
from __future__ import annotations

import os

import jax
import numpy as np

from ...utils.imaging import save_image
from .image_sampler import ImageSamplerComponent


class InfoImageSamplerComponent(ImageSamplerComponent):
    def on_train_begin(self, steps, logs):
        super().on_train_begin(steps, logs)
        args = self.trainer.args
        self.num_cont_dims = min(4, args.info_cont_dims)
        self.num_points_per_dim = 7
        base_z = np.asarray(jax.device_get(self.trainer.sample_z(1)))[0]

        pts = np.linspace(-2, 2, self.num_points_per_dim, dtype=np.float32)
        rows = []
        for i in range(self.num_cont_dims):
            sweep = np.tile(base_z, (self.num_points_per_dim, 1))
            sweep[:, args.info_cat_dims + i] = pts
            rows.append(sweep)
        # a row sweeping a non-controlled dim for contrast
        sweep = np.tile(base_z, (self.num_points_per_dim, 1))
        sweep[:, -1] = pts
        rows.append(sweep)
        self.continuous_samples = np.stack(rows)  # (rows, 7, latent)

        if args.info_cat_dims:
            num_cat_samples = 3
            extra = np.asarray(jax.device_get(
                self.trainer.sample_z(num_cat_samples - 1)))
            bases = np.concatenate([base_z[None], extra], axis=0)
            cats = []
            eye = np.eye(args.info_cat_dims, dtype=np.float32)
            for b in bases:
                block = np.tile(b, (args.info_cat_dims, 1))
                block[:, :args.info_cat_dims] = eye
                cats.append(block)
            self.categorical_samples = np.stack(cats)
        else:
            self.categorical_samples = None

    def output_samples(self, filename, n=None):
        for name, samples in (
            ("cat", self.categorical_samples),
            ("cont", self.continuous_samples),
        ):
            if samples is None:
                continue
            nrow = samples.shape[1]
            flat = samples.reshape(-1, samples.shape[-1])
            imgs = self.trainer.sample_g(z=flat, target_g=True)
            grid_filename = os.path.join(
                os.path.dirname(filename),
                f"info_{name}_{os.path.basename(filename)}",
            )
            save_image(np.asarray(jax.device_get(imgs), np.float32),
                       grid_filename, nrow=nrow)
