"""GAN inversion: optimize latent codes to reconstruct a target image.

Parity: reference tartangan/explore/find_image.py:17-134 — optimize z with
Adam/SGD (optax) under MSE/L1 reconstruction loss, optional L2 latent
regularization, and the stochastic-clipping trick (|z|>3 resampled,
https://openreview.net/pdf?id=HJC88BzFl).

``--vgg`` replaces the pixel loss with a multi-scale perceptual loss
(reference find_image.py:60-67) — computed here from the in-repo flax
InceptionV3's Mixed-block features instead of torchvision's VGG16, so no
torch dependency: images are renormalized/resized exactly as the FID path
does and intermediate activations are captured at ``--perceptual-layers``.
Ported pretrained weights sharpen it (--inception-weights /
$TARTANGAN_INCEPTION_WEIGHTS); random-init features still give a usable
multi-scale prior.

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

        # optimizer map: reference find_image.py:49-52 (Adam/SGD/LBFGS).
        # LBFGS is optax.lbfgs — its zoom line search is jax-native
        # (lax.while_loop), so the whole step still jits into one dispatch.
        opt = {
            "adam": optax.adam,
            "sgd": optax.sgd,
            "lbfgs": optax.lbfgs,
        }[self.args.optimizer](self.args.lr)
        is_lbfgs = self.args.optimizer == "lbfgs"

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

        if self.args.vgg:
            features = self._make_feature_extractor()
            target_feats = [jax.lax.stop_gradient(f)
                            for f in features(target)]

            def image_loss(imgs):
                # perceptual loss REPLACES pixel loss, as in the reference
                # (find_image.py:60-67); only the L2 code reg is added
                return sum(recon(f, t) for f, t
                           in zip(features(imgs), target_feats))
        else:
            def image_loss(imgs):
                return recon(imgs, target)

        def loss_fn(z):
            imgs, _ = g.apply(g_vars, z, train=True,
                              mutable=["batch_stats"])
            return image_loss(imgs.astype(jnp.float32)) \
                + jnp.mean(jnp.square(z)) * l2_w, imgs

        @jax.jit
        def step(z, opt_state, key):
            # stochastic clipping before the gradient step
            should_clip = (jnp.abs(z) > 3.0).astype(z.dtype)
            noise = jax.random.normal(key, z.shape, z.dtype)
            z = z * (1.0 - should_clip) + noise * should_clip
            (loss, imgs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(z)
            if is_lbfgs:
                # the L-BFGS line search re-evaluates the objective along
                # the search direction, so it needs the scalar value_fn
                updates, opt_state = opt.update(
                    grads, opt_state, z, value=loss, grad=grads,
                    value_fn=lambda zz: loss_fn(zz)[0])
            else:
                updates, opt_state = opt.update(grads, opt_state, z)
            z = optax.apply_updates(z, updates)
            return z, opt_state, loss, imgs

        z = self.sample_z(self.args.num_samples)
        opt_state = opt.init(z)
        key = jax.random.PRNGKey(0)
        self.loss_history = []
        for i in range(self.args.max_steps):
            key, sub = jax.random.split(key)
            z, opt_state, loss, imgs = step(z, opt_state, sub)
            self.loss_history.append(float(loss))
            if i % self.args.save_freq == 0 or i == self.args.max_steps - 1:
                self.save_image(
                    np.asarray(imgs, np.float32),
                    f"{self.args.output_prefix}_{i}.png")
                print(f"step {i}: loss {float(loss):.4f} "
                      f"z range [{float(z.min()):.2f}, {float(z.max()):.2f}]")

    def _make_feature_extractor(self):
        """Multi-scale Inception features for the perceptual loss: images in
        [-1,1] are renormalized + resized exactly like the FID path, and the
        activations of ``--perceptual-layers`` are captured via flax
        intermediates."""
        from ..eval.inception import VGG_MEAN, VGG_STD
        from ..models.inception import init_inception, resolve_pretrained
        from ..ops.resize import resize_bilinear

        model, variables = init_inception()
        variables, pretrained = resolve_pretrained(
            variables, self.args.inception_weights)
        if not pretrained:
            print("[find_image] no pretrained Inception weights — the "
                  "perceptual loss uses random-init features "
                  "(--inception-weights sharpens it)")
        layers = tuple(self.args.perceptual_layers)
        if tuple(self.args.vgg_layers) != (9, 16, 23):
            print("[find_image] --vgg-layers indexes torchvision VGG16 "
                  "and does not apply to the Inception backbone; use "
                  "--perceptual-layers")

        def features(imgs):
            x = (imgs.astype(jnp.float32) + 1.0) / 2.0
            x = (x - jnp.asarray(VGG_MEAN)) / jnp.asarray(VGG_STD)
            x = resize_bilinear(x, 299, 299, align_corners=True)
            _, state = model.apply(
                variables, x, mutable=["intermediates"],
                capture_intermediates=lambda mdl, _: mdl.name in layers)
            inter = state["intermediates"]
            return [inter[name]["__call__"][0] for name in layers]

        return features

    @classmethod
    def add_args_to_parser(cls, p):
        super().add_args_to_parser(p)
        p.add_argument("target_image", help="Path to image to be found in G")
        p.add_argument("--max-steps", default=1000, type=int)
        p.add_argument("--num-samples", default=2, type=int)
        p.add_argument("--lr", default=0.5, type=float)
        p.add_argument("--vgg", action="store_true",
                       help="Perceptual (feature-space) reconstruction loss")
        p.add_argument("--vgg-layers", default=(9, 16, 23), type=int,
                       nargs="+")
        p.add_argument("--perceptual-layers", nargs="+",
                       default=("Mixed_5b", "Mixed_6b", "Mixed_7b"),
                       help="Inception blocks whose activations define the "
                            "perceptual loss")
        p.add_argument("--inception-weights", default=None,
                       help="Ported Inception-weights npz for the "
                            "perceptual loss (see eval.port_weights)")
        p.add_argument("--optimizer", default="adam")
        p.add_argument("--l2", default=0.0, type=float)
        p.add_argument("--loss", default="mse")
        p.add_argument("--save-freq", default=100, type=int)


if __name__ == "__main__":
    FindImage.run_from_cli()
