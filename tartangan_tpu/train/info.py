"""InfoGAN trainer — adversarial loss + latent-code reconstruction.

Parity: reference tartangan/trainers/info.py:32-258. The discriminator has
two heads (adversarial logit, code reconstruction — info.py:65-76 via
MultiModelDiscriminatorOutput); latent codes are the first
``info_cat_dims`` (one-hot categorical) + next ``info_cont_dims``
(continuous) dimensions of z; the code-reconstruction loss (BCE on cat,
MSE on cont, weight ``--info-w``) is added to BOTH the D and G losses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models import factories as F
from ..models.losses import bce_with_logits
from ..models.pluggan import Discriminator
from .cnn import CNNTrainer
from .common import apply_model, bce_labels, ema_update, normalize_batch
from .state import GANTrainState


def sample_info_z(rng, n, latent_dims, cat_dims):
    """z ~ N(0,1) with the first ``cat_dims`` dims replaced by a random
    one-hot (reference info.py:204-213)."""
    k_z, k_cat = jax.random.split(rng)
    z = jax.random.normal(k_z, (n, latent_dims), jnp.float32)
    if cat_dims:
        cats = jax.random.randint(k_cat, (n,), 0, cat_dims)
        onehot = jax.nn.one_hot(cats, cat_dims, dtype=jnp.float32)
        z = jnp.concatenate([onehot, z[:, cat_dims:]], axis=1)
    return z


def make_info_train_step(g, d, opt_g, opt_d, *, latent_dims, cat_dims,
                         cont_dims, info_w, grad_penalty, ema_factor, dtype,
                         iters_d: int = 1):
    """Mirrors reference trainers/info.py:122-191. ``iters_d`` statically
    unrolls N discriminator updates (fresh codes + fakes each) per
    generator update (reference base-loop intent, trainer.py:131)."""

    def cat_code(v):
        return v[..., :cat_dims]

    def cont_code(v):
        return v[..., cat_dims:cat_dims + cont_dims]

    def code_loss(p_codes, z):
        loss = jnp.float32(0.0)
        if cat_dims:
            loss += bce_with_logits(cat_code(p_codes), cat_code(z))
        if cont_dims:
            diff = cont_code(p_codes).astype(jnp.float32) - cont_code(z)
            loss += jnp.mean(jnp.square(diff))
        return loss

    def train_step(state, batch_u8, rng):
        batch_size = batch_u8.shape[0]
        real = normalize_batch(batch_u8, dtype)
        rng_zg, *d_keys = jax.random.split(rng, 1 + iters_d)

        d_params = state.d_params
        d_stats = state.d_stats
        opt_d_state = state.opt_d
        g_stats1 = state.g_stats
        d_total = gp = d_code_loss = jnp.float32(0.0)
        for it in range(iters_d):
            # ---- D step (info.py:122-158)
            z = sample_info_z(d_keys[it], batch_size, latent_dims, cat_dims)
            fake, g_stats1 = apply_model(g, state.g_params, g_stats1, z)
            fake = jax.lax.stop_gradient(fake)

            def d_loss_fn(d_params, d_stats=d_stats, fake=fake, z=z):
                def d_real_sum(x):
                    (logits, _codes), stats = apply_model(
                        d, d_params, d_stats, x)
                    return jnp.sum(logits.astype(jnp.float32)), (logits,
                                                                 stats)

                if grad_penalty:
                    grads_x, (p_real, d_stats1) = jax.grad(
                        d_real_sum, has_aux=True)(real)
                    gp = jnp.mean(jnp.sum(
                        jnp.square(grads_x.astype(jnp.float32)).reshape(
                            batch_size, -1), axis=1))
                else:
                    _, (p_real, d_stats1) = d_real_sum(real)
                    gp = jnp.float32(0.0)
                (p_fake, p_codes), d_stats2 = apply_model(
                    d, d_params, d_stats1, fake)
                p_all = jnp.concatenate([p_real, p_fake], axis=0)
                adv = bce_with_logits(p_all, bce_labels(batch_size))
                d_code_loss = code_loss(p_codes, z)
                total = adv + info_w * d_code_loss + grad_penalty * gp
                return total, (d_stats2, gp, d_code_loss)

            (d_total, (d_stats, gp, d_code_loss)), d_grads = (
                jax.value_and_grad(d_loss_fn, has_aux=True)(d_params))
            d_updates, opt_d_state = opt_d.update(
                d_grads, opt_d_state, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
        d_stats2 = d_stats

        # ---- G step (info.py:160-183)
        z2 = sample_info_z(rng_zg, batch_size, latent_dims, cat_dims)

        def g_loss_fn(g_params):
            fake2, g_stats2 = apply_model(g, g_params, g_stats1, z2)
            (p, p_codes), d_stats3 = apply_model(
                d, d_params, d_stats2, fake2)
            adv = bce_with_logits(p, jnp.ones((batch_size, 1), jnp.float32))
            g_code_loss = code_loss(p_codes, z2)
            return adv + info_w * g_code_loss, (g_stats2, d_stats3,
                                                g_code_loss)

        (g_total, (g_stats2, d_stats3, g_code_loss)), g_grads = (
            jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params))
        g_updates, opt_g_state = opt_g.update(
            g_grads, state.opt_g, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        target = ema_update(g_params, state.target_g_params, ema_factor)

        new_state = GANTrainState(
            g_params=g_params, g_stats=g_stats2, target_g_params=target,
            d_params=d_params, d_stats=d_stats3,
            opt_g=opt_g_state, opt_d=opt_d_state,
        )
        metrics = {"g_loss": g_total, "g_code_loss": g_code_loss,
                   "d_loss": d_total, "d_code_loss": d_code_loss, "gp": gp}
        return new_state, metrics

    return train_step


class InfoTrainer(CNNTrainer):
    """Reference trainers/info.py:32-249."""

    def build_discriminator(self):
        args = self.args
        return Discriminator(
            self.gan_config,
            block_factory=F.d_block_factory(
                args.norm, args.activation, remat=args.remat,
                remat_policy_name=getattr(args, "remat_policy", "full"),
                parity=F.resolve_parity(
                    getattr(args, "parity_blocks", "auto"))),
            output_factory=F.info_d_output_factory(
                args.norm, args.activation,
                args.info_cat_dims + args.info_cont_dims),
            dtype=self.dtype,
        )

    def make_train_step(self):
        return make_info_train_step(
            self.g, self.d, self.opt_g, self.opt_d,
            latent_dims=self.gan_config.latent_dims,
            cat_dims=self.args.info_cat_dims,
            cont_dims=self.args.info_cont_dims,
            info_w=self.args.info_w,
            grad_penalty=self.args.grad_penalty,
            ema_factor=self.args.lr_target_g,
            dtype=self.dtype,
            iters_d=self.args.iters_d,
        )

    def sample_z(self, n=None):
        if n is None:
            n = self.args.batch_size
        return sample_info_z(
            self.next_key(), n, self.gan_config.latent_dims,
            self.args.info_cat_dims)

    @classmethod
    def get_component_classes(cls, args):
        from .components.info_image_sampler import InfoImageSamplerComponent
        classes = super().get_component_classes(args)
        classes.append(InfoImageSamplerComponent)
        return classes

    @classmethod
    def add_args_to_parser(cls, p):
        super().add_args_to_parser(p)
        p.add_argument("--info-cat-dims", type=int, default=10)
        p.add_argument("--info-cont-dims", type=int, default=5)
        p.add_argument("--info-w", type=float, default=1.0)


def main(argv=None):
    trainer = InfoTrainer.create_from_cli(argv)
    trainer.train()


if __name__ == "__main__":
    main()
