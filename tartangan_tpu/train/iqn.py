"""IQN trainer — quantile-regression discriminator workload.

Parity: reference tartangan/trainers/iqn.py:29-157. Same generator as the
CNN trainer; the discriminator ends in an IQN head whose quantile-Huber
loss is computed in-graph (``d(x, targets=...)`` returns (pred, loss) —
reference blocks/discriminator.py:164-178), so D's forward and the loss are
one fused region. Tau sampling rides the step's PRNG key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..models import factories as F
from ..models.pluggan import IQNDiscriminator
from .cnn import CNNTrainer
from .common import apply_model, ema_update, normalize_batch
from .state import GANTrainState


def make_iqn_train_step(g, d, opt_g, opt_d, *, latent_dims, grad_penalty,
                        ema_factor, dtype, iters_d: int = 1):
    """(state, uint8 batch, rng) -> (state, metrics).
    Mirrors reference trainers/iqn.py:104-147. ``iters_d`` statically
    unrolls N discriminator updates (fresh fakes + taus each) per generator
    update, as the reference base loop intends (trainer.py:131)."""

    def d_apply(d_params, d_stats, x, targets, key):
        (pred, loss), new_stats = apply_model(
            d, d_params, d_stats, x, targets=targets,
            rngs={"iqn": key})
        return pred, loss, new_stats

    def train_step(state, batch_u8, rng):
        batch_size = batch_u8.shape[0]
        real = normalize_batch(batch_u8, dtype)
        rng_zg, k_gen, *d_keys = jax.random.split(rng, 2 + 3 * iters_d)
        ones = jnp.ones((batch_size, 1), jnp.float32)
        zeros = jnp.zeros((batch_size, 1), jnp.float32)

        d_params = state.d_params
        d_stats = state.d_stats
        opt_d_state = state.opt_d
        g_stats1 = state.g_stats
        d_total = gp = jnp.float32(0.0)
        for it in range(iters_d):
            # ---- D step (iqn.py:108-129)
            rng_zd, k_real, k_fake = d_keys[3 * it:3 * it + 3]
            z = jax.random.normal(
                rng_zd, (batch_size, latent_dims), jnp.float32)
            fake, g_stats1 = apply_model(g, state.g_params, g_stats1, z)
            fake = jax.lax.stop_gradient(fake)

            def d_loss_fn(d_params, d_stats=d_stats, fake=fake,
                          k_real=k_real, k_fake=k_fake):
                def d_real_sum(x):
                    pred, loss_r, stats = d_apply(
                        d_params, d_stats, x, ones, k_real)
                    return jnp.sum(pred.astype(jnp.float32)), (loss_r, stats)

                if grad_penalty:
                    grads_x, (loss_real, d_stats1) = jax.grad(
                        d_real_sum, has_aux=True)(real)
                    gp = jnp.mean(jnp.sum(
                        jnp.square(grads_x.astype(jnp.float32)).reshape(
                            batch_size, -1), axis=1))
                else:
                    _, (loss_real, d_stats1) = d_real_sum(real)
                    gp = jnp.float32(0.0)
                _, loss_fake, d_stats2 = d_apply(
                    d_params, d_stats1, fake, zeros, k_fake)
                total = loss_real + loss_fake + grad_penalty * gp
                return total, (d_stats2, gp)

            (d_total, (d_stats, gp)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_params)
            d_updates, opt_d_state = opt_d.update(
                d_grads, opt_d_state, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
        d_stats2 = d_stats

        # ---- G step (iqn.py:131-140)
        z2 = jax.random.normal(rng_zg, (batch_size, latent_dims), jnp.float32)

        def g_loss_fn(g_params):
            fake2, g_stats2 = apply_model(g, g_params, g_stats1, z2)
            _, g_loss, d_stats3 = d_apply(
                d_params, d_stats2, fake2, ones, k_gen)
            return g_loss, (g_stats2, d_stats3)

        (g_loss, (g_stats2, d_stats3)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, opt_g_state = opt_g.update(
            g_grads, state.opt_g, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        target = ema_update(g_params, state.target_g_params, ema_factor)

        new_state = GANTrainState(
            g_params=g_params, g_stats=g_stats2, target_g_params=target,
            d_params=d_params, d_stats=d_stats3,
            opt_g=opt_g_state, opt_d=opt_d_state,
        )
        return new_state, {"g_loss": g_loss, "d_loss": d_total, "gp": gp}

    return train_step


class IQNTrainer(CNNTrainer):
    """Reference trainers/iqn.py:29-157."""

    def build_discriminator(self):
        args = self.args
        return IQNDiscriminator(
            self.gan_config,
            block_factory=F.d_block_factory(
                args.norm, args.activation, remat=args.remat,
                remat_policy_name=getattr(args, "remat_policy", "full"),
                parity=F.resolve_parity(
                    getattr(args, "parity_blocks", "auto"))),
            output_factory=F.iqn_d_output_factory(args.norm, args.activation),
            dtype=self.dtype,
        )

    def init_discriminator(self, init_img):
        key = self.next_key()
        return self.d.init(
            {"params": key, "iqn": key}, init_img, train=True,
            targets=jnp.ones((init_img.shape[0], 1), jnp.float32))

    def make_train_step(self):
        return make_iqn_train_step(
            self.g, self.d, self.opt_g, self.opt_d,
            latent_dims=self.gan_config.latent_dims,
            grad_penalty=self.args.grad_penalty,
            ema_factor=self.args.lr_target_g,
            dtype=self.dtype,
            iters_d=self.args.iters_d,
        )


def main(argv=None):
    trainer = IQNTrainer.create_from_cli(argv)
    trainer.train()


if __name__ == "__main__":
    main()
