"""SA-GAN-style CNN trainer — the primary workload.

Parity: reference tartangan/trainers/cnn.py (BCE-with-logits adversarial
loss + R1 gradient penalty on reals + EMA target generator, alternating
D/G updates, Adam betas (0, 0.999)).

TPU design: the whole train_batch — G forward for fakes, D on reals with the
R1 double-backward, D on fakes, both Adam updates, and the EMA — is ONE
jitted function. Under a data mesh the batch is sharded and XLA inserts the
gradient/batch-stat all-reduces; there are zero host syncs in the hot loop.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import GAN_CONFIGS
from ..models import factories as F
from ..models.losses import bce_with_logits
from ..models.pluggan import Discriminator, Generator
from .common import (
    apply_model,
    bce_labels,
    ema_update,
    make_adam,
    normalize_batch,
    selu_reinit,
)
from .state import GANTrainState
from .trainer import Trainer


def make_cnn_train_step(g, d, opt_g, opt_d, *, latent_dims, grad_penalty,
                        ema_factor, dtype, sample_z=None, g_rng_name=None,
                        iters_d: int = 1, r1_interval: int = 1):
    """Build the fused CNN GAN step: (state, uint8 batch, rng) -> (state,
    metrics). Mirrors reference trainers/cnn.py:107-156.

    ``sample_z(key, n)`` overrides latent sampling (e.g. InfoGAN codes);
    ``g_rng_name`` names an extra rng collection threaded into G applies
    (the scene generator's patch noise); ``iters_d`` runs N discriminator
    updates per generator update (the reference base trainer's intent at
    trainer.py:131 — broken there because no parser defines iters_d) —
    statically unrolled, each with fresh fakes.

    ``r1_interval > 1`` enables lazy R1 regularization (StyleGAN2
    practice; a deliberate departure from the reference's every-step
    penalty, opt-in via --r1-interval): the returned step applies R1
    with weight ``grad_penalty * r1_interval`` and carries a ``.no_r1``
    attribute — the same step compiled without the double-backward —
    plus ``.r1_interval``; the trainer/chunker alternates them so the
    time-averaged regularization pressure is unchanged while the
    R1 cost (22% of the '128' step, docs/PERF.md) is paid 1/N of the
    time.
    """
    if sample_z is None:
        def sample_z(key, n):
            return jax.random.normal(key, (n, latent_dims), jnp.float32)

    def g_rngs(key):
        return {g_rng_name: key} if g_rng_name else None

    def _make(gp_weight):
        def train_step(state, batch_u8, rng):
            batch_size = batch_u8.shape[0]
            real = normalize_batch(batch_u8, dtype)
            rng_zg, k_g2, *d_keys = jax.random.split(rng, 2 + 2 * iters_d)

            d_params = state.d_params
            d_stats = state.d_stats
            opt_d_state = state.opt_d
            g_stats1 = state.g_stats
            d_total = gp = jnp.float32(0.0)
            for it in range(iters_d):
                # ---- D step (cnn.py:113-137)
                z = sample_z(d_keys[2 * it], batch_size)
                fake, g_stats1 = apply_model(
                    g, state.g_params, g_stats1, z,
                    rngs=g_rngs(d_keys[2 * it + 1]))
                fake = jax.lax.stop_gradient(fake)

                def d_loss_fn(d_params, d_stats=d_stats, fake=fake):
                    def d_real_sum(x):
                        logits, stats = apply_model(d, d_params, d_stats, x)
                        return (jnp.sum(logits.astype(jnp.float32)),
                                (logits, stats))

                    if gp_weight:
                        grads_x, (p_real, d_stats1) = jax.grad(
                            d_real_sum, has_aux=True)(real)
                        gp = jnp.mean(jnp.sum(
                            jnp.square(grads_x.astype(jnp.float32)).reshape(
                                batch_size, -1), axis=1))
                    else:
                        _, (p_real, d_stats1) = d_real_sum(real)
                        gp = jnp.float32(0.0)
                    p_fake, d_stats2 = apply_model(
                        d, d_params, d_stats1, fake)
                    p_all = jnp.concatenate([p_real, p_fake], axis=0)
                    loss = bce_with_logits(p_all, bce_labels(batch_size))
                    total = loss + gp_weight * gp
                    return total, (d_stats2, gp)

                (d_total, (d_stats, gp)), d_grads = jax.value_and_grad(
                    d_loss_fn, has_aux=True)(d_params)
                d_updates, opt_d_state = opt_d.update(
                    d_grads, opt_d_state, d_params)
                d_params = optax.apply_updates(d_params, d_updates)
            return _finish_step(state, d_params, d_stats, opt_d_state,
                                g_stats1, rng_zg, k_g2, batch_size,
                                d_total, gp)
        return train_step

    def _finish_step(state, d_params, d_stats, opt_d_state, g_stats1,
                     rng_zg, k_g2, batch_size, d_total, gp):
        d_stats2 = d_stats

        # ---- G step (cnn.py:140-149)
        z2 = sample_z(rng_zg, batch_size)

        def g_loss_fn(g_params):
            fake2, g_stats2 = apply_model(g, g_params, g_stats1, z2,
                                          rngs=g_rngs(k_g2))
            p, d_stats3 = apply_model(d, d_params, d_stats2, fake2)
            loss = bce_with_logits(p, jnp.ones((batch_size, 1), jnp.float32))
            return loss, (g_stats2, d_stats3)

        (g_loss, (g_stats2, d_stats3)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, opt_g_state = opt_g.update(
            g_grads, state.opt_g, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # ---- EMA target generator (cnn.py:151, 158-165)
        target = ema_update(g_params, state.target_g_params, ema_factor)

        new_state = GANTrainState(
            g_params=g_params, g_stats=g_stats2, target_g_params=target,
            d_params=d_params, d_stats=d_stats3,
            opt_g=opt_g_state, opt_d=opt_d_state,
        )
        metrics = {"g_loss": g_loss, "d_loss": d_total, "gp": gp}
        return new_state, metrics

    if r1_interval > 1 and grad_penalty:
        step = _make(grad_penalty * r1_interval)
        step.no_r1 = _make(0.0)
        step.r1_interval = r1_interval
        return step
    return _make(grad_penalty)


class CNNTrainer(Trainer):
    """Reference trainers/cnn.py:28-165."""

    def build_models(self):
        args = self.args
        self.gan_config = GAN_CONFIGS[args.config].scale_model(args.model_scale)
        cfg = self.gan_config
        dtype = self.dtype

        self.g = self.build_generator()
        self.d = self.build_discriminator()

        # numpy, not jnp: these feed the CPU-pinned init below, and a
        # TPU-resident array entering a CPU-backend computation is a
        # device->host fetch — the first such fetch permanently degrades
        # the relayed-TPU dispatch pipeline (docs/PERF.md "readback poison")
        init_z = np.zeros((2, cfg.latent_dims), np.float32)
        init_img = np.zeros((2, cfg.max_size, cfg.max_size, cfg.data_dims),
                            np.float32)
        with self.init_device():
            g_vars = self.init_generator(init_z)
            d_vars = self.init_discriminator(init_img)

            g_params = g_vars["params"]
            d_params = d_vars["params"]
            if args.activation == "selu":
                g_params = selu_reinit(self.next_key(), g_params)
                d_params = selu_reinit(self.next_key(), d_params)

            self.opt_g = make_adam(args.lr_g)
            self.opt_d = make_adam(args.lr_d)

            if args.ema_start == "copy":
                # materialize distinct buffers: the train step donates its
                # input state; aliased g/target leaves would be donated twice
                target_params = jax.tree_util.tree_map(jnp.copy, g_params)
            else:
                # reference quirk: 'copy' is actually one 1e-3 EMA step from
                # an independent random init (cnn.py:95 + :158-165)
                fresh = self.init_generator(init_z)["params"]
                target_params = ema_update(g_params, fresh, args.lr_target_g)

            state = GANTrainState(
                g_params=g_params,
                g_stats=g_vars.get("batch_stats", {}),
                target_g_params=target_params,
                d_params=d_params,
                d_stats=d_vars.get("batch_stats", {}),
                opt_g=self.opt_g.init(g_params),
                opt_d=self.opt_d.init(d_params),
            )
        self.state = self.put_state(state)

        step_fn = self.make_train_step()
        self._train_step = jax.jit(step_fn, donate_argnums=(0,))
        self._r1_interval = getattr(step_fn, "r1_interval", 1)
        if getattr(step_fn, "no_r1", None) is not None:
            self._train_step_alt = jax.jit(step_fn.no_r1, donate_argnums=(0,))
        self._sample_apply = jax.jit(
            lambda params, stats, z, rngs: apply_model(
                self.g, params, stats, z, rngs=rngs or None)[0])

    # hooks overridden by the IQN / shared trainers
    def build_generator(self):
        args = self.args
        return Generator(
            self.gan_config,
            input_factory=F.g_input_factory(args.g_base, args.activation),
            block_factory=F.g_block_factory(
                args.norm, args.activation, remat=args.remat,
                remat_policy_name=getattr(args, "remat_policy", "full"),
                parity=F.resolve_parity(
                    getattr(args, "parity_blocks", "auto"))),
            output_factory=F.g_output_factory(args.norm, args.activation),
            dtype=self.dtype,
        )

    def build_discriminator(self):
        args = self.args
        return Discriminator(
            self.gan_config,
            block_factory=F.d_block_factory(
                args.norm, args.activation, remat=args.remat,
                remat_policy_name=getattr(args, "remat_policy", "full"),
                parity=F.resolve_parity(
                    getattr(args, "parity_blocks", "auto"))),
            output_factory=F.d_output_factory(args.norm, args.activation),
            dtype=self.dtype,
        )

    def init_generator(self, init_z):
        return self.g.init(self.next_key(), init_z, train=True)

    def init_discriminator(self, init_img):
        return self.d.init(self.next_key(), init_img, train=True)

    def make_train_step(self):
        return make_cnn_train_step(
            self.g, self.d, self.opt_g, self.opt_d,
            latent_dims=self.gan_config.latent_dims,
            grad_penalty=self.args.grad_penalty,
            ema_factor=self.args.lr_target_g,
            dtype=self.dtype,
            iters_d=self.args.iters_d,
            r1_interval=getattr(self.args, "r1_interval", 1),
        )


def main(argv=None):
    trainer = CNNTrainer.create_from_cli(argv)
    trainer.train()


if __name__ == "__main__":
    main()
