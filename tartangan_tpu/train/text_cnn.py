"""Text GAN trainer — jointly-trained SkipGram embedding + 1-D conv GAN.

Parity: reference tartangan/trainers/text_cnn.py:33-250. Every step trains
the SkipGram on random context windows (SGD); after ``--pretrain-embedding``
steps the adversarial loop (BCE + R1 + EMA) runs over the *embedded* docs
(1-D conv stacks, NLC layout). Both phases are separate jitted steps chosen
host-side, so phase switching costs no recompiles.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import GAN_CONFIGS
from ..data.text import TextDataset
from ..models import factories as F
from ..models.losses import bce_with_logits
from ..models.pluggan import Discriminator, Generator
from ..models.text import SkipGram
from .cnn import CNNTrainer
from .common import (
    apply_model,
    bce_labels,
    ema_update,
    make_adam,
    selu_reinit,
)
from .state import TextGANTrainState


def _window_slices(indexes, offsets, window_size):
    """Per-row dynamic windows: indexes (B, L), offsets (B,) ->
    (B, window_size) (reference text_cnn.py:168-172)."""
    gather_idx = offsets[:, None] + jnp.arange(window_size)[None, :]
    return jnp.take_along_axis(indexes, gather_idx, axis=1)


def make_text_train_steps(g, d, emb, opt_g, opt_d, opt_emb, *, latent_dims,
                          context, grad_penalty, ema_factor, dtype,
                          iters_d: int = 1):
    """Returns (embed_step, full_step); both (state, int32 batch, rng) ->
    (state, metrics). Mirrors reference text_cnn.py:157-231. ``iters_d``
    statically unrolls N discriminator updates (fresh fakes each) per
    generator update in the full step (reference trainer.py:131)."""
    window_size = 2 * context + 1

    def embedding_update(state, indexes, rng):
        k_off, k_neg = jax.random.split(rng)
        offsets = jax.random.randint(
            k_off, (indexes.shape[0],), 0, window_size)
        windows = _window_slices(indexes, offsets, window_size)
        words = windows[:, context]
        contexts = jnp.concatenate(
            [windows[:, :context], windows[:, context + 1:]], axis=1)

        def loss_fn(emb_params):
            return emb.apply({"params": emb_params}, words, contexts, k_neg,
                             method=SkipGram.loss)

        loss, grads = jax.value_and_grad(loss_fn)(state.emb_params)
        updates, opt_state = opt_emb.update(grads, state.opt_emb,
                                            state.emb_params)
        emb_params = optax.apply_updates(state.emb_params, updates)
        return emb_params, opt_state, loss

    def embed_step(state, indexes, rng):
        emb_params, opt_emb_state, emb_loss = embedding_update(
            state, indexes, rng)
        # reference updates target-G every batch even while pretraining
        target = ema_update(state.g_params, state.target_g_params, ema_factor)
        new_state = state.replace(
            emb_params=emb_params, opt_emb=opt_emb_state,
            target_g_params=target)
        zero = jnp.float32(0.0)
        return new_state, {"g_loss": zero, "d_loss": zero, "gp": zero,
                           "embedding_loss": emb_loss}

    def full_step(state, indexes, rng):
        rng_emb, rng_zg, *d_keys = jax.random.split(rng, 2 + iters_d)
        emb_params, opt_emb_state, emb_loss = embedding_update(
            state, indexes, rng_emb)

        # embed docs; GAN sees them as fixed real data (text_cnn.py:184)
        real = jax.lax.stop_gradient(
            emb.apply({"params": emb_params}, indexes)).astype(dtype)
        batch_size = real.shape[0]

        d_params = state.d_params
        d_stats = state.d_stats
        opt_d_state = state.opt_d
        g_stats1 = state.g_stats
        d_total = gp = jnp.float32(0.0)
        for it in range(iters_d):
            # ---- D step
            z = jax.random.normal(
                d_keys[it], (batch_size, latent_dims), jnp.float32)
            fake, g_stats1 = apply_model(g, state.g_params, g_stats1, z)
            fake = jax.lax.stop_gradient(fake)

            def d_loss_fn(d_params, d_stats=d_stats, fake=fake):
                def d_real_sum(x):
                    logits, stats = apply_model(d, d_params, d_stats, x)
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
                p_fake, d_stats2 = apply_model(d, d_params, d_stats1, fake)
                p_all = jnp.concatenate([p_real, p_fake], axis=0)
                loss = bce_with_logits(p_all, bce_labels(batch_size))
                return loss + grad_penalty * gp, (d_stats2, gp)

            (d_total, (d_stats, gp)), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(d_params)
            d_updates, opt_d_state = opt_d.update(
                d_grads, opt_d_state, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
        d_stats2 = d_stats

        # ---- G step
        z2 = jax.random.normal(rng_zg, (batch_size, latent_dims), jnp.float32)

        def g_loss_fn(g_params):
            fake2, g_stats2 = apply_model(g, g_params, g_stats1, z2)
            p, d_stats3 = apply_model(d, d_params, d_stats2, fake2)
            loss = bce_with_logits(p, jnp.ones((batch_size, 1), jnp.float32))
            return loss, (g_stats2, d_stats3)

        (g_loss, (g_stats2, d_stats3)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, opt_g_state = opt_g.update(
            g_grads, state.opt_g, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        target = ema_update(g_params, state.target_g_params, ema_factor)
        new_state = TextGANTrainState(
            g_params=g_params, g_stats=g_stats2, target_g_params=target,
            d_params=d_params, d_stats=d_stats3,
            opt_g=opt_g_state, opt_d=opt_d_state,
            emb_params=emb_params, opt_emb=opt_emb_state,
        )
        return new_state, {"g_loss": g_loss, "d_loss": d_total, "gp": gp,
                           "embedding_loss": emb_loss}

    return embed_step, full_step


class TextCNNTrainer(CNNTrainer):
    """Reference trainers/text_cnn.py:33-250."""

    def prepare_dataset(self):
        # build_models() constructs the dataset early (the vocab sizes the
        # embedding); Trainer.train() then reuses it
        if getattr(self, "dataset", None) is not None:
            return self.dataset
        return TextDataset.from_path(
            self.args.data_path, doc_len=self.gan_config.max_size)

    def build_models(self):
        args = self.args
        if self.steps_per_call > 1:
            raise NotImplementedError(
                "--steps-per-call chunking is not wired into the two-phase "
                "(embedding pretrain / full GAN) text step schedule")
        cfg = GAN_CONFIGS[args.config].scale_model(args.model_scale)
        # data_dims becomes the embedding width (text_cnn.py:36-39)
        import dataclasses
        cfg = dataclasses.replace(cfg, data_dims=args.embedding_dims)
        self.gan_config = cfg
        dtype = self.dtype

        self.g = Generator(
            cfg,
            input_factory=F.g_input_factory("mlp1d", args.activation),
            block_factory=F.g_block_factory(args.norm, args.activation,
                                            ndim=1),
            output_factory=F.g_output_factory(
                args.norm, args.activation, output_activation="id", ndim=1),
            dtype=dtype,
        )
        self.d = Discriminator(
            cfg,
            input_factory=F.d_input_factory(ndim=1),
            block_factory=F.d_block_factory(args.norm, args.activation,
                                            ndim=1),
            output_factory=F.d_output_factory(args.norm, args.activation),
            dtype=dtype,
        )

        # dataset must exist before the embedding (vocab size); the base
        # Trainer.train() calls build_models() before prepare_dataset(), so
        # build it here and reuse
        self.dataset = self.prepare_dataset()
        self.embedding = SkipGram(
            len(self.dataset.vocab), args.embedding_dims, dtype=dtype)

        # numpy, not jnp: a TPU-resident array entering the CPU-pinned init
        # is a device->host fetch, which permanently degrades the relayed-TPU
        # dispatch pipeline (docs/PERF.md "readback poison")
        init_z = np.zeros((2, cfg.latent_dims), np.float32)
        init_seq = np.zeros((2, cfg.max_size, cfg.data_dims), np.float32)
        with self.init_device():
            g_vars = self.g.init(self.next_key(), init_z, train=True)
            d_vars = self.d.init(self.next_key(), init_seq, train=True)
            emb_vars = self.embedding.init(
                self.next_key(), np.zeros((2, 4), np.int32))

        g_params, d_params = g_vars["params"], d_vars["params"]
        if args.activation == "selu":
            g_params = selu_reinit(self.next_key(), g_params)
            d_params = selu_reinit(self.next_key(), d_params)

        self.opt_g = make_adam(args.lr_g)
        self.opt_d = make_adam(args.lr_d)
        self.opt_emb = optax.sgd(args.lr_d)  # text_cnn.py:157-159

        if args.ema_start == "copy":
            target_params = jax.tree_util.tree_map(jnp.copy, g_params)
        else:
            fresh = self.g.init(self.next_key(), init_z, train=True)["params"]
            target_params = ema_update(g_params, fresh, args.lr_target_g)

        state = TextGANTrainState(
            g_params=g_params, g_stats=g_vars.get("batch_stats", {}),
            target_g_params=target_params,
            d_params=d_params, d_stats=d_vars.get("batch_stats", {}),
            opt_g=self.opt_g.init(g_params),
            opt_d=self.opt_d.init(d_params),
            emb_params=emb_vars["params"],
            opt_emb=self.opt_emb.init(emb_vars["params"]),
        )
        self.state = self.put_state(state)
        self.pretraining_embedding = args.pretrain_embedding

        embed_step, full_step = make_text_train_steps(
            self.g, self.d, self.embedding,
            self.opt_g, self.opt_d, self.opt_emb,
            latent_dims=cfg.latent_dims, context=args.context,
            grad_penalty=args.grad_penalty, ema_factor=args.lr_target_g,
            dtype=dtype, iters_d=args.iters_d,
        )
        self._embed_step = jax.jit(embed_step, donate_argnums=(0,))
        self._full_step = jax.jit(full_step, donate_argnums=(0,))
        self._sample_apply = jax.jit(
            lambda params, stats, z, rngs: apply_model(
                self.g, params, stats, z, rngs=rngs or None)[0])
        self._lookup = jax.jit(self._lookup_impl)

    def _lookup_impl(self, emb_params, zs):
        from ..models.text import skipgram_lookup
        return skipgram_lookup(emb_params["embedding_u"], zs)

    def lookup(self, zs):
        """Decode generated embedding sequences to vocab ids."""
        return self._lookup(self.state.emb_params, zs)

    def train_batch(self, batch):
        if self.pretraining_embedding > 0:
            self.pretraining_embedding -= 1
            step = self._embed_step
        else:
            step = self._full_step
        self.state, metrics = step(self.state, batch, self.next_key())
        return metrics

    def checkpoint_artifacts(self):
        artifacts = super().checkpoint_artifacts()
        artifacts["embedding"] = self.state.emb_params
        artifacts["opt_emb"] = self.state.opt_emb
        return artifacts

    def load_checkpoint_artifacts(self, artifacts):
        super().load_checkpoint_artifacts(artifacts)
        self.state = self.state.replace(
            emb_params=artifacts["embedding"],
            opt_emb=artifacts["opt_emb"])

    @classmethod
    def get_component_classes(cls, args):
        from .components.model_checkpoint import ModelCheckpointComponent
        from .components.text_sampler import TextSamplerComponent
        classes = [TextSamplerComponent, ModelCheckpointComponent]
        if args.metrics_collector:
            from .components.metrics import (
                KatibMetricsComponent,
                KubeflowMetricsComponent,
                TensorboardComponent,
            )
            classes.append({
                "katib": KatibMetricsComponent,
                "kubeflow": KubeflowMetricsComponent,
                "tensorboard": TensorboardComponent,
            }[args.metrics_collector])
        return classes

    @classmethod
    def add_args_to_parser(cls, p):
        super().add_args_to_parser(p)
        p.add_argument("--embedding-dims", type=int, default=64)
        p.add_argument("--context", type=int, default=3)
        p.add_argument("--pretrain-embedding", type=int, default=10000)


def main(argv=None):
    trainer = TextCNNTrainer.create_from_cli(argv)
    trainer.train()


if __name__ == "__main__":
    main()
