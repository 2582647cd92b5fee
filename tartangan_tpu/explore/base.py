"""Base app for post-training generator exploration.

Parity: reference tartangan/explore/base.py:11-54. The reference loads
whole pickled torch modules; our checkpoints are pure parameter pytrees
(msgpack), so the app rebuilds the model architecture from the run's
``config.args`` replay file (written by every trainer run —
utils/cli.py::save_cli_arguments) and then loads parameters into it.

``checkpoint_root`` may be the step directory itself
(``.../run_id/checkpoints/1234``) or a run directory (latest step used).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..configs import GAN_CONFIGS
from ..models import factories as F
from ..models.pluggan import Discriminator, Generator
from ..utils.app import App
from ..utils.fs import smart_ls, smart_open
from ..utils.imaging import save_image


def parse_run_config(config_args_path):
    """Parse the model-defining flags out of a run's config.args file."""
    p = argparse.ArgumentParser()
    p.add_argument("data_path", nargs="?")
    p.add_argument("--config", default="64")
    p.add_argument("--model-scale", type=float, default=1.0)
    p.add_argument("--g-base", default="mlp")
    p.add_argument("--norm", default="bn")
    p.add_argument("--activation", default="relu")
    p.add_argument("--info-cat-dims", type=int, default=10)
    p.add_argument("--info-cont-dims", type=int, default=5)
    with smart_open(config_args_path, "r") as f:
        argv = [line.strip() for line in f if line.strip()]
    args, _ = p.parse_known_args(argv)
    return args


class GOutputApp(App):
    """Loads generator/discriminator checkpoints for exploration apps."""

    def resolve_checkpoint_dir(self):
        root = self.args.checkpoint_root
        if os.path.exists(os.path.join(root, "g.msgpack")):
            return root
        # run directory: pick the latest step under checkpoints/
        ckpts = os.path.join(root, "checkpoints")
        steps = [int(s) for s in smart_ls(ckpts) if s.isdigit()]
        if not steps:
            raise FileNotFoundError(f"no checkpoints under {root}")
        return os.path.join(ckpts, str(max(steps)))

    def run_root(self):
        """The run directory containing config.args."""
        ckpt_dir = self.resolve_checkpoint_dir()
        run_root = os.path.dirname(os.path.dirname(ckpt_dir))
        return run_root if run_root else "."

    def load_run_config(self):
        self.run_config = parse_run_config(
            os.path.join(self.run_root(), "config.args"))
        self.gan_config = GAN_CONFIGS[self.run_config.config].scale_model(
            self.run_config.model_scale)
        return self.run_config

    def build_generator(self):
        rc = self.run_config
        # parity blocks share the flax param tree, so checkpoints trained
        # either way load into either; auto = faster TPU generation
        return Generator(
            self.gan_config,
            input_factory=F.g_input_factory(rc.g_base, rc.activation),
            block_factory=F.g_block_factory(rc.norm, rc.activation,
                                            parity=F.resolve_parity("auto")),
            output_factory=F.g_output_factory(rc.norm, rc.activation),
        )

    def build_discriminator(self, info: bool = False):
        rc = self.run_config
        if info:
            output_factory = F.info_d_output_factory(
                rc.norm, rc.activation,
                rc.info_cat_dims + rc.info_cont_dims)
        else:
            output_factory = F.d_output_factory(rc.norm, rc.activation)
        return Discriminator(
            self.gan_config,
            block_factory=F.d_block_factory(rc.norm, rc.activation,
                                            parity=F.resolve_parity("auto")),
            output_factory=output_factory,
        )

    def _load_variables(self, module, init_input, filename):
        template = jax.device_get(
            module.init(jax.random.PRNGKey(0), init_input, train=True))
        template = {k: template[k] for k in ("params", "batch_stats")
                    if k in template}
        with smart_open(filename, "rb") as f:
            data = f.read()
        loaded = serialization.from_bytes(template, data)
        return loaded

    def load_generator(self, target: bool = True):
        self.load_run_config()
        ckpt = self.resolve_checkpoint_dir()
        self.g = self.build_generator()
        cfg = self.gan_config
        init_z = jnp.zeros((1, cfg.latent_dims), jnp.float32)
        # target checkpoints store only params; reuse g's batch stats
        g_vars = self._load_variables(
            self.g, init_z, os.path.join(ckpt, "g.msgpack"))
        if target:
            template = {"params": jax.device_get(g_vars["params"])}
            with smart_open(os.path.join(ckpt, "g_target.msgpack"),
                            "rb") as f:
                tvars = serialization.from_bytes(template, f.read())
            g_vars = {**g_vars, "params": tvars["params"]}
        self.g_vars = g_vars

        def generate(z):
            out, _ = self.g.apply(
                g_vars, z, train=True, mutable=["batch_stats"])
            return out

        self.generate = jax.jit(generate)
        return self.g

    def load_discriminator(self, info: bool = False):
        if not hasattr(self, "run_config"):
            self.load_run_config()
        ckpt = self.resolve_checkpoint_dir()
        self.d = self.build_discriminator(info=info)
        cfg = self.gan_config
        init_img = jnp.zeros(
            (1, cfg.max_size, cfg.max_size, cfg.data_dims), jnp.float32)
        self.d_vars = self._load_variables(
            self.d, init_img, os.path.join(ckpt, "d.msgpack"))

        def discriminate(x):
            out, _ = self.d.apply(
                self.d_vars, x, train=True, mutable=["batch_stats"])
            return out

        self.discriminate = jax.jit(discriminate)
        return self.d

    def sample_z(self, n, rng=None):
        """Normal or truncated-normal latents (explore/base.py:12-22)."""
        rng = rng or np.random.default_rng()
        dims = self.gan_config.latent_dims
        if self.args.trunc_norm is not None:
            from scipy.stats import truncnorm
            z = truncnorm.rvs(-self.args.trunc_norm, self.args.trunc_norm,
                              size=n * dims, random_state=rng)
            return jnp.asarray(z.reshape(n, dims), jnp.float32)
        return jnp.asarray(rng.standard_normal((n, dims)), jnp.float32)

    def save_image(self, img, filename, value_range=(-1, 1)):
        save_image(np.asarray(img, np.float32), filename,
                   value_range=value_range)

    @classmethod
    def add_args_to_parser(cls, p):
        super().add_args_to_parser(p)
        p.add_argument("checkpoint_root",
                       help="Path to a checkpoint step dir or run dir.")
        p.add_argument("output_prefix", help="Prefix for output files.")
        p.add_argument("--trunc-norm", type=float, default=None,
                       help="Sample from truncated normal distribution")
