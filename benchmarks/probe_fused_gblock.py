"""Honest-mode TPU timing: fused Pallas generator block vs the flax block.

Measures (value-fenced, in-scan):
  1. one 64->128px tower block forward, flax vs fused kernels
  2. the full config-'128' G forward, flax vs --fused-blocks factory
  3. the full config-'128' b128 train step, flax vs --fused-blocks

Run alone: python benchmarks/probe_fused_gblock.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enter_honest_mode  # noqa: E402
from benchmarks.probe_block_traffic import timed_scan  # noqa: E402


def main():
    enter_honest_mode()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tartangan_tpu.configs import GAN_CONFIGS
    from tartangan_tpu.models import factories as F
    from tartangan_tpu.models.blocks import (
        FusedResidualGeneratorBlock,
        ResidualGeneratorBlock,
    )
    from tartangan_tpu.models.pluggan import Generator

    results = {}
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    b = 128
    key = jax.random.PRNGKey(0)

    # --- 1. single 64->128 block
    x_gb = jnp.asarray(rng.standard_normal((b, 64, 64, 32)), dtype)
    flax_b = ResidualGeneratorBlock(32, 16, dtype=dtype)
    flax_vars = flax_b.init(key, x_gb, train=True)
    fused_b = FusedResidualGeneratorBlock(32, 16, dtype=dtype)
    fused_vars = fused_b.init(key, x_gb, train=True)

    def flax_fwd(x):
        out, _ = flax_b.apply(flax_vars, x, train=True,
                              mutable=["batch_stats"])
        return out

    def fused_fwd(x):
        out, _ = fused_b.apply(fused_vars, x, train=True,
                               mutable=["batch_stats"])
        return out

    results["block_flax_fwd_ms"] = timed_scan(flax_fwd, x_gb)
    results["block_fused_fwd_ms"] = timed_scan(fused_fwd, x_gb)

    def flax_fwd_bwd(x):
        def loss(p):
            out, _ = flax_b.apply(
                {**flax_vars, "params": p}, x, train=True,
                mutable=["batch_stats"])
            return jnp.sum(jnp.square(out.astype(jnp.float32)))
        g = jax.grad(loss)(flax_vars["params"])
        return g["Conv_0"]["kernel"]

    def fused_fwd_bwd(x):
        def loss(p):
            out, _ = fused_b.apply(
                {**fused_vars, "params": p}, x, train=True,
                mutable=["batch_stats"])
            return jnp.sum(jnp.square(out.astype(jnp.float32)))
        g = jax.grad(loss)(fused_vars["params"])
        return g["conv1_kernel"]

    results["block_flax_fwd_bwd_ms"] = timed_scan(flax_fwd_bwd, x_gb)
    results["block_fused_fwd_bwd_ms"] = timed_scan(fused_fwd_bwd, x_gb)

    # --- 2. full G forward
    cfg = GAN_CONFIGS["128"]
    z = jnp.asarray(rng.standard_normal((b, cfg.latent_dims)), jnp.float32)
    for tag, fused in (("flax", False), ("fused", True)):
        g = Generator(
            cfg,
            input_factory=F.g_input_factory("mlp", "relu"),
            block_factory=F.g_block_factory("bn", "relu", fused=fused),
            output_factory=F.g_output_factory("bn", "relu"),
            dtype=dtype,
        )
        g_vars = g.init(key, jnp.zeros((2, cfg.latent_dims)), train=True)

        def g_fwd(z, g=g, g_vars=g_vars):
            out, _ = g.apply(g_vars, z, train=True,
                             mutable=["batch_stats"])
            return out

        results[f"g_fwd_{tag}_ms"] = timed_scan(g_fwd, z)

    # --- 3. full train step (sanity parity + timing)
    from tartangan_tpu.models.pluggan import Discriminator
    from tartangan_tpu.train.cnn import make_cnn_train_step
    from tartangan_tpu.train.common import make_adam
    from tartangan_tpu.train.state import GANTrainState
    import time

    batch = rng.integers(0, 256, (b, 128, 128, 3), dtype=np.uint8)
    batch = jax.device_put(batch)
    for tag, fused in (("flax", False), ("fused", True)):
        g = Generator(
            cfg,
            input_factory=F.g_input_factory("mlp", "relu"),
            block_factory=F.g_block_factory("bn", "relu", fused=fused),
            output_factory=F.g_output_factory("bn", "relu"),
            dtype=dtype,
        )
        d = Discriminator(
            cfg,
            block_factory=F.d_block_factory("bn", "relu"),
            output_factory=F.d_output_factory("bn", "relu"),
            dtype=dtype,
        )
        g_vars = g.init(key, jnp.zeros((2, cfg.latent_dims)), train=True)
        d_vars = d.init(key, jnp.zeros((2, 128, 128, 3)), train=True)
        opt_g, opt_d = make_adam(1e-4), make_adam(4e-4)
        state = GANTrainState(
            g_params=g_vars["params"],
            g_stats=g_vars.get("batch_stats", {}),
            target_g_params=jax.tree_util.tree_map(
                jnp.copy, g_vars["params"]),
            d_params=d_vars["params"],
            d_stats=d_vars.get("batch_stats", {}),
            opt_g=opt_g.init(g_vars["params"]),
            opt_d=opt_d.init(d_vars["params"]),
        )
        step = jax.jit(make_cnn_train_step(
            g, d, opt_g, opt_d, latent_dims=cfg.latent_dims,
            grad_penalty=5.0, ema_factor=1e-3, dtype=dtype),
            donate_argnums=(0,))
        keys = [jax.random.PRNGKey(i) for i in range(40)]
        for i in range(4):
            state, m = step(state, batch, keys[i])
        jax.block_until_ready(m["g_loss"])
        float(np.ravel(np.asarray(m["g_loss"]))[-1])
        t0 = time.perf_counter()
        for i in range(4, 28):
            state, m = step(state, batch, keys[i])
        jax.block_until_ready(m["g_loss"])
        float(np.ravel(np.asarray(m["g_loss"]))[-1])
        dt = (time.perf_counter() - t0) / 24
        results[f"step_{tag}_ms"] = dt * 1e3
        results[f"step_{tag}_img_s"] = b / dt
        results[f"step_{tag}_gloss"] = float(
            np.ravel(np.asarray(m["g_loss"]))[-1])

    print(json.dumps({k: round(v, 3) for k, v in results.items()},
                     indent=1))


if __name__ == "__main__":
    main()
