"""Headline benchmark: images/sec of config-'128' SA-GAN training.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against the measured PyTorch-reference throughput
for the identical workload (BASELINE.md: the reference publishes no numbers,
so the baseline must be measured). ``python bench_baseline.py`` measures the
torch reference loop on this host and writes BASELINE_MEASURED.json; if that
file is absent we fall back to a conservative stored measurement.
"""
from __future__ import annotations

import json
import os
import time


def measure_tpu(config="128", batch_size=128, steps=20, warmup=3):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tartangan_tpu.configs import GAN_CONFIGS
    from tartangan_tpu.models import factories as F
    from tartangan_tpu.models.pluggan import Discriminator, Generator
    from tartangan_tpu.train.cnn import make_cnn_train_step
    from tartangan_tpu.train.common import make_adam
    from tartangan_tpu.train.state import GANTrainState

    cfg = GAN_CONFIGS[config]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    g = Generator(
        cfg,
        input_factory=F.g_input_factory("mlp", "relu"),
        block_factory=F.g_block_factory("bn", "relu"),
        output_factory=F.g_output_factory("bn", "relu"),
        dtype=dtype,
    )
    d = Discriminator(
        cfg,
        block_factory=F.d_block_factory("bn", "relu"),
        output_factory=F.d_output_factory("bn", "relu"),
        dtype=dtype,
    )
    key = jax.random.PRNGKey(0)
    z0 = jnp.zeros((2, cfg.latent_dims), jnp.float32)
    img0 = jnp.zeros((2, cfg.max_size, cfg.max_size, cfg.data_dims))
    g_vars = g.init(key, z0, train=True)
    d_vars = d.init(key, img0, train=True)
    opt_g, opt_d = make_adam(1e-4), make_adam(4e-4)

    state = GANTrainState(
        g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
        target_g_params=g_vars["params"],
        d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
        opt_g=opt_g.init(g_vars["params"]),
        opt_d=opt_d.init(d_vars["params"]),
    )
    step = jax.jit(make_cnn_train_step(
        g, d, opt_g, opt_d,
        latent_dims=cfg.latent_dims, grad_penalty=5.0,
        ema_factor=1e-3, dtype=dtype,
    ), donate_argnums=(0,))

    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.integers(
        0, 256, (batch_size, cfg.max_size, cfg.max_size, 3), dtype=np.uint8))
    keys = [jax.random.PRNGKey(i) for i in range(steps + warmup)]

    for i in range(warmup):
        state, metrics = step(state, batch, keys[i])
    jax.block_until_ready(metrics["g_loss"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step(state, batch, keys[warmup + i])
    jax.block_until_ready(metrics["g_loss"])
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def load_baseline():
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)["images_per_sec"]
    return None


def main():
    value = measure_tpu()
    baseline = load_baseline()
    vs = (value / baseline) if baseline else None
    print(json.dumps({
        "metric": "images_per_sec_128px_sagan_train",
        "value": round(value, 2),
        "unit": "img/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
    }))


if __name__ == "__main__":
    main()
