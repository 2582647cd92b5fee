"""True per-step cost of the '128' b128 train step via k-sweep slopes.

Per-launch overhead of a chunked executable is ~57 ms on this relay
(probe_relay_costs.py), so timing one window conflates it with
execution. Slope method: time a k1-step chunk and a k2-step chunk of the
SAME step function; (t2 - t1) / (k2 - k1) cancels every fixed cost.

Also slopes G fwd / D fwd / G step / D step components.  Run alone.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enter_honest_mode  # noqa: E402


def chunk_time(step, state, batch, key, k, repeats=3):
    """Total ms for one launch of a k-step scan chunk (value-fenced)."""
    import jax
    import numpy as np
    out = step(state, batch, key)
    jax.block_until_ready(out[1]["g_loss"])
    float(np.ravel(np.asarray(out[1]["g_loss"]))[-1])
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = step(state, batch, key)
        jax.block_until_ready(out[1]["g_loss"])
        float(np.ravel(np.asarray(out[1]["g_loss"]))[-1])
        vals.append(time.perf_counter() - t0)
    vals.sort()
    return vals[len(vals) // 2] * 1e3


def main():
    enter_honest_mode()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tartangan_tpu.configs import GAN_CONFIGS
    from tartangan_tpu.models import factories as F
    from tartangan_tpu.models.pluggan import Discriminator, Generator
    from tartangan_tpu.train.cnn import make_cnn_train_step
    from tartangan_tpu.train.common import make_adam
    from tartangan_tpu.train.multi import chunk_train_step
    from tartangan_tpu.train.state import GANTrainState
    from benchmarks.probe_block_traffic import timed_scan

    results = {}
    cfg = GAN_CONFIGS["128"]
    dtype = jnp.bfloat16
    b = 128
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    g = Generator(cfg, input_factory=F.g_input_factory("mlp", "relu"),
                  block_factory=F.g_block_factory("bn", "relu"),
                  output_factory=F.g_output_factory("bn", "relu"),
                  dtype=dtype)
    d = Discriminator(cfg, block_factory=F.d_block_factory("bn", "relu"),
                      output_factory=F.d_output_factory("bn", "relu"),
                      dtype=dtype)
    g_vars = g.init(key, jnp.zeros((2, cfg.latent_dims)), train=True)
    d_vars = d.init(key, jnp.zeros((2, 128, 128, 3)), train=True)
    opt_g, opt_d = make_adam(1e-4), make_adam(4e-4)
    state = GANTrainState(
        g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
        target_g_params=jax.tree_util.tree_map(jnp.copy, g_vars["params"]),
        d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
        opt_g=opt_g.init(g_vars["params"]),
        opt_d=opt_d.init(d_vars["params"]),
    )
    base_step = make_cnn_train_step(
        g, d, opt_g, opt_d, latent_dims=cfg.latent_dims, grad_penalty=5.0,
        ema_factor=1e-3, dtype=dtype)
    batch = jax.device_put(rng.integers(
        0, 256, (b, 128, 128, 3), dtype=np.uint8))

    k1, k2 = 4, 16
    t_by_k = {}
    for k in (k1, k2):
        step_k = jax.jit(chunk_train_step(base_step, k, "broadcast"))
        t_by_k[k] = chunk_time(step_k, state, batch, key, k)
        results[f"chunk_k{k}_total_ms"] = round(t_by_k[k], 2)
    slope = (t_by_k[k2] - t_by_k[k1]) / (k2 - k1)
    results["step_ms_slope"] = round(slope, 3)
    results["img_s_slope"] = round(b / slope * 1e3, 1)
    results["fixed_ms"] = round(t_by_k[k1] - k1 * slope, 2)

    # component slopes (timed_scan: k=8 in-scan, subtract the id floor)
    id_floor = timed_scan(lambda a: a, jnp.ones((8, 128), jnp.bfloat16))
    results["id_floor_ms"] = round(id_floor, 3)

    z = jnp.asarray(rng.standard_normal((b, cfg.latent_dims)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, 128, 128, 3)), dtype)

    def g_fwd(z):
        out, _ = g.apply(g_vars, z, train=True, mutable=["batch_stats"])
        return out

    def d_fwd(x):
        out, _ = d.apply(d_vars, x, train=True, mutable=["batch_stats"])
        return out

    def g_fwd_bwd(z):
        def loss(p):
            out, _ = g.apply({**g_vars, "params": p}, z, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(jnp.square(out.astype(jnp.float32)))
        return jax.grad(loss)(g_vars["params"])["InputMLP_0"]["Dense_0"][
            "kernel"] if False else jax.tree_util.tree_leaves(
                jax.grad(loss)(g_vars["params"]))[0]

    def d_fwd_bwd(x):
        def loss(p):
            out, _ = d.apply({**d_vars, "params": p}, x, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(jnp.square(out.astype(jnp.float32)))
        return jax.tree_util.tree_leaves(jax.grad(loss)(d_vars["params"]))[0]

    for name, fn, arg in (("g_fwd", g_fwd, z), ("d_fwd", d_fwd, x),
                          ("g_fwd_bwd", g_fwd_bwd, z),
                          ("d_fwd_bwd", d_fwd_bwd, x)):
        t = timed_scan(fn, arg)
        results[f"{name}_ms"] = round(t - id_floor, 3)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
