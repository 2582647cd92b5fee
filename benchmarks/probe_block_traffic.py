"""Honest-mode breakdown of the '128' b128 train step by component.

Times (value-fenced, in-scan amortized) the pieces whose HBM traffic the
roofline says dominate, to target the Pallas block-fusion work
(VERDICT r2 #1):

  - G forward alone, D forward alone
  - G step (G fwd+bwd+adam, frozen D), D step (with and without R1)
  - the last ResidualGeneratorBlock (128px, 32->16) fwd and fwd+bwd
  - the first ResidualDiscriminatorBlock (128px, 16->32) fwd and fwd+bwd

Each is measured as a K-step lax.scan chunk to amortize dispatch overhead.
Run alone: python benchmarks/probe_block_traffic.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enter_honest_mode  # noqa: E402


def timed_scan(fn, arg, k=8, repeats=3):
    """Median ms/iter of single-arg ``fn`` folded into a K-iter lax.scan,
    value-fenced. The iterate feeds the next iteration's input through a
    negligible (1e-20-scaled) perturbation so XLA can neither hoist the
    loop-invariant call out of the scan nor dead-code it."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    def chunk(arg):
        def body(carry, _):
            a, acc = carry
            out = fn(a)
            s = jnp.sum(
                jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
            a = a + (s * jnp.float32(1e-20)).astype(a.dtype)
            return (a, acc + s), None
        (_, acc), _ = jax.lax.scan(
            body, (arg, jnp.float32(0)), None, length=k)
        return acc

    jfn = jax.jit(chunk)
    out = jfn(arg)
    jax.block_until_ready(out)
    float(np.asarray(out))
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = jfn(arg)
        jax.block_until_ready(out)
        float(np.asarray(out))
        vals.append((time.perf_counter() - t0) / k * 1e3)
    vals.sort()
    return vals[len(vals) // 2]


def main():
    enter_honest_mode()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tartangan_tpu.configs import GAN_CONFIGS
    from tartangan_tpu.models import factories as F
    from tartangan_tpu.models.blocks import (
        ResidualDiscriminatorBlock,
        ResidualGeneratorBlock,
    )
    from tartangan_tpu.models.pluggan import Discriminator, Generator

    cfg = GAN_CONFIGS["128"]
    b = 128
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = {}

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
    img0 = jnp.zeros((2, cfg.max_size, cfg.max_size, 3))
    g_vars = g.init(key, z0, train=True)
    d_vars = d.init(key, img0, train=True)

    z = jnp.asarray(rng.standard_normal((b, cfg.latent_dims)), jnp.float32)
    imgs = jnp.asarray(
        rng.standard_normal((b, cfg.max_size, cfg.max_size, 3)), dtype)

    def g_fwd(z):
        out, _ = g.apply(g_vars, z, train=True, mutable=["batch_stats"])
        return out

    def d_fwd(x):
        out, _ = d.apply(d_vars, x, train=True, mutable=["batch_stats"])
        return out

    results["g_fwd_ms"] = timed_scan(g_fwd, z)
    results["d_fwd_ms"] = timed_scan(d_fwd, imgs)

    def g_fwd_bwd(z):
        def loss(params):
            out, _ = g.apply({**g_vars, "params": params}, z, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(g_vars["params"])["blocks_0"]["Conv_0"]["bias"]

    def d_fwd_bwd(x):
        def loss(params):
            out, _ = d.apply({**d_vars, "params": params}, x, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(d_vars["params"])["blocks_0"]["Conv_0"]["bias"]

    def d_r1(x):
        def dsum(xx):
            out, _ = d.apply(d_vars, xx, train=True,
                             mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        gx = jax.grad(dsum)(x)
        return jnp.sum(jnp.square(gx.astype(jnp.float32)))

    def d_r1_bwd(x):
        """Full R1 term backward wrt params: grad-of-grad-of-grad path as
        it appears in the real D loss."""
        def loss(params):
            def dsum(xx):
                out, _ = d.apply({**d_vars, "params": params}, xx,
                                 train=True, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))
            gx = jax.grad(dsum)(x)
            return jnp.mean(jnp.sum(jnp.square(
                gx.astype(jnp.float32)).reshape(x.shape[0], -1), axis=1))
        return jax.grad(loss)(d_vars["params"])["blocks_0"]["Conv_0"]["bias"]

    results["g_fwd_bwd_ms"] = timed_scan(g_fwd_bwd, z)
    results["d_fwd_bwd_ms"] = timed_scan(d_fwd_bwd, imgs)
    results["d_r1_fwd_ms"] = timed_scan(d_r1, imgs)
    results["d_r1_bwd_ms"] = timed_scan(d_r1_bwd, imgs)

    # single blocks at the top resolution (the traffic peak)
    gb = ResidualGeneratorBlock(32, 16, dtype=dtype)
    x_gb = jnp.asarray(rng.standard_normal((b, 64, 64, 32)), dtype)
    gb_vars = gb.init(key, x_gb, train=True)

    def gb_fwd(x):
        out, _ = gb.apply(gb_vars, x, train=True, mutable=["batch_stats"])
        return out

    def gb_fwd_bwd(x):
        def loss(params):
            out, _ = gb.apply({**gb_vars, "params": params}, x, train=True,
                              mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(gb_vars["params"])["Conv_0"]["bias"]

    results["gblock_64to128_fwd_ms"] = timed_scan(gb_fwd, x_gb)
    results["gblock_64to128_fwd_bwd_ms"] = timed_scan(gb_fwd_bwd, x_gb)

    db = ResidualDiscriminatorBlock(16, 32, dtype=dtype)
    x_db = jnp.asarray(rng.standard_normal((b, 128, 128, 16)), dtype)
    db_vars = db.init(key, x_db, train=True)

    def db_fwd(x):
        out, _ = db.apply(db_vars, x, train=True, mutable=["batch_stats"])
        return out

    def db_fwd_bwd(x):
        def loss(params):
            out, _ = db.apply({**db_vars, "params": params}, x, train=True,
                              mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(db_vars["params"])["Conv_0"]["bias"]

    results["dblock_128to64_fwd_ms"] = timed_scan(db_fwd, x_db)
    results["dblock_128to64_fwd_bwd_ms"] = timed_scan(db_fwd_bwd, x_db)

    print(json.dumps({k: round(v, 3) for k, v in results.items()},
                     indent=1))


if __name__ == "__main__":
    main()
