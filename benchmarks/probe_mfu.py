"""Exact per-step FLOPs + MFU accounting (VERDICT r3 weak #3 / next #2).

Round 3 claimed the '128' step is "compute/occupancy-bound" without a
FLOPs denominator. This probe publishes the arithmetic:

1. XLA's own cost model for ONE fused train step —
   ``jax.jit(step).lower(...).compile().cost_analysis()['flops']`` —
   for the bench workloads ('128' b128 under each block variant, IQN@64,
   256, 512thin).
2. The honest ms/step (k-sweep slope between K=8 and K=32 chunks of the
   same executable — the difference cancels the relay's ~60-67 ms fixed
   launch+fence cost AND any residual per-dispatch overhead).
3. achieved TFLOP/s = flops / ms, MFU vs the measured ~190 TFLOP/s
   dense peak and vs the v5e spec-sheet ~197 TFLOP/s bf16.
4. A dense-matmul shape/dtype sweep that bounds the chip's real matmul
   peak. ANSWERED 2026-08-18: 4096^3/8192^3/16384^3 bf16 reach
   180-191 TFLOP/s (~96% of spec) — round 2/3's "112 TFLOP/s measured
   peak" was a measurement-shape artifact (4096^3 with a k-delta too
   small for the relay's fixed-cost jitter), now retracted in
   docs/PERF.md.

Run on the TPU: ``python benchmarks/probe_mfu.py [--skip-sweep]``.
CPU smoke: ``--backend cpu --configs 8`` (numbers meaningless, wiring
checked in tests).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(config, batch_size, workload="cnn", parity="auto",
               remat=False, remat_policy="full"):
    """One fused train step + example args (mirrors bench.measure_step)."""
    import jax
    import jax.numpy as jnp

    from tartangan_tpu.configs import GAN_CONFIGS
    from tartangan_tpu.models import factories as F
    from tartangan_tpu.models.pluggan import (
        Discriminator,
        Generator,
        IQNDiscriminator,
    )
    from tartangan_tpu.train.cnn import make_cnn_train_step
    from tartangan_tpu.train.common import make_adam
    from tartangan_tpu.train.state import GANTrainState

    cfg = GAN_CONFIGS[config]
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    par = F.resolve_parity(parity)
    g = Generator(
        cfg,
        input_factory=F.g_input_factory("mlp", "relu"),
        block_factory=F.g_block_factory(
            "bn", "relu", parity=par, remat=remat,
            remat_policy_name=remat_policy),
        output_factory=F.g_output_factory("bn", "relu"),
        dtype=dtype,
    )
    key = jax.random.PRNGKey(0)
    z0 = jnp.zeros((2, cfg.latent_dims), jnp.float32)
    img0 = jnp.zeros((2, cfg.max_size, cfg.max_size, cfg.data_dims))
    g_vars = g.init(key, z0, train=True)
    opt_g, opt_d = make_adam(1e-4), make_adam(4e-4)
    if workload == "iqn":
        from tartangan_tpu.train.iqn import make_iqn_train_step
        d = IQNDiscriminator(
            cfg,
            block_factory=F.d_block_factory(
                "bn", "relu", parity=par, remat=remat,
                remat_policy_name=remat_policy),
            output_factory=F.iqn_d_output_factory("bn", "relu"),
            dtype=dtype,
        )
        d_vars = d.init({"params": key, "iqn": key}, img0, train=True,
                        targets=jnp.ones((2, 1), jnp.float32))
        make = make_iqn_train_step
    else:
        d = Discriminator(
            cfg,
            block_factory=F.d_block_factory(
                "bn", "relu", parity=par, remat=remat,
                remat_policy_name=remat_policy),
            output_factory=F.d_output_factory("bn", "relu"),
            dtype=dtype,
        )
        d_vars = d.init(key, img0, train=True)
        make = make_cnn_train_step
    state = GANTrainState(
        g_params=g_vars["params"], g_stats=g_vars.get("batch_stats", {}),
        target_g_params=jax.tree_util.tree_map(jnp.copy, g_vars["params"]),
        d_params=d_vars["params"], d_stats=d_vars.get("batch_stats", {}),
        opt_g=opt_g.init(g_vars["params"]),
        opt_d=opt_d.init(d_vars["params"]),
    )
    step = make(g, d, opt_g, opt_d, latent_dims=cfg.latent_dims,
                grad_penalty=5.0, ema_factor=1e-3, dtype=dtype)
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (batch_size, cfg.max_size, cfg.max_size, 3),
                         dtype=np.uint8)
    return step, state, batch


def step_cost(config, batch_size, **kw):
    """XLA cost_analysis for ONE fused step: (flops, bytes accessed)."""
    import jax
    step, state, batch = build_step(config, batch_size, **kw)
    compiled = jax.jit(step).lower(
        state, batch, jax.random.PRNGKey(0)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca.get("flops", float("nan"))), float(
        ca.get("bytes accessed", float("nan")))


def honest_ms_per_step(config, batch_size, k_lo=8, k_hi=32, reps=3, **kw):
    """Slope-method ms/step: (t(K=hi) - t(K=lo)) / (hi - lo) cancels every
    fixed per-dispatch cost (docs/PERF.md round-3 chip model)."""
    import jax

    from tartangan_tpu.train.multi import chunk_train_step
    step, state, batch = build_step(config, batch_size, **kw)

    def timed_chunk(k, state):
        chunk = jax.jit(chunk_train_step(step, k, "broadcast"),
                        donate_argnums=(0,))
        dbatch = jax.device_put(batch)
        state, m = chunk(state, dbatch, jax.random.PRNGKey(0))  # compile
        jax.block_until_ready(m["g_loss"])
        float(np.ravel(np.asarray(m["g_loss"]))[-1])
        ts = []
        for r in range(reps):
            t0 = time.perf_counter()
            state, m = chunk(state, dbatch, jax.random.PRNGKey(r + 1))
            jax.block_until_ready(m["g_loss"])
            float(np.ravel(np.asarray(m["g_loss"]))[-1])
            ts.append(time.perf_counter() - t0)
        return min(ts), state

    t_lo, state = timed_chunk(k_lo, state)
    t_hi, _ = timed_chunk(k_hi, state)
    return (t_hi - t_lo) * 1000.0 / (k_hi - k_lo)


def matmul_peak_sweep():
    """Dense matmul TFLOP/s by shape and dtype (in-scan, slope-timed):
    bounds the chip's reachable peak independent of the GAN step."""
    import jax
    import jax.numpy as jnp
    rows = []
    for dtype, n in (("bfloat16", 2048), ("bfloat16", 4096),
                     ("bfloat16", 8192), ("bfloat16", 16384),
                     ("float32", 4096)):
        dt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        a = jnp.asarray(np.random.default_rng(0).standard_normal((n, n)),
                        dt)

        scale = float(1.0 / np.sqrt(n))  # python float: weak-typed, keeps bf16

        def chain(a, k):
            def body(x, _):
                y = ((x @ a) * scale).astype(x.dtype)
                return y, ()
            return jax.lax.scan(body, a, None, length=k)[0]

        def timed(k):
            f = jax.jit(chain, static_argnums=(1,))
            out = f(a, k)
            jax.block_until_ready(out)
            float(out[0, 0])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(a, k)
                jax.block_until_ready(out)
                float(out[0, 0])
                ts.append(time.perf_counter() - t0)
            return min(ts)

        # Scale the k-sweep so the k_hi - k_lo delta is >= ~2.5e12 FLOPs
        # (>= ~15 ms of matmul work): smaller deltas drown in the relay's
        # fixed-cost jitter and produce nonsense slopes (a 4096^3 run with
        # k 8->32 once read 667 TFLOP/s).
        dk = max(24, int(np.ceil(5e12 / (2 * n ** 3))))
        k_lo = 8
        t_lo, t_hi = timed(k_lo), timed(k_lo + dk)
        per_mm = (t_hi - t_lo) / dk
        tflops = 2 * n ** 3 / per_mm / 1e12
        rows.append((dtype, n, per_mm * 1e3, tflops))
        print(f"  {dtype:9s} {n:5d}^3 (dk={dk}): {per_mm*1e3:8.3f} "
              f"ms/matmul = {tflops:7.1f} TFLOP/s", flush=True)
    return rows


WORKLOADS = {
    "128_b128_parity": dict(config="128", batch_size=128, parity="on"),
    "128_b128_flax": dict(config="128", batch_size=128, parity="off"),
    "iqn_64_b128": dict(config="64", batch_size=128, workload="iqn"),
    "256_b64": dict(config="256", batch_size=64),
    "512thin_b64": dict(config="512thin", batch_size=64),
    "512thin_b64_remat": dict(config="512thin", batch_size=64, remat=True),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default=None,
                   help="cpu forces the CPU backend (wiring smoke only)")
    p.add_argument("--configs", default=None,
                   help="comma list of WORKLOADS keys (or a config name "
                        "for a one-off)")
    p.add_argument("--skip-sweep", action="store_true")
    p.add_argument("--sweep-only", action="store_true",
                   help="run just the dense-matmul peak sweep")
    p.add_argument("--skip-timing", action="store_true",
                   help="cost_analysis only (no device timing)")
    args = p.parse_args()
    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)

    if jax.default_backend() == "tpu" and not args.skip_timing:
        import bench
        bench.enter_honest_mode()

    names = ([] if args.sweep_only
             else args.configs.split(",") if args.configs
             else list(WORKLOADS))
    print("workload, flops/step, GB touched, honest ms/step, "
          "achieved TFLOP/s, MFU vs 190 measured peak, MFU vs 197 spec")
    for name in names:
        kw = WORKLOADS.get(name, dict(config=name, batch_size=8))
        flops, byts = step_cost(**kw)
        if args.skip_timing:
            print(f"{name}: {flops:.3e} flops, {byts/1e9:.2f} GB")
            continue
        ms = honest_ms_per_step(**kw)
        tf = flops / (ms / 1e3) / 1e12
        print(f"{name}: {flops:.3e} flops, {byts/1e9:.2f} GB, "
              f"{ms:.2f} ms, {tf:.1f} TFLOP/s, "
              f"MFU {100*tf/190:.1f}% / {100*tf/197:.1f}%")

    if not args.skip_sweep and jax.default_backend() == "tpu":
        print("dense matmul peak sweep:")
        matmul_peak_sweep()


if __name__ == "__main__":
    main()
