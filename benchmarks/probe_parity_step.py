"""Honest full-train-step cost by block variant: flax baseline vs
parity 3x3-packed vs merged-tap 2x2 vs the round-5 fused-G Pallas
kernel, at '128' b128 (default) or '256' b64 (--config 256).

One k=8 chunk per variant; the fixed ~57-61 ms relay launch cost is
subtracted via the identity-scan floor (probe_step_decomp.py method).
Run alone (no other interpreter).
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enter_honest_mode  # noqa: E402
from benchmarks.probe_step_slope import chunk_time  # noqa: E402


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="128", choices=("128", "256"))
    ap.add_argument("--variants", default=None,
                    help="comma list to subset (e.g. "
                         "'parity_gd_3x3,parity_gd_fusedG')")
    args = ap.parse_args()

    enter_honest_mode()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.probe_block_traffic import timed_scan
    from tartangan_tpu.configs import GAN_CONFIGS
    from tartangan_tpu.models import factories as F
    from tartangan_tpu.models.pluggan import Discriminator, Generator
    from tartangan_tpu.train.cnn import make_cnn_train_step
    from tartangan_tpu.train.common import make_adam
    from tartangan_tpu.train.multi import chunk_train_step
    from tartangan_tpu.train.state import GANTrainState

    results = {}
    cfg = GAN_CONFIGS[args.config]
    dtype = jnp.bfloat16
    b = 128 if args.config == "128" else 64
    size = cfg.max_size
    k = 8
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    batch = jax.device_put(rng.integers(
        0, 256, (b, size, size, 3), dtype=np.uint8))

    floor = timed_scan(lambda a: a, jnp.ones((8, 128), jnp.bfloat16)) * 8
    results["launch_floor_ms"] = round(floor, 1)
    print("floor", results["launch_floor_ms"], flush=True)

    from tartangan_tpu.ops import parity as P

    # (G parity, D parity, MERGED_TAP, FUSED_G): the fusedG variant is
    # the round-5 Pallas merged-tap kernel with in-kernel realignment on
    # the G-side parity convs (VERDICT r4 next #3) — D stays on the 3x3
    # packed form either way (R1 second-order gradient).
    variants = {
        "baseline": (False, False, True, False),
        "parity_gd_3x3": (True, True, False, False),
        "parity_gd_2x2": (True, True, True, False),
        "parity_gd_fusedG": (True, True, False, True),
    }
    if args.variants:
        keep = set(args.variants.split(","))
        variants = {n: v for n, v in variants.items() if n in keep}
    for name, (gpar, dpar, merged, fused_g) in variants.items():
        P.MERGED_TAP = merged
        P.FUSED_G = fused_g
        g = Generator(cfg, input_factory=F.g_input_factory("mlp", "relu"),
                      block_factory=F.g_block_factory("bn", "relu",
                                                      parity=gpar),
                      output_factory=F.g_output_factory("bn", "relu"),
                      dtype=dtype)
        d = Discriminator(
            cfg,
            block_factory=F.d_block_factory("bn", "relu", parity=dpar),
            output_factory=F.d_output_factory("bn", "relu"),
            dtype=dtype)
        g_vars = g.init(key, jnp.zeros((2, cfg.latent_dims)), train=True)
        d_vars = d.init(key, jnp.zeros((2, size, size, 3)), train=True)
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
        step_fn = make_cnn_train_step(
            g, d, opt_g, opt_d, latent_dims=cfg.latent_dims,
            ema_factor=1e-3, dtype=dtype, grad_penalty=5.0, iters_d=1)
        total = chunk_time(jax.jit(chunk_train_step(step_fn, k, "broadcast")),
                           state, batch, key, k)
        ms = (total - floor) / k
        results[name] = {
            "step_ms": round(ms, 2),
            "img_s": round(b / ms * 1e3, 1),
        }
        print(name, results[name], flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
