"""Per-block cost of the '128' G/D towers (parity vs flax), forward AND
forward+backward, plus BN-only and normalize floors — locates where the
compute-bound step time actually goes and what rate each block runs at.

Timing: in-scan slope between k=8 and k=64 of the same executable (the
delta cancels the relay's fixed launch+fence cost AND sharpens sub-ms
blocks that a k=8 floor subtraction cannot resolve). Run alone:
``python benchmarks/probe_block_costs.py [--fwd-only]``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enter_honest_mode  # noqa: E402


def slope_ms(fn, arg, k_lo=8):
    """ms/iter by k-sweep slope of ``timed_scan``'s chunk totals.

    The relay's fixed launch+fence cost drifts ~±10 ms between separate
    timing windows, so the k_hi window must hold >=~400 ms of real work
    for the slope to resolve sub-ms bodies: a k=64 pilot estimates the
    per-iter cost, then k_hi is scaled to target that window size."""
    from benchmarks.probe_block_traffic import timed_scan
    pilot = timed_scan(fn, arg, k=64)  # ~t + floor/64: upper bound on t
    est = max(pilot, 0.01)
    k_hi = int(min(16384, max(256, 400.0 / est)))
    t_lo = timed_scan(fn, arg, k=k_lo) * k_lo
    t_hi = timed_scan(fn, arg, k=k_hi) * k_hi
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--config", default="128", choices=("128", "256"),
                   help="which config's tower shapes to decompose "
                        "('256' uses the bench's b64)")
    args = p.parse_args()

    enter_honest_mode()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tartangan_tpu.models.blocks import (
        ParityResidualDiscriminatorBlock,
        ParityResidualGeneratorBlock,
        ResidualDiscriminatorBlock,
        ResidualGeneratorBlock,
    )

    b = 128 if args.config == "128" else 64
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = {}

    def measure(cls, tag, side, cin, cout, res):
        x = jnp.asarray(rng.standard_normal((b, res, res, cin)), dtype)
        blk = cls(cin, cout, dtype=dtype)
        v = blk.init(jax.random.PRNGKey(0), x, train=True)

        def fwd(x, blk=blk, v=v):
            out, _ = blk.apply(v, x, train=True, mutable=["batch_stats"])
            return out

        key = f"{side}_{cin}to{cout}@{res}_{tag}"
        results[key + "_fwd_ms"] = round(slope_ms(fwd, x), 3)
        print(key + "_fwd", results[key + "_fwd_ms"], flush=True)
        if args.fwd_only:
            return

        def fwdbwd(x, blk=blk, v=v):
            # grad over params AND input, matching a training traversal
            # (dropping the params grad would let XLA dead-code the
            # weight-gradient contractions, halving the backward)
            def loss(params, x):
                out, _ = blk.apply({**v, "params": params}, x, train=True,
                                   mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))
            gp, gx = jax.grad(loss, argnums=(0, 1))(v["params"], x)
            return gx + jnp.float32(1e-20) * jnp.sum(
                jax.tree_util.tree_leaves(gp)[0]).astype(gx.dtype)

        results[key + "_fwdbwd_ms"] = round(slope_ms(fwdbwd, x), 3)
        print(key + "_fwdbwd", results[key + "_fwdbwd_ms"], flush=True)

    # G tower blocks: (in, out, in_res)
    if args.config == "128":
        g_blocks = [(128, 128, 4), (128, 128, 8), (128, 64, 16),
                    (64, 32, 32), (32, 16, 64)]
        d_blocks = [(16, 32, 128), (32, 64, 64), (64, 128, 32)]
        floor_res = 128
    else:  # '256': blocks (256, 256, 128, 64, 32, 16), base 4
        g_blocks = [(256, 256, 4), (256, 256, 8), (256, 128, 16),
                    (128, 64, 32), (64, 32, 64), (32, 16, 128)]
        d_blocks = [(16, 32, 256), (32, 64, 128), (64, 128, 64),
                    (128, 256, 32), (256, 256, 16), (256, 256, 8)]
        floor_res = 256
    # parity variants are measured at EVERY width, including the wide
    # (out_dims > PARITY_MAX_DIMS) blocks the production gate currently
    # excludes — the same capture that locates the step's time also
    # answers whether the gate should widen (VERDICT r4 next #1)
    for cin, cout, res in g_blocks:
        for tag, cls in (("flax", ResidualGeneratorBlock),
                         ("parity", ParityResidualGeneratorBlock)):
            measure(cls, tag, "g", cin, cout, res)

    # D tower blocks (reverse): (in, out, in_res)
    for cin, cout, res in d_blocks:
        for tag, cls in (("flax", ResidualDiscriminatorBlock),
                         ("parity", ParityResidualDiscriminatorBlock)):
            measure(cls, tag, "d", cin, cout, res)

    # elementwise floors at the hot tensor size
    x16 = jnp.asarray(rng.standard_normal((b, floor_res, floor_res, 16)),
                      dtype)

    def bn_act(x):
        x32 = x.astype(jnp.float32)
        m = jnp.mean(x32, axis=(0, 1, 2))
        v = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(m)
        h = (x32 - m) * jax.lax.rsqrt(v + 1e-5)
        return jnp.where(h >= 0, h, 0.2 * h).astype(x.dtype)

    results[f"bn_act_{floor_res}px16c_ms"] = round(slope_ms(bn_act, x16), 3)
    u8 = jax.device_put(rng.integers(0, 256, (b, floor_res, floor_res, 3),
                                     dtype=np.uint8))
    results["normalize_u8_ms"] = round(
        slope_ms(lambda a: (a.astype(jnp.float32) / 127.5 - 1.0).astype(
            dtype), u8), 3)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
