"""Per-block forward cost of the '128' G/D towers (parity vs flax),
plus BN-only and normalize floors — locates where the compute-bound
step time actually goes. In-scan k=8, id-floor subtracted. Run alone.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enter_honest_mode  # noqa: E402


def main():
    enter_honest_mode()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from benchmarks.probe_block_traffic import timed_scan
    from tartangan_tpu.models.blocks import (
        ParityResidualDiscriminatorBlock,
        ParityResidualGeneratorBlock,
        ResidualDiscriminatorBlock,
        ResidualGeneratorBlock,
    )

    b = 128
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    results = {}

    id_floor = timed_scan(lambda a: a, jnp.ones((8, 128), jnp.bfloat16))
    results["id_floor_ms"] = round(id_floor, 3)
    print("floor", results["id_floor_ms"], flush=True)

    # G tower blocks of config '128': (in, out, in_res)
    g_blocks = [(128, 128, 4), (128, 128, 8), (128, 64, 16),
                (64, 32, 32), (32, 16, 64)]
    for cin, cout, res in g_blocks:
        x = jnp.asarray(rng.standard_normal((b, res, res, cin)), dtype)
        for tag, cls in (("flax", ResidualGeneratorBlock),
                         ("parity", ParityResidualGeneratorBlock)):
            if tag == "parity" and cout > 64:
                continue
            blk = cls(cin, cout, dtype=dtype)
            v = blk.init(jax.random.PRNGKey(0), x, train=True)

            def fwd(x, blk=blk, v=v):
                out, _ = blk.apply(v, x, train=True,
                                   mutable=["batch_stats"])
                return out

            t = timed_scan(fwd, x) - id_floor
            key = f"g_{cin}to{cout}@{res}_{tag}_ms"
            results[key] = round(t, 3)
            print(key, results[key], flush=True)

    # D tower blocks (reverse): (in, out, in_res)
    d_blocks = [(16, 32, 128), (32, 64, 64), (64, 128, 32)]
    for cin, cout, res in d_blocks:
        x = jnp.asarray(rng.standard_normal((b, res, res, cin)), dtype)
        for tag, cls in (("flax", ResidualDiscriminatorBlock),
                         ("parity", ParityResidualDiscriminatorBlock)):
            if tag == "parity" and cout > 64:
                continue
            blk = cls(cin, cout, dtype=dtype)
            v = blk.init(jax.random.PRNGKey(0), x, train=True)

            def fwd(x, blk=blk, v=v):
                out, _ = blk.apply(v, x, train=True,
                                   mutable=["batch_stats"])
                return out

            t = timed_scan(fwd, x) - id_floor
            key = f"d_{cin}to{cout}@{res}_{tag}_ms"
            results[key] = round(t, 3)
            print(key, results[key], flush=True)

    # elementwise floors at the hot tensor size
    x16 = jnp.asarray(rng.standard_normal((b, 128, 128, 16)), dtype)

    def bn_act(x):
        x32 = x.astype(jnp.float32)
        m = jnp.mean(x32, axis=(0, 1, 2))
        v = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(m)
        h = (x32 - m) * jax.lax.rsqrt(v + 1e-5)
        return jnp.where(h >= 0, h, 0.2 * h).astype(x.dtype)

    results["bn_act_128px16c_ms"] = round(timed_scan(bn_act, x16) - id_floor,
                                          3)
    u8 = jax.device_put(rng.integers(0, 256, (b, 128, 128, 3),
                                     dtype=np.uint8))
    results["normalize_u8_ms"] = round(
        timed_scan(lambda a: (a.astype(jnp.float32) / 127.5 - 1.0).astype(
            dtype), u8) - id_floor, 3)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
