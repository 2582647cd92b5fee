"""Map effective HBM bandwidth vs workload size + isolate scan-harness
cost. Run alone."""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enter_honest_mode  # noqa: E402
from benchmarks.probe_block_traffic import timed_scan  # noqa: E402


def main():
    enter_honest_mode()
    import jax.numpy as jnp
    import numpy as np

    results = {}
    rng = np.random.default_rng(0)

    # identity: pure harness cost (sum + feedback on a 33.5 MB arg)
    x = jnp.asarray(rng.standard_normal((128, 64, 64, 32)), jnp.bfloat16)
    results["identity_33mb_arg"] = round(timed_scan(lambda a: a, x), 3)

    # tiny arg identity: harness floor
    t = jnp.asarray(rng.standard_normal((8, 128)), jnp.bfloat16)
    results["identity_tiny_arg"] = round(timed_scan(lambda a: a, t), 3)

    # leaky-relu at growing sizes (read+write MB noted in key)
    for mb, shape in ((8, (32, 64, 64, 32)), (33, (128, 64, 64, 32)),
                      (134, (128, 128, 128, 32)),
                      (268, (128, 128, 128, 64))):
        xx = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

        def f(a):
            v = a.astype(jnp.float32)
            return jnp.where(v >= 0, v, 0.2 * v).astype(jnp.bfloat16)

        results[f"lrelu_{mb}mb"] = round(timed_scan(f, xx), 3)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
