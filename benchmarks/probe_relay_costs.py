"""Decompose relay costs in honest mode: readback RTT, per-dispatch cost,
per-scan-iteration slope, and true HBM bandwidth via k-sweep. Run alone."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enter_honest_mode  # noqa: E402


def main():
    enter_honest_mode()
    import jax
    import jax.numpy as jnp
    import numpy as np

    results = {}
    rng = np.random.default_rng(0)

    # 1. readback RTT: float() of a small resident buffer
    small = jnp.ones((8, 128), jnp.float32) * 2.0
    jax.block_until_ready(small)
    float(np.asarray(small)[0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        float(np.asarray(small)[0, 0])
    results["readback_rtt_ms"] = round((time.perf_counter() - t0) / 10 * 1e3,
                                       3)

    # 2. per-dispatch cost: trivial jit, no readback until the end
    f = jax.jit(lambda a: a * 1.000001)
    y = f(small)
    jax.block_until_ready(y)
    float(np.asarray(y)[0, 0])
    t0 = time.perf_counter()
    for _ in range(20):
        y = f(y)
    jax.block_until_ready(y)
    float(np.asarray(y)[0, 0])
    results["dispatch_ms"] = round(
        (time.perf_counter() - t0 - 0) / 20 * 1e3, 3)

    # 3+4. k-sweep of an identity scan and a big lrelu scan -> slope
    def scan_time(fn, arg, k):
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
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(arg)
            jax.block_until_ready(out)
            float(np.asarray(out))
            vals.append(time.perf_counter() - t0)
        vals.sort()
        return vals[1] * 1e3  # total ms for the whole call

    tiny = jnp.asarray(rng.standard_normal((8, 128)), jnp.bfloat16)
    big = jnp.asarray(rng.standard_normal((128, 128, 128, 64)), jnp.bfloat16)

    def lrelu(a):
        v = a.astype(jnp.float32)
        return jnp.where(v >= 0, v, 0.2 * v).astype(jnp.bfloat16)

    for tag, fn, arg in (("id_tiny", lambda a: a, tiny),
                         ("lrelu_268mb", lrelu, big)):
        t8 = scan_time(fn, arg, 8)
        t64 = scan_time(fn, arg, 64)
        results[f"{tag}_k8_total_ms"] = round(t8, 2)
        results[f"{tag}_k64_total_ms"] = round(t64, 2)
        results[f"{tag}_slope_ms_per_iter"] = round((t64 - t8) / 56, 3)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
