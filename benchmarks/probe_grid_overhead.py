"""Per-grid-program overhead probe: same elementwise work, varying
images-per-program (grid = B/ipp), plus a no-op-grid and an XLA copy
baseline. Run alone."""
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, H, W, C = 128, 64, 64, 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    results = {}

    def k_ew(x_ref, o_ref):
        v = x_ref[:].astype(jnp.float32)
        o_ref[:] = jnp.where(v >= 0, v, 0.2 * v).astype(jnp.bfloat16)

    for ipp in (1, 2, 4, 8, 16, 32):
        def fn(x, ipp=ipp):
            return pl.pallas_call(
                k_ew,
                grid=(B // ipp,),
                in_specs=[pl.BlockSpec((ipp, H, W, C),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((ipp, H, W, C),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
            )(x)

        try:
            results[f"ew_ipp{ipp}"] = round(timed_scan(fn, x), 3)
        except Exception as e:  # noqa: BLE001
            results[f"ew_ipp{ipp}"] = str(e).split("\n")[0][:100]

    # parallel dimension_semantics at ipp=1
    def fn_par(x):
        return pl.pallas_call(
            k_ew,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",)),
        )(x)

    try:
        results["ew_ipp1_parallel"] = round(timed_scan(fn_par, x), 3)
    except Exception as e:  # noqa: BLE001
        results["ew_ipp1_parallel"] = str(e).split("\n")[0][:100]

    # XLA elementwise baseline
    def fn_xla(x):
        v = x.astype(jnp.float32)
        return jnp.where(v >= 0, v, 0.2 * v).astype(jnp.bfloat16)

    results["ew_xla"] = round(timed_scan(fn_xla, x), 3)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
