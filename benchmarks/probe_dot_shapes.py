"""Micro-probe: how does Mosaic time dot_general variants at gblock shapes?

Cases (all per-image work x B=128 grid programs, bf16 in / f32 acc):
  a. 9x 3-D dot (64, 64, 32) @ (32, 64)        — current kernel A shape
  b. 3x 3-D dot (64, 64, 128) @ (128, 64)      — tap-grouped
  c. 9x 2-D dot (4096, 32) @ (32, 64)          — flattened M
  d. 3x 2-D dot (4096, 128) @ (128, 64)        — flattened + grouped
  e. 1x 2-D dot (4096, 288) @ (288, 64)        — full im2col K
  f. b + the pad-buffer strided-view loads      — isolate view cost
  g. elementwise only: bn-apply + act + write   — VPU floor
Run alone.
"""
from __future__ import annotations

import json
import os
import sys
import time

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

    B, H, W, CIN, N = 128, 64, 64, 32, 64
    rng = np.random.default_rng(0)
    x3 = jnp.asarray(rng.standard_normal((B, H, W, CIN)), jnp.bfloat16)
    x2 = x3.reshape(B, H * W, CIN)

    def timed(fn, *ws_args):
        ws = ws_args[1:]
        return timed_scan(lambda x: fn(x, *ws),
                          ws_args[0]) if ws else timed_scan(fn, ws_args[0])

    results = {}

    def run_case(name, kernel, in_shape, out_shape, weights):
        def fn(x, *ws):
            return pl.pallas_call(
                kernel,
                grid=(B,),
                in_specs=[pl.BlockSpec((1,) + in_shape,
                                       lambda i: (i,) + (0,) * len(in_shape),
                                       memory_space=pltpu.VMEM)]
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(ws),
                out_specs=pl.BlockSpec(
                    (1,) + out_shape,
                    lambda i: (i,) + (0,) * len(out_shape),
                    memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B,) + out_shape,
                                               jnp.bfloat16),
            )(x, *ws)

        x = x3 if len(in_shape) == 3 else x2
        try:
            results[name] = round(timed(fn, x, *weights), 3)
        except Exception as e:  # noqa: BLE001
            results[name] = str(e).split("\n")[0][:120]

    dn3 = (((2,), (0,)), ((), ()))
    dn2 = (((1,), (0,)), ((), ()))

    # a: 9 x 3-D dots
    w9 = jnp.asarray(rng.standard_normal((9, CIN, N)), jnp.bfloat16)

    def k_a(x_ref, w_ref, o_ref):
        x = x_ref[0]
        acc = jnp.zeros((H, W, N), jnp.float32)
        for t in range(9):
            acc += jax.lax.dot_general(
                x, w_ref[t], dimension_numbers=dn3,
                preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16)

    run_case("a_9x3d", k_a, (H, W, CIN), (H, W, N), (w9,))

    # b: 3 x 3-D dots, K=128
    w3 = jnp.asarray(rng.standard_normal((3, 4 * CIN, N)), jnp.bfloat16)

    def k_b(x_ref, w_ref, o_ref):
        x = x_ref[0]
        xc = jnp.concatenate([x, x, x, x], axis=-1)
        acc = jnp.zeros((H, W, N), jnp.float32)
        for t in range(3):
            acc += jax.lax.dot_general(
                xc, w_ref[t], dimension_numbers=dn3,
                preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16)

    run_case("b_3x3d_k128", k_b, (H, W, CIN), (H, W, N), (w3,))

    # c: 9 x 2-D dots
    def k_c(x_ref, w_ref, o_ref):
        x = x_ref[0]
        acc = jnp.zeros((H * W, N), jnp.float32)
        for t in range(9):
            acc += jax.lax.dot_general(
                x, w_ref[t], dimension_numbers=dn2,
                preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16)

    run_case("c_9x2d", k_c, (H * W, CIN), (H * W, N), (w9,))

    # d: 3 x 2-D dots, K=128
    def k_d(x_ref, w_ref, o_ref):
        x = x_ref[0]
        xc = jnp.concatenate([x, x, x, x], axis=-1)
        acc = jnp.zeros((H * W, N), jnp.float32)
        for t in range(3):
            acc += jax.lax.dot_general(
                xc, w_ref[t], dimension_numbers=dn2,
                preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16)

    run_case("d_3x2d_k128", k_d, (H * W, CIN), (H * W, N), (w3,))

    # e: one K=288 dot
    wbig = jnp.asarray(rng.standard_normal((9 * CIN, N)), jnp.bfloat16)

    def k_e(x_ref, w_ref, o_ref):
        x = x_ref[0]
        xc = jnp.concatenate([x] * 9, axis=-1)
        o_ref[0] = jax.lax.dot_general(
            xc, w_ref[:], dimension_numbers=dn2,
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    run_case("e_1x2d_k288", k_e, (H * W, CIN), (H * W, N), (wbig,))

    # f: strided-view loads from a padded buffer + 3 grouped 2-D dots
    def k_f(x_ref, w_ref, o_ref, pad_ref, cat_ref):
        x = x_ref[0]
        pad_ref[1:1 + H, 1:1 + W, :] = x
        acc = jnp.zeros((H * W, N), jnp.float32)
        for g in range(3):
            for slot in range(3):
                t = g * 3 + slot
                cat_ref[:, :, slot * CIN:(slot + 1) * CIN] = (
                    pad_ref[t // 3:t // 3 + H, t % 3:t % 3 + W, :])
            acc += jax.lax.dot_general(
                cat_ref[:].reshape(H * W, 3 * CIN),
                w_ref[g], dimension_numbers=dn2,
                preferred_element_type=jnp.float32)
        o_ref[0] = acc.astype(jnp.bfloat16)

    w3x = jnp.asarray(rng.standard_normal((3, 3 * CIN, N)), jnp.bfloat16)

    def fn_f(x, w):
        return pl.pallas_call(
            k_f,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, H, W, CIN), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H * W, N), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H * W, N), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((H + 2, W + 2, CIN), jnp.bfloat16),
                            pltpu.VMEM((H, W, 3 * CIN), jnp.bfloat16)],
        )(x, w)

    try:
        results["f_views_3x2d"] = round(
            timed_scan(lambda x: fn_f(x, w3x), x3), 3)
    except Exception as e:  # noqa: BLE001
        results["f_views_3x2d"] = str(e).split("\n")[0][:120]

    # g: elementwise-only floor
    def k_g(x_ref, o_ref):
        x = x_ref[0].astype(jnp.float32)
        h = jnp.where(x >= 0, x, 0.2 * x)
        o_ref[0] = (h * 1.01 + 0.5).astype(jnp.bfloat16)[:, :, :N * 0 + CIN]

    def fn_g(x):
        return pl.pallas_call(
            k_g,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, H, W, CIN), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W, CIN), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, CIN), jnp.bfloat16),
        )(x)

    results["g_elementwise"] = round(timed(fn_g, x3), 3)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
