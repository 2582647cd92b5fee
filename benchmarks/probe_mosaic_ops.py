"""Which Mosaic primitives does this libtpu support? (kernel design probe)

Tests, each in its own tiny pallas_call on the real TPU:
  1. (H, W, C) -> (H*W, C) reshape (merge leading dims) + matmul
  2. static strided ref write: out[0, :, a, :, b, :] = plane
  3. pltpu.repeat semantics (interleave vs tile)
  4. jnp.repeat(x, 2, axis) lowering
  5. row interleave via stack+reshape (H,2,W,C) -> (2H,W,C)
Prints ok/fail per primitive. Run alone.
"""
from __future__ import annotations

import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 8, 16, 32


def try_case(name, fn):
    try:
        out = fn()
        print(f"{name}: ok", out)
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")
        return False
    return True


def case_reshape_matmul():
    def kernel(x_ref, w_ref, o_ref):
        x = x_ref[:]
        flat = x.reshape(H * W, C)
        o_ref[:] = jnp.dot(flat, w_ref[:],
                           preferred_element_type=jnp.float32)

    x = jnp.ones((H, W, C), jnp.float32)
    w = jnp.ones((C, C), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H * W, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)
    return float(out[0, 0])  # expect C = 32


def case_strided_write():
    def kernel(x_ref, o_ref):
        for a in range(2):
            for b in range(2):
                o_ref[:, a, :, b, :] = x_ref[:] * (1.0 + a * 2 + b)

    x = jnp.ones((H, W, C), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, 2, W, 2, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return [float(out[0, a, 0, b, 0]) for a in range(2) for b in range(2)]


def case_pltpu_repeat():
    def kernel(x_ref, o_ref):
        o_ref[:] = pltpu.repeat(x_ref[:], 2, 0)

    x = jnp.arange(H, dtype=jnp.float32)[:, None, None] * jnp.ones((H, W, C))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * H, W, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    head = [float(out[i, 0, 0]) for i in range(4)]
    # interleave -> [0,0,1,1]; tile -> [0,1,2,3]
    return head


def case_jnp_repeat():
    def kernel(x_ref, o_ref):
        y = jnp.repeat(x_ref[:], 2, axis=0)
        o_ref[:] = jnp.repeat(y, 2, axis=1)

    x = jnp.arange(H, dtype=jnp.float32)[:, None, None] * jnp.ones((H, W, C))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * H, 2 * W, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return [float(out[i, 0, 0]) for i in range(4)]


def case_stack_reshape_rows():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        y = jnp.stack([x, x], axis=1)          # (H, 2, W, C)
        o_ref[:] = y.reshape(2 * H, W, C)

    x = jnp.arange(H, dtype=jnp.float32)[:, None, None] * jnp.ones((H, W, C))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((2 * H, W, C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    return [float(out[i, 0, 0]) for i in range(4)]


def case_dot_general_3d():
    def kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:], w_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    x = jnp.ones((H, W, C), jnp.float32)
    w = jnp.ones((C, 16), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W, 16), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)
    return float(out[0, 0, 0])


if __name__ == "__main__":
    assert jax.default_backend() == "tpu", jax.default_backend()
    ok = {}
    ok["reshape_matmul"] = try_case("1 reshape(HW,C)+matmul",
                                    case_reshape_matmul)
    ok["strided_write"] = try_case("2 strided ref write", case_strided_write)
    ok["pltpu_repeat"] = try_case("3 pltpu.repeat", case_pltpu_repeat)
    ok["jnp_repeat"] = try_case("4 jnp.repeat", case_jnp_repeat)
    ok["stack_reshape"] = try_case("5 stack+reshape rows",
                                   case_stack_reshape_rows)
    ok["dot_general_3d"] = try_case("6 dot_general 3d free dims",
                                    case_dot_general_3d)
    print(ok)
