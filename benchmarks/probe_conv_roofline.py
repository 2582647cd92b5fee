"""Shape-matched conv roofline: what do the '128' step's OWN conv shapes
reach on bare XLA convs? (round-4 MFU follow-up, docs/PERF.md)

The ~190 TFLOP/s dense peak needs >=4096^2 operands; the GAN's convs
have K in [576, 4608] and N in [16, 512]. This probe times each distinct
3x3 conv of the '128' b128 tower — flax full-resolution form AND the
parity-packed form actually executed on TPU — as a bare
``lax.conv_general_dilated`` in a k-sweep scan (slope method: the
k_hi - k_lo delta cancels the relay's fixed launch+fence cost), and
reports achieved TFLOP/s per shape. The per-shape ceiling is the honest
MFU comparator for the step.

Each row reports two rates: executed TFLOP/s (the conv's own
2*B*H*W*9*Cin*Cout) and, for parity rows, useful TFLOP/s (the
full-resolution conv's algorithmic FLOPs over the same time — parity
weights are 25% dense, so executed = 4x useful).

Run alone: python benchmarks/probe_conv_roofline.py
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enter_honest_mode  # noqa: E402


def conv_slope_ms(h, w, cin, cout, batch=128, reps=3, ksize=3):
    """ms per bare conv at (batch, h, w, cin)->cout, slope-timed.

    ``ksize=3``: 3x3 SAME (the flax and 3x3-packed parity forms).
    ``ksize=2``: 2x2 with padding ((1,1),(1,1)) -> (h+1, w+1) output — the
    merged-tap parity form ``ops/parity.py::conv_parity2`` executes
    (round 4); the slice+concat realignment is excluded here on purpose
    (this is the bare-conv ceiling, the step pays it in fused form)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, h, w, cin)), jnp.bfloat16)
    wts = jnp.asarray(
        rng.standard_normal((ksize, ksize, cin, cout)) * 0.02, jnp.bfloat16)
    # square-ish channels so the iterate can feed back: project out->in
    proj = jnp.asarray(rng.standard_normal((cout, cin)) * 0.02, jnp.bfloat16)
    pad = "SAME" if ksize == 3 else ((1, 1), (1, 1))
    hout, wout = (h, w) if ksize == 3 else (h + 1, w + 1)

    def one(a):
        y = jax.lax.conv_general_dilated(
            a, wts, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    def chain(a, k):
        def body(x, _):
            y = one(x)
            if ksize == 2:  # realign to (h, w) so the loop can feed back
                y = y[:, :h, :w, :]
            # cheap cout->cin feedback keeps the loop serial & live
            x2 = jnp.einsum("bhwc,cd->bhwd", y, proj)
            return x2.astype(jnp.bfloat16), ()
        return jax.lax.scan(body, a, None, length=k)[0]

    f = jax.jit(chain, static_argnums=(1,))

    def timed(k):
        out = f(x, k)
        jax.block_until_ready(out)
        float(out[0, 0, 0, 0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(x, k)
            jax.block_until_ready(out)
            float(out[0, 0, 0, 0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    flops = 2 * batch * hout * wout * ksize * ksize * cin * cout
    # feedback projection adds 2*B*H*W*cout*cin — subtract it from the
    # quotient? No: keep it IN the denominator work estimate (it is real
    # MXU work in the loop) so the conv's own rate is a floor, then
    # report it separately.
    fb_flops = 2 * batch * h * w * cout * cin
    # target >=2e13 FLOP of k-delta work: at the ~50-190 TFLOP/s these
    # shapes run, that's a 100-400 ms timing delta, an order of magnitude
    # above the relay's ~±10 ms fixed-cost jitter. The earlier 2.5e12
    # target let fast rows read 300-490 TFLOP/s — above the measured
    # 190 dense peak, i.e. pure jitter.
    dk = max(16, int(np.ceil(2.0e13 / (flops + fb_flops))))
    k_lo = 8
    t_lo, t_hi = timed(k_lo), timed(k_lo + dk)
    per_iter_ms = (t_hi - t_lo) * 1e3 / dk
    return per_iter_ms, flops, fb_flops


# (tag, H, W, Cin, Cout). Flax form = the full-resolution convs the
# reference semantics specify; parity form = what models/blocks.py
# actually executes on TPU for the <=64-out blocks (half res, 4x chans).
SHAPES = [
    ("g_blk1_8px_128to128", 8, 8, 128, 128),
    ("g_blk2_16px_128to128", 16, 16, 128, 128),
    ("g_blk3_32px_128to64", 32, 32, 128, 64),
    ("g_blk3_32px_64to64", 32, 32, 64, 64),
    ("g_blk4_64px_64to32_flax", 64, 64, 64, 32),
    ("g_blk4_64px_32to32_flax", 64, 64, 32, 32),
    ("g_blk5_128px_32to16_flax", 128, 128, 32, 16),
    ("g_blk5_128px_16to16_flax", 128, 128, 16, 16),
    # parity-form equivalents (half resolution, 4x channels; executed
    # FLOPs = 4x the flax row's — 25%-dense packed weights)
    ("g_blk4_parity_up_32px_64to128", 32, 32, 64, 128),      # pack_up c1
    ("g_blk4_parity_full_32px_128to128", 32, 32, 128, 128),  # pack_full c2
    ("g_blk5_parity_up_64px_32to64", 64, 64, 32, 64),
    ("g_blk5_parity_full_64px_64to64", 64, 64, 64, 64),
    ("d_blk1_parity_down_64px_12to32", 64, 64, 12, 32),      # D input s2d
    ("d_blk2_parity_full_32px_128to256", 32, 32, 128, 256),
]

# merged-tap 2x2 forms (round 4): same logical convs as the parity rows
# above but with the structural-zero taps dropped — 2.25x fewer executed
# FLOPs per conv (ops/parity.py::pack_up_conv2 / pack_full_conv2).
SHAPES_2X2 = [
    ("g_blk4_parity2_up_32px_64to128", 32, 32, 64, 128),
    ("g_blk4_parity2_full_32px_128to128", 32, 32, 128, 128),
    ("g_blk5_parity2_up_64px_32to64", 64, 64, 32, 64),
    ("g_blk5_parity2_full_64px_64to64", 64, 64, 64, 64),
    ("d_blk2_parity2_full_32px_128to256", 32, 32, 128, 256),
]


def main():
    enter_honest_mode()
    results = {}
    print("shape, ms/conv, executed TFLOP/s (incl feedback)", flush=True)
    for ksize, shapes in ((3, SHAPES), (2, SHAPES_2X2)):
        for tag, h, w, cin, cout in shapes:
            ms, flops, fb = conv_slope_ms(h, w, cin, cout, ksize=ksize)
            tf = (flops + fb) / (ms / 1e3) / 1e12
            tf_conv = flops / (ms / 1e3) / 1e12
            results[tag] = {"ms": round(ms, 4), "tflops": round(tf, 1),
                            "tflops_conv_only": round(tf_conv, 1)}
            print(f"  {tag}: {ms:.4f} ms, {tf:.1f} TFLOP/s "
                  f"({tf_conv:.1f} conv-only)", flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
