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


def conv_bwd_slope_ms(h, w, cin, cout, which, batch=128, reps=3, ksize=3):
    """ms per conv VJP at (batch, h, w, cin)->cout, slope-timed.

    ``which='dx'`` times the input-cotangent pullback alone (a
    transposed/flipped conv, (B,H,W,Cout)->(B,H,W,Cin)); ``which='dw'``
    times the weight-gradient contraction alone ((B,H,W,Cin) x
    (B,H,W,Cout) -> (kk,kk,Cin,Cout) — contraction dim B*H*W, output tile
    9*Cin x Cout). Both are isolated through ``jax.vjp``: the conv is
    linear in each argument, so XLA dead-codes the forward pass and the
    scan body executes ONLY the requested backward contraction (verified:
    the lowered HLO of the dx body contains a single conv). Each VJP has
    the forward's FLOP count (2*B*H*W*kk*kk*Cin*Cout), so rates compare
    1:1 against the forward table. This is the measurement VERDICT r4
    next #2 asked for — 'similar ceilings' was an assumption; conv VJPs
    are transposed/dilated contractions with different MXU fill.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, h, w, cin)), jnp.bfloat16)
    wts = jnp.asarray(
        rng.standard_normal((ksize, ksize, cin, cout)) * 0.02, jnp.bfloat16)
    pad = "SAME" if ksize == 3 else ((1, 1), (1, 1))
    hout, wout = (h, w) if ksize == 3 else (h + 1, w + 1)
    g0 = jnp.asarray(
        rng.standard_normal((batch, hout, wout, cout)), jnp.bfloat16)
    # feedback projection keeps the scan serial: cotangent-shaped output
    proj_dx = jnp.asarray(
        rng.standard_normal((cin, cout)) * 0.02, jnp.bfloat16)

    # plain bf16 convs (no preferred_element_type): the MXU accumulates
    # f32 internally either way, and the f32-preferred + astype(bf16)
    # pattern makes jax's conv transpose rule see an f32 cotangent against
    # bf16 weights (dtype mismatch) — the VJP itself is what's timed here
    def conv_x(a):
        return jax.lax.conv_general_dilated(
            a, wts, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def conv_w(ww):
        return jax.lax.conv_general_dilated(
            x, ww, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    if which == "dx":
        _, pullback = jax.vjp(conv_x, x)

        def body(g, _):
            (dx,) = pullback(g)
            if ksize == 2:  # dx lives at (h, w); pad back to cotangent res
                dx = jnp.pad(dx, ((0, 0), (0, hout - h), (0, wout - w),
                                  (0, 0)))
            g2 = jnp.einsum("bhwc,cd->bhwd", dx, proj_dx)
            return g2.astype(jnp.bfloat16), ()
    else:
        _, pullback = jax.vjp(conv_w, wts)

        def body(g, _):
            (dw,) = pullback(g)
            s = jnp.sum(dw.astype(jnp.float32)) * jnp.float32(1e-20)
            return (g + s.astype(g.dtype)), ()

    def chain(g, k):
        return jax.lax.scan(body, g, None, length=k)[0]

    f = jax.jit(chain, static_argnums=(1,))

    def timed(k):
        out = f(g0, k)
        jax.block_until_ready(out)
        float(out.reshape(-1)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f(g0, k)
            jax.block_until_ready(out)
            float(out.reshape(-1)[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    flops = 2 * batch * hout * wout * ksize * ksize * cin * cout
    fb_flops = (2 * batch * hout * wout * cin * cout if which == "dx" else 0)
    dk = max(16, int(np.ceil(2.0e13 / (flops + fb_flops))))
    k_lo = 8
    t_lo, t_hi = timed(k_lo), timed(k_lo + dk)
    per_iter_ms = (t_hi - t_lo) * 1e3 / dk
    return per_iter_ms, flops, fb_flops


def run_forward(results):
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


def run_backward(results):
    print("shape, dx ms / TFLOP/s, dw ms / TFLOP/s", flush=True)
    for tag, h, w, cin, cout in SHAPES:
        row = {}
        for which in ("dx", "dw"):
            ms, flops, fb = conv_bwd_slope_ms(h, w, cin, cout, which)
            tf = (flops + fb) / (ms / 1e3) / 1e12
            row[f"{which}_ms"] = round(ms, 4)
            row[f"{which}_tflops"] = round(tf, 1)
        results[tag + "_bwd"] = row
        print(f"  {tag}: dx {row['dx_ms']:.4f} ms {row['dx_tflops']:.1f} "
              f"TF/s, dw {row['dw_ms']:.4f} ms {row['dw_tflops']:.1f} TF/s",
              flush=True)


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--backward", action="store_true",
                   help="measure the conv VJP table (dx + dw per shape)")
    p.add_argument("--forward", action="store_true",
                   help="measure the forward table")
    args = p.parse_args()
    if not (args.backward or args.forward):
        args.forward = True  # historical default
    enter_honest_mode()
    results = {}
    if args.forward:
        run_forward(results)
    if args.backward:
        run_backward(results)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
