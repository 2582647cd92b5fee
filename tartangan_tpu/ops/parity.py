"""Parity-domain (sub-pixel / space-to-depth) convolution rewrites.

On this chip the GAN tower's thin-channel 3x3 convs (C = 16..64) are
MXU-pass-bound, not FLOP- or bandwidth-bound: a conv pass occupies
ceil(K/128) x ceil(N/128) lane/sublane tiles, so N=16 wastes 8x of the
systolic array (docs/PERF.md round-3 remeasurement: real HBM bandwidth
is ~730 GB/s, launch-amortized — the convs, not the traffic, dominate
the step). These rewrites trade spatial positions for channels so K and
N fill 128 lanes:

- ``conv3x3(up2_nearest(h), w)`` == ``depth_to_space(conv3x3(h, pack_up(w)))``
  (classic sub-pixel convolution): output parity plane (qy, qx) only
  reads h[i+oy, j+ox], oy/ox in {-1,0,1}, with weight
  sum_{d: floor((q+d)/2)=o} w[1+dy, 1+dx]. N grows 4x, M shrinks 4x,
  and the upsampled intermediate never exists.
- a full-resolution ``conv3x3`` over channel-stacked parity planes is a
  small-offset conv with block-structured ``(3, 3, 4C, 4C')`` weights
  (block (p -> q) of offset o is w[1+d], d = 2o + p - q, present iff
  both components land in {-1,0,1}).
- each output parity's window actually spans only TWO small offsets per
  dim ({q-1, q}), so the ``*_conv2`` merged-tap forms express the same
  convs with 2x2 kernels plus a per-parity output shift
  (``conv_parity2``) — 2.25x fewer executed FLOPs than the 3x3 packings
  (whose structural-zero taps the MXU still multiplies). Measured on
  hardware this is a NEGATIVE result: the realignment copy costs more
  than the dead taps (see ``MERGED_TAP`` below), so the 3x3 packed
  forms are the default and the 2x2 forms are kept as the pinned
  alternative formulation.
- ``avg_pool_2x(conv3x3(x, w))`` == ``conv3x3(space_to_depth(x),
  pack_down(w))`` — the pool is a mean over output parities, folded into
  the weights, so the downsampling conv *emits* standard layout.

All pure jnp/lax: XLA differentiates through the packing (it is linear
in w), so these forms work in the backward pass and under the R1
second-order gradient, where a custom-VJP Pallas kernel cannot
(ops/pallas/gblock.py keeps the Pallas transcription as a measured-
slower comparison baseline).

Used by ``models/blocks.py`` parity block variants (reference semantics
blocks/generator.py:32-62, blocks/discriminator.py:49-95).
"""
from __future__ import annotations

import numpy as np

# Trace-time switch between the 3x3 packed forms (structural zeros, no
# realignment — the default) and the merged-tap 2x2 forms (conv_parity2
# with per-parity realignment slices). The 2x2 forms execute 2.25x fewer
# MACs but pay an (H+1, W+1) overproduced conv output plus a
# slice/concat realignment per conv that XLA materializes (+16 GB of
# booked bytes on the '128' step). Same-session A/B on hardware
# (benchmarks/probe_parity_step.py, 2026-08-18): 3x3 packed 27.6
# ms/step vs merged-tap 35.3 vs flax 37.9 — the merged-tap form LOSES
# 28%; on this chip the parity convs are MXU-pass/occupancy-bound, not
# FLOP-bound, so removing structurally-zero taps saves nothing while
# the realignment copy costs plenty. Kept as a measured negative result;
# both forms produce bit-identical block outputs (tests pin it).
MERGED_TAP = False

# Trace-time switch for the GENERATOR-side fused merged-tap Pallas
# kernel (ops/pallas/parity_conv.py): the 2x2 contraction AND the
# per-parity realignment execute in one VMEM pass, removing the HBM
# copies that made the XLA merged-tap form lose. G blocks only — its
# custom_vjp cannot sit under the R1 second-order gradient that D needs
# (the backward is the XLA VJP of the 3x3-packed form, so gradients are
# identical to the default path). Flipped by --fused-g-convs / the A/B
# probe (benchmarks/probe_parity_step.py).
FUSED_G = False


def _pack_up_indices():
    """(tap (oy, ox), parity q, source tap (dy, dx)) triples for the
    sub-pixel conv: floor((q + d) / 2) == o per dimension."""
    out = []
    for qy in range(2):
        for qx in range(2):
            q = 2 * qy + qx
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    oy, ox = (qy + dy) >> 1, (qx + dx) >> 1
                    out.append(((oy + 1, ox + 1), q, (dy + 1, dx + 1)))
    return out


def pack_up_conv(w):
    """(3, 3, Cin, Cout) -> (3, 3, Cin, 4*Cout) sub-pixel weights such
    that conv3x3(up2_nearest(h), w) == depth_to_space(conv3x3(h, out)).
    Channel-block index is 2*qy + qx (row-parity major)."""
    import jax.numpy as jnp
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, cin, 4 * cout), w.dtype)
    for (ky, kx), q, (sy, sx) in _pack_up_indices():
        out = out.at[ky, kx, :, q * cout:(q + 1) * cout].add(w[sy, sx])
    return out


def pack_up_conv2(w):
    """(3, 3, Cin, Cout) -> (2, 2, Cin, 4*Cout) merged-tap sub-pixel
    weights for ``conv_parity2``: the 3x3-over-up2 receptive field of an
    output parity covers only a 2x2 window of small-resolution positions
    (per dim, parity q reads offsets {q-1, q}), so a 2x2 kernel with a
    per-parity output shift computes the same values with 16*C*C' MACs
    per small position instead of ``pack_up_conv``'s 36 — a 2.25x
    executed-FLOP cut at identical results (the padding taps that XLA
    would multiply by structural zeros are simply not in the kernel).
    Window slot a corresponds to source offset o = a - 1 + q."""
    import jax.numpy as jnp
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, cin, 4 * cout), w.dtype)
    for qy in range(2):
        for qx in range(2):
            q = 2 * qy + qx
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    ay = ((qy + dy) >> 1) + 1 - qy
                    ax = ((qx + dx) >> 1) + 1 - qx
                    out = out.at[ay, ax, :, q * cout:(q + 1) * cout].add(
                        w[dy + 1, dx + 1])
    return out


def pack_full_conv2(w):
    """(3, 3, Cin, Cout) -> (2, 2, 4*Cin, 4*Cout) merged-tap form of
    ``pack_full_conv`` for ``conv_parity2``: output parity q's 3x3
    full-resolution window spans 2 small-resolution offsets per dim
    ({q-1, q}), so the parity-domain conv needs only a 2x2 kernel plus a
    per-parity output shift — 64*C*C' executed MACs per small position
    (9/16 structurally nonzero) instead of the 3x3 form's 144 (1/4
    nonzero). Valid slot: d = 2*a + p + q - 2 in {-1, 0, 1} per dim."""
    import jax.numpy as jnp
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((2, 2, 4 * cin, 4 * cout), w.dtype)
    for qy in range(2):
        for qx in range(2):
            q = 2 * qy + qx
            for py in range(2):
                for px in range(2):
                    p = 2 * py + px
                    for ay in range(2):
                        for ax in range(2):
                            dy = 2 * ay + py + qy - 2
                            dx = 2 * ax + px + qx - 2
                            if abs(dy) > 1 or abs(dx) > 1:
                                continue
                            out = out.at[
                                ay, ax, p * cin:(p + 1) * cin,
                                q * cout:(q + 1) * cout].set(
                                    w[dy + 1, dx + 1])
    return out


def conv_parity2(x, w2, cout, b=None):
    """Apply a merged-tap 2x2 parity kernel (``pack_up_conv2`` /
    ``pack_full_conv2``): one conv with padding ((1,1),(1,1)) produces a
    (B, H+1, W+1, 4*Cout) tensor in which output parity q = 2*qy + qx
    lives at spatial offset (qy, qx); the per-parity slices re-align it
    to the standard (B, H, W, 4*Cout) parity stack. XLA fuses the slice+
    concat into the consumer; the savings are in the conv itself."""
    import jax
    import jax.numpy as jnp
    y = jax.lax.conv_general_dilated(
        x, w2.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h, w = x.shape[1], x.shape[2]
    parts = []
    for qy in range(2):
        for qx in range(2):
            q = 2 * qy + qx
            parts.append(y[:, qy:h + qy, qx:w + qx,
                           q * cout:(q + 1) * cout])
    out = jnp.concatenate(parts, axis=-1)
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def _pack_full_indices():
    out = []
    for qy in range(2):
        for qx in range(2):
            q = 2 * qy + qx
            for py in range(2):
                for px in range(2):
                    p = 2 * py + px
                    for oy in range(-1, 2):
                        for ox in range(-1, 2):
                            dy = 2 * oy + py - qy
                            dx = 2 * ox + px - qx
                            if abs(dy) > 1 or abs(dx) > 1:
                                continue
                            out.append(((oy + 1, ox + 1), p, q,
                                        (dy + 1, dx + 1)))
    return out


def pack_full_conv(w):
    """(3, 3, Cin, Cout) -> (3, 3, 4*Cin, 4*Cout): a full-resolution 3x3
    conv expressed over channel-stacked parity planes (input parity p at
    small offset o feeds output parity q iff d = 2o + p - q lands in
    {-1,0,1} per dimension)."""
    import jax.numpy as jnp
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * cin, 4 * cout), w.dtype)
    for (ky, kx), p, q, (sy, sx) in _pack_full_indices():
        out = out.at[ky, kx, p * cin:(p + 1) * cin,
                     q * cout:(q + 1) * cout].set(w[sy, sx])
    return out


def pack_down_conv(w):
    """(3, 3, Cin, Cout) -> (3, 3, 4*Cin, Cout):
    avg_pool_2x(conv3x3(x, w)) == conv3x3(space_to_depth(x), out) —
    the 2x2 mean is a mean over output parities, folded into the
    weights. The result is already at half resolution in standard
    layout."""
    import jax.numpy as jnp
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((3, 3, 4 * cin, cout), w.dtype)
    for (ky, kx), p, _q, (sy, sx) in _pack_full_indices():
        out = out.at[ky, kx, p * cin:(p + 1) * cin, :].add(
            w[sy, sx] * np.float32(0.25))
    return out


def _pack_down_parity_matrix():
    """Per-dim (4, 2, 2, 3) selection matrix S[a, p, q, s] for
    ``pack_down_parity_conv``: tap a (offset o = a - 1 in the INPUT
    parity domain, stride 2), input parity p, output parity q, source
    tap s (d = s - 1). Entry 0.5 iff the pooled pair index
    r = 2*(a-1) + p - 2*q - (s-1) lands in {0, 1} (each output half-res
    position averages conv outputs at full-res 4j + 2q + r)."""
    S = np.zeros((4, 2, 2, 3), np.float32)
    for a in range(4):
        for p in range(2):
            for q in range(2):
                for s in range(3):
                    r = 2 * (a - 1) + p - 2 * q - (s - 1)
                    if r in (0, 1):
                        S[a, p, q, s] = 0.5
    return S


def pack_down_parity_conv(w):
    """(3, 3, Cin, Cout) -> (4, 4, 4*Cin, 4*Cout) STRIDE-2 kernel with
    padding ((1,1),(1,1)) over an s=2 parity-stacked input, such that the
    conv emits ``space_to_depth(avg_pool_2x(conv3x3(x, w)))`` — i.e. the
    D block's conv2+pool with the output STILL parity-stacked (at half
    resolution), so the next parity block can consume it directly
    (``accept_parity``) and the standard-layout half-res tensor never
    materializes.

    Why it wins over ``pack_down_conv``: that form emits standard layout
    with N = Cout (a quarter-filled MXU lane tile at tower widths);
    here N = 4*Cout fills the lanes while the pool stays folded —
    2.25x less MXU-pass work at Cout = 32 (docs/PERF.md round 4).
    """
    import jax.numpy as jnp
    cin, cout = w.shape[2], w.shape[3]
    S = jnp.asarray(_pack_down_parity_matrix(), w.dtype)
    packed = jnp.einsum("ypqs,xPQS,sSio->yxpPiqQo", S, S, w)
    return packed.reshape(4, 4, 4 * cin, 4 * cout)


def pack_point_conv(w):
    """(1, 1, Cin, Cout) -> (1, 1, 4*Cin, 4*Cout) block-diagonal weights:
    a 1x1 conv acts on each spatial position independently, so output
    parity q reads only input parity q. Used to keep the generator's
    output stage (norm -> act -> 1x1 -> tanh, reference
    blocks/generator.py:115-129) in the parity domain: K and N grow 4x
    (16->64 / 3->12 at config '128' — the worst-filled matmul in the
    model otherwise) and the full-resolution pre-output tensor never
    materializes."""
    import jax.numpy as jnp
    cin, cout = w.shape[2], w.shape[3]
    out = jnp.zeros((1, 1, 4 * cin, 4 * cout), w.dtype)
    for p in range(4):
        out = out.at[0, 0, p * cin:(p + 1) * cin,
                     p * cout:(p + 1) * cout].set(w[0, 0])
    return out


def depth_to_space(y, cout):
    """(B, H, W, 4*C) parity channels -> (B, 2H, 2W, C); channel-block
    index 2*qy + qx."""
    import jax.numpy as jnp  # noqa: F401
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, cout)


def space_to_depth(x):
    """(B, 2H, 2W, C) -> (B, H, W, 4*C) parity channels (inverse of
    ``depth_to_space``)."""
    b, h2, w2, c = x.shape
    h, w = h2 // 2, w2 // 2
    x = x.reshape(b, h, 2, w, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, 4 * c)


def folded_moments(xp, c):
    """Per-original-channel biased mean/var of a parity-stacked
    (B, H, W, 4*C) tensor, f32 — every full-resolution position appears
    exactly once among the parity blocks, so folding the parity axis
    into the reduction reproduces flax BatchNorm's statistics of the
    full-resolution tensor."""
    import jax.numpy as jnp
    x32 = xp.astype(jnp.float32)
    b, h, w, _ = x32.shape
    x32 = x32.reshape(b, h, w, 4, c)
    mean = jnp.mean(x32, axis=(0, 1, 2, 3))
    var = jnp.mean(jnp.square(x32), axis=(0, 1, 2, 3)) - jnp.square(mean)
    return mean, var
