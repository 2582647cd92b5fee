"""Fused residual generator up-block (Pallas/TPU), parity-space form.

Semantics match ``models/blocks.py::ResidualGeneratorBlock`` (reference
blocks/generator.py:32-62) in the training configuration used by every G
tower block (pre-activation, nearest-2x upsample, BatchNorm + leaky-relu):

    h   = act(bn1(x))            # batch stats of x, computed this pass
    out = conv3(act(bn2(conv3(up2(h)))), W2) + proj1x1(up2(x))

The XLA graph materializes the two upsampled (B, 2H, 2W, Cin) tensors
(normalized h_up for conv1, raw x_up for the shortcut) plus the
normalized conv1 output in HBM — on this bandwidth-bound chip
(docs/PERF.md) those round-trips are the block's cost.  A direct VMEM
transcription hits two walls: Mosaic rejects the interleaving
reshape/repeat that nearest-2x upsampling needs at production shapes
("unsupported shape cast"), and 3x3 convs at tower widths (Cout as low
as 16) run K=N=16 matmuls at ~1.5% MXU utilization.

Both walls fall to the same transformation — work in the **parity
domain**.  Output pixel (2i+qy, 2j+qx) of ``conv3x3(up2(h))`` only ever
reads h[i+oy, j+ox] with (oy, ox) in {-1,0,1}^2, so each of the four
parity planes is a small conv on the *un-upsampled* image; stacking the
planes along channels gives

    y1p[i, j, (2qy+qx)*Cout + c] = conv(h)        # (B, H, W, 4*Cout)

computed as 9 shifted (H*W, Cin) @ (Cin, 4*Cout) MXU matmuls — no
upsampled intermediate exists anywhere, and N is 4x wider.  The second
conv stays in the parity domain: a full-resolution 3x3 conv is exactly 9
small-offset matmuls with block-structured (4*Cout, 4*Cout) weights
(output parity q reads input parity p at small offset o iff
d = 2*o + p - q lands in {-1,0,1}, per spatial dim).  The shortcut
``proj1x1(up2(x))`` collapses to a single (H*W, Cin) @ (Cin, 4*Cout)
matmul against ``tile(wp, 4)`` because all four parity planes of
up2(x) equal x.  The one interleave left — parity channels back to
(B, 2H, 2W, Cout) — happens **outside** the kernels as an XLA
depth-to-space (transpose-copy), which Mosaic never sees.

HBM traffic per block: read x (stats) + read x (kernel A) + write y1p +
read y1p + read x (shortcut) + write out_p + depth-to-space read+write
= 3|x| + 2|y1| + 2|out|, versus the flax graph's ~|x| + 2|h_up| +
3|y1| + 2|x_up| + |out| — about 2.3x less on the traffic-dominant
64->128 block.  Batch-stat epilogue: kernel A accumulates per-channel
sum/sumsq of y1p in f32 scratch across the (sequential) grid and
flushes on the last program, so bn2's moments cost no second read.

Backward is a recompute-based custom VJP in plain XLA ops (residuals:
just x and params — *less* than the flax block's saved intermediates);
the D blocks stay on the flax path because the R1 penalty needs
second-order differentiation, which custom_vjp does not provide.

Used by ``models/blocks.py::FusedResidualGeneratorBlock`` via
``factories.g_block_factory(fused=True)``. STATUS (round 4): a
tests+docs-only NEGATIVE-RESULT baseline, not product surface — on
hardware it measures slower than the pure-XLA parity rewrite
(ops/parity.py; per-grid-program overhead at B=128 single-image
programs, plus a custom-VJP recompute backward XLA cannot fuse across)
and it cannot sit under the R1 second-order gradient. The former
``--fused-blocks`` CLI flag was dropped; bit-compatibility vs the flax
block stays pinned in interpret mode by ``tests/test_fused_gblock.py``
so the comparison in docs/PERF.md remains reproducible.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN_EPS = 1e-5


def _act(x, negative_slope=0.2):
    """leaky-relu(0.2) — what this codebase's 'relu' factory means
    (models/layers.py:24-27)."""
    return jnp.where(x >= 0, x, x * negative_slope)


def _act_from_f32(x32, dtype):
    """leaky-relu evaluated on the compute-dtype cast of ``x32`` (flax
    casts before the activation), with the sign test kept in f32 —
    Mosaic has no bf16 vector compare on this target."""
    xc = x32.astype(dtype)
    return jnp.where(x32 >= 0, xc, xc * jnp.asarray(0.2, dtype))


# --------------------------------------------------------------- weight packs
def _pack_w1_parity(w1):
    """(3, 3, Cin, Cout) -> (9, Cin, 4*Cout) upsample-conv parity weights.

    W1p[3*(oy+1) + (ox+1)][:, (2*qy+qx)*Cout:] sums the taps (dy, dx) of
    w1 that parity (qy, qx) reads at small-res offset (oy, ox):
    floor((q + d) / 2) == o per dimension.
    """
    cin, cout = w1.shape[2], w1.shape[3]
    out = jnp.zeros((9, cin, 4 * cout), w1.dtype)
    for qy in range(2):
        for qx in range(2):
            q = 2 * qy + qx
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    oy, ox = (qy + dy) >> 1, (qx + dx) >> 1
                    o = 3 * (oy + 1) + (ox + 1)
                    out = out.at[o, :, q * cout:(q + 1) * cout].add(
                        w1[dy + 1, dx + 1])
    return out


def _pack_w2_parity(w2):
    """(3, 3, Cout, Cout) -> (9, 4*Cout, 4*Cout) parity-domain weights
    for a full-resolution 3x3 conv over channel-stacked parity planes.

    Block (p -> q) of offset (oy, ox) is w2[1+dy, 1+dx] with
    d = 2*o + p - q per dimension, present iff both d land in {-1,0,1}.
    """
    cout = w2.shape[2]
    out = jnp.zeros((9, 4 * cout, 4 * cout), w2.dtype)
    for qy in range(2):
        for qx in range(2):
            q = 2 * qy + qx
            for py in range(2):
                for px in range(2):
                    p = 2 * py + px
                    for oy in range(-1, 2):
                        for ox in range(-1, 2):
                            dy, dx = 2 * oy + py - qy, 2 * ox + px - qx
                            if abs(dy) > 1 or abs(dx) > 1:
                                continue
                            o = 3 * (oy + 1) + (ox + 1)
                            out = out.at[
                                o,
                                p * cout:(p + 1) * cout,
                                q * cout:(q + 1) * cout,
                            ].set(w2[dy + 1, dx + 1])
    return out


def _group_taps(w, group, ngroups):
    """(9, K, N) per-tap weights -> (ngroups, group*K, N), zero-padding
    the last group, matching the channel-concatenated views the kernels
    feed each merged MXU dot."""
    if group == 1:
        return w
    k, n = w.shape[1], w.shape[2]
    pad = ngroups * group - 9
    w = jnp.concatenate([w, jnp.zeros((pad, k, n), w.dtype)], axis=0)
    return w.reshape(ngroups, group * k, n)


def depth_to_space_parity(y, cout):
    """(B, H, W, 4*Cout) parity channels -> (B, 2H, 2W, Cout), with the
    channel-block index being 2*qy + qx (row-parity major)."""
    b, h, w, _ = y.shape
    y = y.reshape(b, h, w, 2, 2, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, cout)


# ------------------------------------------------------------------- kernels
def _tap_group(k_single: int) -> int:
    """Taps to merge per MXU dot so the contraction dim fills a 128-lane
    pass: ceil(9*K/128) total passes instead of 9 (e.g. K=32 -> 3 dots of
    K<=128 instead of 9 dots at 25% K-occupancy)."""
    return max(1, 128 // max(1, k_single))


def _conv_taps(pad_ref, w_ref, cat_ref, hh, ww, cc, acc, ngroups, group):
    """Accumulate a 3x3-tap conv as ``ngroups`` MXU dots, merging
    ``group`` shifted views channel-wise through ``cat_ref`` so each dot
    contracts ~128 lanes. ``w_ref``: (ngroups, group*cc, N)."""
    for gidx in range(ngroups):
        taps = range(gidx * group, min(9, (gidx + 1) * group))
        if group == 1:
            (o,) = taps
            view = pad_ref[o // 3:o // 3 + hh, o % 3:o % 3 + ww, :]
            lhs = view
        else:
            for slot, o in enumerate(taps):
                cat_ref[:, :, slot * cc:(slot + 1) * cc] = (
                    pad_ref[o // 3:o // 3 + hh, o % 3:o % 3 + ww, :])
            if len(taps) < group:  # zero the unused tail slots once
                cat_ref[:, :, len(taps) * cc:] = jnp.zeros_like(
                    cat_ref[:, :, len(taps) * cc:])
            lhs = cat_ref[:]
        acc += jax.lax.dot_general(
            lhs, w_ref[gidx],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    return acc


def _kernel_a(x_ref, m1_ref, r1_ref, s1_ref, o1_ref, w1_ref, b1_ref,
              y1_ref, stats_ref, pad_ref, cat_ref, sacc_ref, *,
              ngroups, group):
    """Per-image: y1p = parity_conv1(act(bn1(x))) + b1; accumulate the
    per-channel sum/sumsq of y1p for bn2's batch stats."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    x = x_ref[0].astype(jnp.float32)                       # (H, W, Cin)
    hh, ww, cin = x.shape
    inv = jax.lax.rsqrt(r1_ref[:] + BN_EPS)
    h = (x - m1_ref[:]) * (inv * s1_ref[:]) + o1_ref[:]
    # flax NormAct casts to the compute dtype before the activation
    h = _act_from_f32(h, pad_ref.dtype)

    @pl.when(i == 0)
    def _():
        pad_ref[:] = jnp.zeros_like(pad_ref)
        sacc_ref[:] = jnp.zeros_like(sacc_ref)

    pad_ref[1:1 + hh, 1:1 + ww, :] = h
    acc = jnp.zeros((hh, ww, b1_ref.shape[-1]), jnp.float32)
    acc = _conv_taps(pad_ref, w1_ref, cat_ref, hh, ww, cin, acc,
                     ngroups, group)
    y1 = acc + b1_ref[:]
    # moments from the CAST value — flax's BatchNorm reduces the conv's
    # compute-dtype output, so bf16 rounding must land before the stats
    y1c = y1.astype(y1_ref.dtype)
    y1_ref[0] = y1c

    y1f = y1c.astype(jnp.float32)
    sacc_ref[0, :] += jnp.sum(y1f, axis=(0, 1))
    sacc_ref[1, :] += jnp.sum(y1f * y1f, axis=(0, 1))

    @pl.when(i == n - 1)
    def _():
        stats_ref[:] = sacc_ref[:]


def _kernel_b(y1_ref, x_ref, m2_ref, r2_ref, s2_ref, o2_ref, w2_ref,
              b2_ref, wp_ref, bp_ref, out_ref, pad_ref, cat_ref, *,
              ngroups, group):
    """Per-image: out_p = parity_conv2(act(bn2(y1p))) + b2
    + shortcut(x) — all in the parity domain."""
    y1 = y1_ref[0].astype(jnp.float32)                     # (H, W, 4*Cout)
    hh, ww, c4 = y1.shape
    i = pl.program_id(0)
    inv = jax.lax.rsqrt(r2_ref[:] + BN_EPS)
    h = (y1 - m2_ref[:]) * (inv * s2_ref[:]) + o2_ref[:]
    h = _act_from_f32(h, pad_ref.dtype)

    @pl.when(i == 0)
    def _():
        pad_ref[:] = jnp.zeros_like(pad_ref)

    pad_ref[1:1 + hh, 1:1 + ww, :] = h
    # shortcut: every parity plane of up2(x) is x itself, so the
    # projected shortcut is one matmul against tile(wp, 4)
    acc = jax.lax.dot_general(
        x_ref[0], wp_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc = _conv_taps(pad_ref, w2_ref, cat_ref, hh, ww, c4, acc,
                     ngroups, group)
    out = acc + b2_ref[:] + bp_ref[:]
    out_ref[0] = out.astype(out_ref.dtype)


def _moments(x):
    """Biased per-channel mean/var over all but the last axis, f32
    (flax nn.BatchNorm._compute_stats semantics)."""
    x32 = x.astype(jnp.float32)
    axes = tuple(range(x32.ndim - 1))
    mean = jnp.mean(x32, axis=axes)
    var = jnp.mean(jnp.square(x32), axis=axes) - jnp.square(mean)
    return mean, var


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_gblock_fwd_impl(x, params: dict, interpret: bool = False):
    """x: (B, H, W, Cin) -> (out (B, 2H, 2W, Cout), y1p, (m1, v1, m2, v2)).

    ``params``: w1 (3,3,Cin,Cout), b1, w2 (3,3,Cout,Cout), b2,
    wp (Cin,Cout), bp, s1/o1 (Cin), s2/o2 (Cout) — all f32.
    """
    b, hh, ww, cin = x.shape
    cout = params["w1"].shape[-1]
    cdtype = x.dtype

    m1, v1 = _moments(x)

    g1 = _tap_group(cin)
    ng1 = -(-9 // g1)
    w1p = _group_taps(_pack_w1_parity(params["w1"]), g1, ng1).astype(cdtype)
    b1p = jnp.tile(params["b1"], 4)
    cat1 = (hh, ww, g1 * cin) if g1 > 1 else (1, 1, 128)
    y1p, stats = pl.pallas_call(
        functools.partial(_kernel_a, ngroups=ng1, group=g1),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hh, ww, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=[
            pl.BlockSpec((1, hh, ww, 4 * cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hh, ww, 4 * cout), cdtype),
            jax.ShapeDtypeStruct((2, 4 * cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((hh + 2, ww + 2, cin), cdtype),
            pltpu.VMEM(cat1, cdtype),
            pltpu.VMEM((2, 4 * cout), jnp.float32),
        ],
        interpret=interpret,
    )(x, m1, v1, params["s1"], params["o1"], w1p, b1p)

    # bn2 stats: every spatial position of y1 appears exactly once among
    # the four parity channel blocks, so fold the parity axis back into
    # the reduction before finishing the moments
    npix = b * 4 * hh * ww
    s4 = stats.reshape(2, 4, cout)
    m2 = jnp.sum(s4[0], axis=0) / npix
    v2 = jnp.sum(s4[1], axis=0) / npix - jnp.square(m2)

    g2 = _tap_group(4 * cout)
    ng2 = -(-9 // g2)
    w2p = _group_taps(_pack_w2_parity(params["w2"]), g2, ng2).astype(cdtype)
    b2p = jnp.tile(params["b2"], 4)
    wpp = jnp.tile(params["wp"], (1, 4)).astype(cdtype)
    bpp = jnp.tile(params["bp"], 4)
    m2p, v2p = jnp.tile(m2, 4), jnp.tile(v2, 4)
    s2p, o2p = jnp.tile(params["s2"], 4), jnp.tile(params["o2"], 4)
    cat2 = (hh, ww, g2 * 4 * cout) if g2 > 1 else (1, 1, 128)
    out_p = pl.pallas_call(
        functools.partial(_kernel_b, ngroups=ng2, group=g2),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hh, ww, 4 * cout), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hh, ww, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 8,
        out_specs=pl.BlockSpec((1, hh, ww, 4 * cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hh, ww, 4 * cout), cdtype),
        scratch_shapes=[
            pltpu.VMEM((hh + 2, ww + 2, 4 * cout), cdtype),
            pltpu.VMEM(cat2, cdtype),
        ],
        interpret=interpret,
    )(y1p, x, m2p, v2p, s2p, o2p, w2p, b2p, wpp, bpp)

    out = depth_to_space_parity(out_p, cout)
    return out, y1p, (m1, v1, m2, v2)


# ------------------------------------------------------------- reference math
def _gblock_reference(x, params, stats=None):
    """Plain-jnp forward with identical semantics (used for the custom-VJP
    backward via jax.vjp, and as the CPU/test fallback). ``stats`` supplies
    (m1, v1, m2, v2) to skip the in-graph moment computation."""
    x32 = x.astype(jnp.float32)
    if stats is None:
        m1, v1 = _moments(x)
    else:
        m1, v1 = stats[0], stats[1]
    dt = x.dtype
    h = (x32 - m1) * jax.lax.rsqrt(v1 + BN_EPS) * params["s1"] + params["o1"]
    # flax NormAct casts to compute dtype BEFORE the activation
    h = _act(h.astype(dt))
    h_up = _up2_nhwc(h)
    # flax Conv promotes x/kernel/bias to the compute dtype and runs the
    # conv without preferred_element_type (MXU still accumulates f32)
    y1 = jax.lax.conv_general_dilated(
        h_up, params["w1"].astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b1"].astype(dt)
    if stats is None:
        m2, v2 = _moments(y1)
    else:
        m2, v2 = stats[2], stats[3]
    y1_32 = y1.astype(jnp.float32)
    h2 = (y1_32 - m2) * jax.lax.rsqrt(v2 + BN_EPS) * params["s2"] \
        + params["o2"]
    h2 = _act(h2.astype(dt))
    y2 = jax.lax.conv_general_dilated(
        h2, params["w2"].astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b2"].astype(dt)
    x_up = _up2_nhwc(x)
    sc = jax.lax.dot_general(
        x_up, params["wp"].astype(dt),
        dimension_numbers=(((3,), (0,)), ((), ())),
    ) + params["bp"].astype(dt)
    out = (y2 + sc).astype(dt)
    return out, (m1, v1, m2, v2)


def _up2_nhwc(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


# ------------------------------------------------------------ custom VJP
@jax.custom_vjp
def fused_gblock(x, params):
    """Fused forward on TPU, reference jnp elsewhere. Returns
    (out, (m1, v1, m2, v2)); the stats are for running-average updates and
    carry zero cotangent."""
    if jax.default_backend() == "tpu":
        out, _y1, stats = _fused_gblock_fwd_impl(x, params)
        return out, stats
    return _gblock_reference(x, params)


def _fused_gblock_fwd(x, params):
    if jax.default_backend() == "tpu":
        out, _y1, stats = _fused_gblock_fwd_impl(x, params)
        return (out, stats), (x, params)
    out, stats = _gblock_reference(x, params)
    return (out, stats), (x, params)


def _fused_gblock_bwd(res, cts):
    """Recompute-based backward: the flax block differentiates through the
    batch statistics (they depend on x), so the VJP re-runs the full
    stats-inclusive reference forward under jax.vjp."""
    x, params = res
    d_out, _d_stats = cts  # stats feed running averages only (zero ct)

    def f(x, params):
        out, _ = _gblock_reference(x, params)
        return out

    _, vjp = jax.vjp(f, x, params)
    dx, dparams = vjp(d_out)
    return dx, dparams


fused_gblock.defvjp(_fused_gblock_fwd, _fused_gblock_bwd)
