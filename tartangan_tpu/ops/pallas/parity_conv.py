"""Fused merged-tap parity convolution (Pallas/TPU), generator-side.

Round 4 measured the merged-tap 2x2 parity forms (ops/parity.py::
conv_parity2) LOSING 28% on the full step despite executing 2.25x fewer
MACs: XLA materializes the (H+1, W+1, 4*Cout) overproduced conv output
and the four per-parity realignment slices in HBM after every conv. This
kernel is the experiment VERDICT r4 next #3 prescribed: do the 2x2
merged-tap contraction AND the realignment inside one VMEM pass, so HBM
sees exactly one read of x and one write of the aligned parity stack.

Per grid program (a batch tile):
  1. load x (bt, H, W, Ci) -> pad spatially by 1 in VMEM,
  2. im2col the 2x2 window: concat the four shifted views along channels
     -> (bt, H+1, W+1, 4*Ci) so the whole conv is ONE dot_general with
     K = 4*Ci (>= 128 lanes at every tower width — better MXU fill than
     four K = Ci taps),
  3. accumulate in f32, then write output parity q = 2*qy + qx from the
     (qy, qx)-shifted (H, W) window of the accumulator — the realignment
     is a VMEM slice, never an HBM tensor.

Gradient: ``fused_parity_conv`` is a ``jax.custom_vjp`` whose backward is
the XLA VJP of the mathematically-identical 3x3-packed formulation (the
production default) — the backward pass is bit-for-bit the one the step
already runs, only the forward changes. One differentiation level only,
which is why this is wired to GENERATOR parity blocks alone: the R1
penalty differentiates D twice, and a custom_vjp cannot sit under a
second-order gradient (docs/PERF.md round 3; the D-side answer was the
parity rewrite itself, which is pure XLA).

Reference math preserved: blocks/generator.py:32-62 (conv over nearest-
up2) and the full-resolution conv of blocks/discriminator.py:49-95, in
their sub-pixel forms (ops/parity.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tests flip this to run the kernel in interpret mode on CPU.
_INTERPRET = False

# Estimated working set per program (x + im2col views + f32 accumulator
# chain + realigned concat + out). Hardware showed Mosaic's ACTUAL scoped
# vmem is ~3.8x this estimate (25.22 MB observed where the formula says
# 6.7 MB — relayout copies, double-buffered HBM<->VMEM blocks, live-range
# overlap), so the budget below is the 16 MB core limit divided by 4 with
# slack. Shapes whose single-image working set exceeds it return bt=0 and
# the op falls back to the 3x3-packed XLA form — spatially-tiled halo
# blocking could lift the cap but is not worth it per the measured A/B
# (docs/PERF.md round 5).
_VMEM_BUDGET = int(3.5 * 2 ** 20)


def _batch_tile(b, h, w, ci, co4):
    """Batch tile per program, or 0 when even one image cannot fit."""
    per_image = (
        2 * h * w * ci              # x (bf16)
        + 2 * (h + 1) * (w + 1) * 4 * ci  # im2col concat (4 padded views)
        + 8 * (h + 1) * (w + 1) * co4    # f32 accumulator + rolled copy
        + 4 * h * w * co4           # f32 realigned concat
        + 2 * h * w * co4           # out (bf16)
    )
    if per_image > _VMEM_BUDGET:
        return 0
    bt = max(1, _VMEM_BUDGET // per_image)
    while b % bt:
        bt -= 1
    return bt


def _make_kernel(interpret):
    """Kernel body, layout-legal for Mosaic.

    Two hardware constraints shape the code (both observed as compile
    errors on the v5e target):
      * ``tpu.concatenate`` refuses operands whose layout offsets differ
        on a non-concat dimension — so a slice starting at w-offset 1
        (sublane offset 1) can never be concatenated with an offset-0
        one. The im2col therefore builds its four window slots with
        ASYMMETRIC PADS of x (pads always produce offset-0 values)
        instead of shifted slices of one padded copy.
      * ``tpu.rotate`` only handles 32-bit data — so all realignment
        rolls happen on the f32 accumulator, and the single cast to the
        output dtype is the last thing before the store.
    """
    def _rollk(t, k, axis):
        """t shifted k steps: result[..., i, ...] = t[..., i+k, ...]."""
        if k == 0:
            return t
        if interpret:
            return jnp.roll(t, -k, axis=axis)
        # pltpu.roll wants a non-negative shift; size-k == -k (mod size)
        return pltpu.roll(t, t.shape[axis] - k, axis=axis)

    def _kernel(x_ref, w_ref, o_ref):
        x = x_ref[...]
        bt, h, w, ci = x.shape
        co4 = o_ref.shape[-1]
        co = co4 // 4
        # 2x2 im2col via pads: window slot (ay, ax) of output position u
        # (u in [0, H]) reads x[u + a - 1] == pad(x, (1-a, a))[u]
        xcat = jnp.concatenate(
            [jnp.pad(x, ((0, 0), (1 - ay, ay), (1 - ax, ax), (0, 0)))
             for ay in range(2) for ax in range(2)], axis=-1)
        wflat = w_ref[...].reshape(4 * ci, co4)
        acc = jax.lax.dot_general(
            xcat.reshape(bt * (h + 1) * (w + 1), 4 * ci), wflat,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(bt, h + 1, w + 1, co4)
        # realign: parity q = 2*qy + qx lives at spatial offset (qy, qx)
        # of the overproduced grid and channel block q*co:(q+1)*co.
        # f32 rolls bring every block to layout offset (0, 0) so the
        # final concat is legal; h-axis slices are untiled (free).
        accr = _rollk(acc, 1, 2)
        parts = []
        for qy in range(2):
            for qx in range(2):
                src = accr if qx else acc
                src = _rollk(src, (2 * qy + qx) * co, 3)
                parts.append(src[:, qy:qy + h, 0:w, 0:co])
        o_ref[...] = jnp.concatenate(parts, axis=-1).astype(o_ref.dtype)
    return _kernel


def _fused_conv_impl(x, w2, co4, interpret=False):
    """x: (B, H, W, Ci), w2: (2, 2, Ci, co4) merged-tap weights ->
    (B, H, W, co4) aligned parity stack (NO bias — added by the caller,
    where XLA fuses it into the consumer's prologue)."""
    b, h, w, ci = x.shape
    bt = _batch_tile(b, h, w, ci, co4)
    grid = (b // bt,)
    return pl.pallas_call(
        _make_kernel(interpret),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, h, w, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 2, ci, co4), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, h, w, co4), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co4), x.dtype),
        interpret=interpret,
    )(x, w2)


def _conv_same(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _reference_form(x, w_raw, b, cout, mode):
    """The production 3x3-packed XLA formulation — the function whose VJP
    defines this kernel's backward (identical math to the kernel)."""
    from ..parity import pack_full_conv, pack_up_conv
    pack = pack_up_conv if mode == "up" else pack_full_conv
    return _conv_same(x, pack(w_raw)) + jnp.tile(b, 4).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_parity_conv(x, w_raw, b, cout, mode):
    """Merged-tap parity conv with in-kernel realignment.

    ``mode='up'``: x is the standard small-res tensor (B, H, W, cin) and
    the result is conv3x3-over-nearest-up2 as a parity stack
    (== blocks._parity_up_conv). ``mode='full'``: x is parity-stacked
    (B, H, W, 4*cin) and the result is the full-resolution conv3x3
    (== blocks._parity_full_conv). ``w_raw`` is the block's raw
    (3, 3, cin, cout) kernel; ``b`` its (cout,) bias.
    """
    return _fused_fwd(x, w_raw, b, cout, mode)[0]


def _fused_fwd(x, w_raw, b, cout, mode):
    bsz, h, w, ci = x.shape
    if _batch_tile(bsz, h, w, ci, 4 * cout) == 0 and not _INTERPRET:
        # working set exceeds VMEM even per-image (large-spatial convs):
        # run the production 3x3-packed form — identical math
        y = _reference_form(x, w_raw, b, cout, mode)
        return y, (x, w_raw, b)
    from ..parity import pack_full_conv2, pack_up_conv2
    pack2 = pack_up_conv2 if mode == "up" else pack_full_conv2
    w2 = pack2(w_raw).astype(x.dtype)
    y = _fused_conv_impl(x, w2, 4 * cout, interpret=_INTERPRET)
    y = y + jnp.tile(b, 4).astype(x.dtype)
    return y, (x, w_raw, b)


def _fused_bwd(cout, mode, res, g):
    x, w_raw, b = res
    _, vjp = jax.vjp(
        lambda xx, ww, bb: _reference_form(xx, ww, bb, cout, mode),
        x, w_raw, b)
    return vjp(g)


fused_parity_conv.defvjp(_fused_fwd, _fused_bwd)


def available():
    """The kernel needs a real TPU (or interpret mode under tests)."""
    return _INTERPRET or jax.default_backend() == "tpu"
