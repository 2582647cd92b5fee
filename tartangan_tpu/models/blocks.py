"""Generator/discriminator building blocks (flax, NHWC / NLC).

Parity map (reference -> here):
- blocks/generator.py:9-29   GeneratorBlock
- blocks/generator.py:32-62  ResidualGeneratorBlock
- blocks/generator.py:65-98  GeneratorInputMLP / GeneratorInputMLP1d
- blocks/generator.py:101-112 TiledZGeneratorInput
- blocks/generator.py:115-129 GeneratorOutput
- blocks/discriminator.py:11-22  DiscriminatorInput
- blocks/discriminator.py:25-46  DiscriminatorBlock
- blocks/discriminator.py:49-95  ResidualDiscriminatorBlock
- blocks/discriminator.py:98-146 DiscriminatorPoolOnlyOutput / DiscriminatorOutput
- blocks/discriminator.py:149-178 IQNDiscriminatorOutput
- blocks/discriminator.py:181-230 MultiModelDiscriminatorOutput / LinearOutput /
  GaussianParametersOutput

Design notes (TPU-first, not a translation):
- NHWC layout; convs are ``lax.conv_general_dilated`` through flax — XLA
  fuses the pre-activation norm+act chains into the conv epilogues.
- All resampling is static-shape (ops/resize.py): nearest-2x up in G,
  align_corners bilinear 0.5x + avg-pool-2 down in D.
- Every block takes ``(x, train)`` so BatchNorm batch-stat threading is
  uniform under jit.

Known reference bug NOT replicated: the non-residual blocks normalize with
``out_dims`` before a conv whose input has ``in_dims`` channels
(generator.py:15-17), which crashes whenever in != out. We normalize the
tensor that is actually present.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import (
    avg_pool_2x,
    avg_pool_2x_1d,
    downsample_bilinear_half,
    resize_linear_1d,
    upsample_nearest_2x,
    upsample_nearest_2x_1d,
)
from .iqn import IQN, iqn_loss
from .layers import Conv, Dense, NormAct, activation_fn

Dtype = Any


def _ckpt(y):
    """Tag a main-path conv output for ``--remat-policy convs``: under
    ``jax.checkpoint_policies.save_only_these_names('block_conv')`` the
    tagged tensors are saved for the backward pass and only the cheap
    norm/act/resample chains between them are recomputed — a middle point
    between full remat (recompute everything, incl. the convs) and no
    remat. A no-op (stripped by XLA) when no remat policy references it."""
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(y, "block_conv")


def _upsample(x, ndim):
    return upsample_nearest_2x(x) if ndim == 2 else upsample_nearest_2x_1d(x)


def _avg_pool(x, ndim):
    return avg_pool_2x(x) if ndim == 2 else avg_pool_2x_1d(x)


def _shortcut_down(x, ndim):
    if ndim == 2:
        # bilinear 0.5x, align_corners=True (discriminator.py:55-57)
        return downsample_bilinear_half(x, align_corners=True)
    # text path: 'linear' 0.5x, align_corners=False (trainers/text_cnn.py:69-72)
    return resize_linear_1d(x, x.shape[1] // 2, align_corners=False)


class GeneratorBlock(nn.Module):
    """Non-residual pre-activation up block (generator.py:9-29)."""

    in_dims: int
    out_dims: int
    upsample: bool = True
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if self.upsample:
            x = _upsample(x, self.ndim)
        if not self.first_block:
            x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = Conv(self.out_dims, 3, in_features=self.in_dims,
                 dtype=self.dtype, ndim=self.ndim)(x)
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = Conv(self.out_dims, 3, in_features=self.out_dims,
                 dtype=self.dtype, ndim=self.ndim)(x)
        return x


class ResidualGeneratorBlock(nn.Module):
    """Pre-activation residual up block (generator.py:32-62).

    main: [norm,act,]conv3(in->out), norm, act, conv3(out->out)
    shortcut: 1x1 projection iff in != out; nearest-2x upsample applied to
    the block input before both paths.
    """

    in_dims: int
    out_dims: int
    upsample: bool = True
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        # TPU optimization: norm+act commute EXACTLY with nearest
        # upsampling (pointwise ops on repeated values; batch stats of the
        # repeated tensor equal those of the source), so apply them at the
        # small resolution — 4x less work and traffic for the normalize
        # pass (measured +2.2%, docs/PERF.md). Same values bit-for-bit
        # as the reference's upsample-first order (generator.py:56-62).
        if self.upsample and not self.first_block:
            h = NormAct(self.norm, self.activation, self.dtype)(x, train)
            h = _upsample(h, self.ndim)
            x = _upsample(x, self.ndim)
        else:
            if self.upsample:
                x = _upsample(x, self.ndim)
            h = x
            if not self.first_block:
                h = NormAct(self.norm, self.activation, self.dtype)(h, train)
        h = _ckpt(Conv(self.out_dims, 3, in_features=self.in_dims,
                       dtype=self.dtype, ndim=self.ndim)(h))
        h = NormAct(self.norm, self.activation, self.dtype)(h, train)
        h = _ckpt(Conv(self.out_dims, 3, in_features=self.out_dims,
                       dtype=self.dtype, ndim=self.ndim)(h))
        if self.in_dims != self.out_dims:
            x = Conv(self.out_dims, 1, in_features=self.in_dims,
                     dtype=self.dtype, ndim=self.ndim,
                     name="project_input")(x)
        return x + h


class FusedResidualGeneratorBlock(nn.Module):
    """ResidualGeneratorBlock computed by the fused Pallas kernels
    (ops/pallas/gblock.py) — identical math (reference generator.py:32-62
    via the norm-act-before-upsample reorder proven bit-exact in round 2),
    one VMEM pass per conv instead of HBM-materialized upsample/normalize
    tensors. Training-mode BN with two-pass batch stats (stats fused into
    kernel A's epilogue); eval mode normalizes with the running averages.

    Supports the production tower shape: upsample, not-first, BatchNorm,
    leaky-relu, 2-D. The factory falls back to the flax block elsewhere.
    Param layout is the fused block's own (conv1_*, bn1_*, project_*);
    ``tests/test_fused_gblock.py::flax_to_fused_params`` maps a flax
    block's tree onto it.
    """

    in_dims: int
    out_dims: int
    upsample: bool = True
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..ops.init import torch_bias_uniform, torch_kaiming_uniform
        from ..ops.pallas.gblock import _gblock_reference, fused_gblock
        assert (self.upsample and not self.first_block
                and self.norm == "bn" and self.activation == "relu"
                and self.ndim == 2), "fused block: unsupported configuration"
        cin, cout = self.in_dims, self.out_dims
        w1 = self.param("conv1_kernel", torch_kaiming_uniform,
                        (3, 3, cin, cout))
        b1 = self.param("conv1_bias", torch_bias_uniform(9 * cin), (cout,))
        w2 = self.param("conv2_kernel", torch_kaiming_uniform,
                        (3, 3, cout, cout))
        b2 = self.param("conv2_bias", torch_bias_uniform(9 * cout), (cout,))
        s1 = self.param("bn1_scale", nn.initializers.ones, (cin,))
        o1 = self.param("bn1_bias", nn.initializers.zeros, (cin,))
        s2 = self.param("bn2_scale", nn.initializers.ones, (cout,))
        o2 = self.param("bn2_bias", nn.initializers.zeros, (cout,))
        if cin != cout:
            wp = self.param("project_kernel", torch_kaiming_uniform,
                            (1, 1, cin, cout))[0, 0]
            bp = self.param("project_bias", torch_bias_uniform(cin), (cout,))
        else:  # identity shortcut expressed as I-projection (same math)
            wp = jnp.eye(cin, dtype=jnp.float32)
            bp = jnp.zeros((cout,), jnp.float32)
        import jax as _jax
        ra = {
            "bn1_mean": self.variable(
                "batch_stats", "bn1_mean",
                lambda: jnp.zeros((cin,), jnp.float32)),
            "bn1_var": self.variable(
                "batch_stats", "bn1_var",
                lambda: jnp.ones((cin,), jnp.float32)),
            "bn2_mean": self.variable(
                "batch_stats", "bn2_mean",
                lambda: jnp.zeros((cout,), jnp.float32)),
            "bn2_var": self.variable(
                "batch_stats", "bn2_var",
                lambda: jnp.ones((cout,), jnp.float32)),
        }
        params = {"w1": w1, "b1": b1, "w2": w2, "b2": b2, "wp": wp,
                  "bp": bp, "s1": s1, "o1": o1, "s2": s2, "o2": o2}
        if train:
            out, stats = fused_gblock(x.astype(self.dtype), params)
            m1, v1, m2, v2 = [_jax.lax.stop_gradient(s) for s in stats]
            if not self.is_initializing():
                # torch momentum-0.1 EMA, flax convention (layers.py:43)
                for name, batch in (("bn1_mean", m1), ("bn1_var", v1),
                                    ("bn2_mean", m2), ("bn2_var", v2)):
                    ra[name].value = 0.9 * ra[name].value + 0.1 * batch
        else:
            out, _ = _gblock_reference(
                x.astype(self.dtype), params,
                stats=(ra["bn1_mean"].value, ra["bn1_var"].value,
                       ra["bn2_mean"].value, ra["bn2_var"].value))
        return out.astype(self.dtype)


class _FoldedBNCore(nn.Module):
    """Plays ``nn.BatchNorm``'s role for a parity-stacked (B, H, W, 4*C)
    tensor: statistics are folded over the parity axis so they equal the
    full-resolution tensor's per-channel stats (ops/parity.py). Param and
    batch_stats names match ``nn.BatchNorm`` so checkpoints written by
    the flax blocks load unchanged."""

    features: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, xp, use_running_average: bool = False):
        from ..ops.parity import folded_moments
        import jax
        c = self.features
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            m, v = ra_mean.value, ra_var.value
        else:
            # gradients flow through the batch statistics, as in flax's
            # BatchNorm; the running-average writes are not differentiated
            m, v = folded_moments(xp, c)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * m)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * v)
        inv = jax.lax.rsqrt(v + self.epsilon) * scale
        t4 = lambda a: jnp.tile(a, 4)
        return xp.astype(jnp.float32) * t4(inv) + t4(bias - m * inv)


class _FoldedBNWrap(nn.Module):
    """Name shim matching ``layers.BatchNorm`` (which nests the flax
    BatchNorm one level deep), so the param path is
    ``NormAct_k/BatchNorm_0/BatchNorm_0/...`` either way."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, use_running_average: bool = False):
        y = _FoldedBNCore(self.features, name="BatchNorm_0")(
            xp, use_running_average)
        return y.astype(self.dtype)


class _ParityNormAct(nn.Module):
    """NormAct over parity-stacked channels (folded statistics)."""

    features: int
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, train: bool = True):
        if self.norm == "bn":
            xp = _FoldedBNWrap(self.features, dtype=self.dtype,
                               name="BatchNorm_0")(
                xp, use_running_average=not train)
        elif self.norm != "id":
            raise ValueError(f"unknown norm '{self.norm}'")
        return activation_fn(self.activation)(xp)


class _ConvParams(nn.Module):
    """Bare conv parameters with ``layers.Conv``'s names, shapes and
    torch-default init — the parity blocks consume the kernel through a
    weight-packing transform instead of applying it directly."""

    kshape: Tuple[int, ...]
    fan_in: int

    @nn.compact
    def __call__(self):
        from ..ops.init import torch_bias_uniform, torch_kaiming_uniform
        kernel = self.param("kernel", torch_kaiming_uniform, self.kshape)
        bias = self.param("bias", torch_bias_uniform(self.fan_in),
                          (self.kshape[-1],))
        return kernel, bias


def _conv_same(x, w, b=None):
    import jax
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _conv_down2_pad1(x, w, b=None):
    """Stride-2 conv with padding ((1,1),(1,1)) — the parity-domain form
    of conv+avgpool with parity-stacked output (pack_down_parity_conv:
    output parity index j reads input parity window 2j-1 .. 2j+2)."""
    import jax
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _parity_up_conv(h, w1, b1, cout, fused=False):
    """G parity block conv1 (= conv3x3 over nearest-up2), honoring
    ``ops.parity.MERGED_TAP`` (2x2 merged-tap vs 3x3 packed form).
    ``fused=True`` (G blocks under ``ops.parity.FUSED_G``) routes to the
    Pallas merged-tap kernel with in-kernel realignment."""
    from ..ops import parity as P
    if fused:
        from ..ops.pallas.parity_conv import available, fused_parity_conv
        if available():
            return fused_parity_conv(h, w1, b1, cout, "up")
    if P.MERGED_TAP:
        return P.conv_parity2(h, P.pack_up_conv2(w1), cout,
                              jnp.tile(b1, 4))
    return _conv_same(h, P.pack_up_conv(w1), jnp.tile(b1, 4))


def _parity_full_conv(h, w, b, cout, fused=False):
    """Full-resolution conv3x3 over a parity stack, honoring
    ``ops.parity.MERGED_TAP`` and the G-side fused kernel (see
    ``_parity_up_conv``)."""
    from ..ops import parity as P
    if fused:
        from ..ops.pallas.parity_conv import available, fused_parity_conv
        if available():
            return fused_parity_conv(h, w, b, cout, "full")
    if P.MERGED_TAP:
        return P.conv_parity2(h, P.pack_full_conv2(w), cout,
                              jnp.tile(b, 4))
    return _conv_same(h, P.pack_full_conv(w), jnp.tile(b, 4))


class ParityResidualGeneratorBlock(nn.Module):
    """``ResidualGeneratorBlock`` computed in the parity (sub-pixel)
    domain — identical math (reference generator.py:32-62), rewritten so
    every conv fills the MXU's 128-lane tiles at tower widths:
    ``conv1(up2(h))`` becomes a small-resolution conv with 4x the
    output channels (ops/parity.py::pack_up_conv; the upsampled
    intermediate never exists), conv2 runs channel-stacked
    (pack_full_conv), and one depth-to-space at the block boundary
    restores standard layout. Both convs honor ``ops.parity.MERGED_TAP``
    (a measured-slower 2x2 alternative, off by default — see
    ops/parity.py). Pure jnp/lax — XLA differentiates
    through it (R1-safe), unlike the Pallas custom-VJP transcription
    (ops/pallas/gblock.py), which measures slower (per-grid-program
    overhead; docs/PERF.md round 3).

    Param tree is identical to the flax block (NormAct_0/Conv_0/
    NormAct_1/Conv_1/project_input), so checkpoints interoperate.
    Supported shape: upsample, not-first, 2-D, norm in {bn, id}.

    ``emit_parity=True`` (set by ``Generator.setup`` on the LAST tower
    block when a ``ParityGeneratorOutput`` follows) returns the
    (B, H, W, 4*out) parity-stacked tensor instead of depth-to-spacing
    back to standard layout — the output stage consumes it directly and
    the full-resolution pre-output tensor never exists.
    """

    in_dims: int
    out_dims: int
    upsample: bool = True
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32
    emit_parity: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..ops.parity import depth_to_space
        assert (self.upsample and not self.first_block
                and self.ndim == 2), "parity G block: unsupported shape"
        cin, cout = self.in_dims, self.out_dims
        # norm+act commute with nearest upsampling (see the flax block's
        # reorder note); here the upsample itself is folded into conv1
        h = NormAct(self.norm, self.activation, self.dtype,
                    name="NormAct_0")(x, train)
        from ..ops import parity as P
        w1, b1 = _ConvParams((3, 3, cin, cout), 9 * cin, name="Conv_0")()
        y1p = _ckpt(_parity_up_conv(h, w1, b1, cout, fused=P.FUSED_G))
        h2 = _ParityNormAct(cout, self.norm, self.activation, self.dtype,
                            name="NormAct_1")(y1p, train)
        h2 = h2.astype(self.dtype)
        w2, b2 = _ConvParams((3, 3, cout, cout), 9 * cout, name="Conv_1")()
        y2p = _ckpt(_parity_full_conv(h2, w2, b2, cout, fused=P.FUSED_G))
        if cin != cout:
            wp, bp = _ConvParams((1, 1, cin, cout), cin,
                                 name="project_input")()
            scp = _conv_same(x, jnp.tile(wp[0, 0], (1, 4))[None, None],
                             jnp.tile(bp, 4))
        else:
            # identity shortcut: all four parity planes of up2(x) are x
            scp = jnp.concatenate([x] * 4, axis=-1)
        yp = y2p + scp
        if self.emit_parity:
            return yp
        return depth_to_space(yp, cout)


class ParityResidualDiscriminatorBlock(nn.Module):
    """``ResidualDiscriminatorBlock`` in the space-to-depth domain
    (reference discriminator.py:49-95): both full-resolution convs run
    over channel-stacked parity planes (4x the contraction lanes; conv1
    via pack_full_conv, honoring ``ops.parity.MERGED_TAP``), and
    the trailing avg-pool is folded into conv2's weights
    (ops/parity.py::pack_down_conv) so the block emits half resolution
    in standard layout directly. Pure jnp/lax, so the R1 second-order
    gradient works through it.

    ``accept_parity=True`` (set by ``Discriminator.setup`` on the FIRST
    block when a ``ParityDiscriminatorInput`` precedes it, and on any
    block following an ``emit_parity`` one) takes the input already
    parity-stacked: the block skips its own space-to-depth, and the
    bilinear shortcut samples the full-res signal directly from the
    parity planes (ops/resize.py::downsample_bilinear_half_parity) — the
    full-resolution feature tensor never exists.

    ``emit_parity=True`` (set by ``Discriminator.setup`` when the NEXT
    tower block is also a parity block) keeps the OUTPUT parity-stacked:
    conv2+avgpool run as one stride-2 conv with
    ``pack_down_parity_conv`` weights (N = 4*out lanes instead of
    ``pack_down_conv``'s quarter-filled N = out — 2.25x less MXU-pass
    work), and the shortcut downsamples parity-to-parity; the
    standard-layout half-resolution tensor never materializes.

    Param tree matches the flax block; checkpoints interoperate.
    """

    in_dims: int
    out_dims: int
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32
    accept_parity: bool = False
    emit_parity: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        from ..ops.parity import pack_down_conv, space_to_depth
        assert self.ndim == 2, "parity D block: 2-D only"
        cin, cout = self.in_dims, self.out_dims
        h = x
        if not self.first_block:
            if self.accept_parity:
                h = _ParityNormAct(cin, self.norm, self.activation,
                                   self.dtype, name="NormAct_0")(h, train)
                h = h.astype(self.dtype)
            else:
                h = NormAct(self.norm, self.activation, self.dtype,
                            name="NormAct_0")(h, train)
        hp = h if self.accept_parity else space_to_depth(h)
        w1, b1 = _ConvParams((3, 3, cin, cout), 9 * cin, name="Conv_0")()
        y1p = _ckpt(_parity_full_conv(hp, w1, b1, cout))
        h2 = _ParityNormAct(cout, self.norm, self.activation, self.dtype,
                            name="NormAct_0" if self.first_block
                            else "NormAct_1")(y1p, train)
        h2 = h2.astype(self.dtype)
        w2, b2 = _ConvParams((3, 3, cout, cout), 9 * cout, name="Conv_1")()
        if self.emit_parity:
            from ..ops.parity import pack_down_parity_conv, pack_point_conv
            # conv2+pool emitting s=2 parity of the half resolution
            y2 = _ckpt(_conv_down2_pad1(h2, pack_down_parity_conv(w2),
                                        jnp.tile(b2, 4)))
            if self.accept_parity:
                from ..ops.resize import (
                    downsample_bilinear_half_parity_to_parity,
                )
                x_sc = downsample_bilinear_half_parity_to_parity(
                    x, cin, align_corners=True)
            else:
                x_sc = space_to_depth(_shortcut_down(x, self.ndim))
            if cin != cout:
                wp, bp = _ConvParams((1, 1, cin, cout), cin,
                                     name="project_input")()
                x_sc = _conv_same(x_sc, pack_point_conv(wp),
                                  jnp.tile(bp, 4))
            return x_sc + y2
        y2 = _ckpt(_conv_same(h2, pack_down_conv(w2), b2))  # half res, std
        if self.accept_parity:
            from ..ops.resize import downsample_bilinear_half_parity
            x_sc = downsample_bilinear_half_parity(x, cin,
                                                   align_corners=True)
        else:
            x_sc = _shortcut_down(x, self.ndim)
        if cin != cout:
            x_sc = Conv(cout, 1, in_features=cin, dtype=self.dtype,
                        ndim=self.ndim, name="project_input")(x_sc)
        return x_sc + y2


class GeneratorInputMLP(nn.Module):
    """latent -> act(Linear) -> (B, size, size, out) (generator.py:65-80)."""

    latent_dims: int
    output_dims: int
    size: int = 4
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        del train
        base = Dense(self.size ** 2 * self.output_dims,
                     in_features=self.latent_dims, dtype=self.dtype)(z)
        base = activation_fn(self.activation)(base)
        return base.reshape(-1, self.size, self.size, self.output_dims)


class GeneratorInputMLP1d(nn.Module):
    """latent -> act(Linear) -> (B, size, out) (generator.py:83-98)."""

    latent_dims: int
    output_dims: int
    size: int = 4
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z, train: bool = True):
        del train
        base = Dense(self.size * self.output_dims,
                     in_features=self.latent_dims, dtype=self.dtype)(z)
        base = activation_fn(self.activation)(base)
        return base.reshape(-1, self.size, self.output_dims)


class TiledZGeneratorInput(nn.Module):
    """Tile z to a (B, size, size, latent) map (generator.py:101-112)."""

    latent_dims: int
    output_dims: int
    size: int = 4
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    def __call__(self, z, train: bool = True):
        del train
        assert self.latent_dims == self.output_dims
        z = z.astype(self.dtype)
        return jnp.broadcast_to(
            z[:, None, None, :],
            (z.shape[0], self.size, self.size, z.shape[-1]),
        )


class GeneratorOutput(nn.Module):
    """norm -> act -> 1x1 conv -> tanh (generator.py:115-129)."""

    in_dims: int
    out_dims: int
    norm: str = "bn"
    activation: str = "relu"
    output_activation: str = "tanh"  # 'tanh' | 'id'
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = Conv(self.out_dims, 1, in_features=self.in_dims,
                 dtype=self.dtype, ndim=self.ndim)(x)
        if self.output_activation == "tanh":
            x = jnp.tanh(x)
        return x


class ParityGeneratorOutput(nn.Module):
    """``GeneratorOutput`` computed over a parity-stacked (B, H, W, 4*in)
    tensor (same math as generator.py:115-129): folded-statistics
    norm+act, a block-diagonal 1x1 conv (ops/parity.py::pack_point_conv
    — 4x the MXU lanes of the full-resolution K=in_dims, N=data_dims
    matmul), tanh on parity planes (pointwise, commutes with the layout
    restore), then ONE depth-to-space over ``out_dims`` channels instead
    of the tower's ``in_dims`` — the full-resolution pre-output tensor
    never materializes. Param tree matches ``GeneratorOutput``
    (NormAct_0/Conv_0), so checkpoints interoperate; ``Generator.setup``
    swaps this in when the last tower block is a parity block.
    """

    in_dims: int
    out_dims: int
    norm: str = "bn"
    activation: str = "relu"
    output_activation: str = "tanh"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, xp, train: bool = True):
        from ..ops.parity import depth_to_space, pack_point_conv
        assert self.ndim == 2, "parity G output: 2-D only"
        xp = _ParityNormAct(self.in_dims, self.norm, self.activation,
                            self.dtype, name="NormAct_0")(xp, train)
        xp = xp.astype(self.dtype)
        w, b = _ConvParams((1, 1, self.in_dims, self.out_dims),
                           self.in_dims, name="Conv_0")()
        yp = _conv_same(xp, pack_point_conv(w), jnp.tile(b, 4))
        if self.output_activation == "tanh":
            yp = jnp.tanh(yp)
        return depth_to_space(yp, self.out_dims)


class DiscriminatorInput(nn.Module):
    """1x1 conv image->features (discriminator.py:11-22)."""

    in_dims: int
    out_dims: int
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        return Conv(self.out_dims, 1, in_features=self.in_dims,
                    dtype=self.dtype, ndim=self.ndim)(x.astype(self.dtype))


class ParityDiscriminatorInput(nn.Module):
    """``DiscriminatorInput`` (1x1 conv image->features,
    discriminator.py:11-22) computed in the space-to-depth domain: the
    image parity-stacks FIRST (a 3-channel transpose, the cheapest
    tensor in the model), then the block-diagonal 1x1
    (ops/parity.py::pack_point_conv) contracts K=4*data_dims into
    N=4*out_dims — versus the full-resolution form's K=3, N=16, the
    single worst MXU fill in the discriminator. Emits parity layout for
    the first tower block (``accept_parity``); the full-resolution
    feature tensor never exists. Param tree matches
    ``DiscriminatorInput`` (Conv_0), so checkpoints interoperate;
    ``Discriminator.setup`` swaps this in.
    """

    in_dims: int
    out_dims: int
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        from ..ops.parity import pack_point_conv, space_to_depth
        assert self.ndim == 2, "parity D input: 2-D only"
        xp = space_to_depth(x.astype(self.dtype))
        w, b = _ConvParams((1, 1, self.in_dims, self.out_dims),
                           self.in_dims, name="Conv_0")()
        return _conv_same(xp, pack_point_conv(w), jnp.tile(b, 4))


class DiscriminatorBlock(nn.Module):
    """Non-residual pre-activation down block (discriminator.py:25-46)."""

    in_dims: int
    out_dims: int
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        if not self.first_block:
            x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = Conv(self.out_dims, 3, in_features=self.in_dims,
                 dtype=self.dtype, ndim=self.ndim)(x)
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = Conv(self.out_dims, 3, in_features=self.out_dims,
                 dtype=self.dtype, ndim=self.ndim)(x)
        return _avg_pool(x, self.ndim)


class ResidualDiscriminatorBlock(nn.Module):
    """Pre-activation residual down block (discriminator.py:49-95).

    main: [norm,act,]conv3(in->out), norm, act, conv3(out->out), avgpool2
    shortcut: bilinear 0.5x (align_corners=True), 1x1 projection iff in != out
    """

    in_dims: int
    out_dims: int
    first_block: bool = False
    norm: str = "bn"
    activation: str = "relu"
    ndim: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = x
        if not self.first_block:
            h = NormAct(self.norm, self.activation, self.dtype)(h, train)
        h = _ckpt(Conv(self.out_dims, 3, in_features=self.in_dims,
                       dtype=self.dtype, ndim=self.ndim)(h))
        h = NormAct(self.norm, self.activation, self.dtype)(h, train)
        h = _ckpt(Conv(self.out_dims, 3, in_features=self.out_dims,
                       dtype=self.dtype, ndim=self.ndim)(h))
        h = _avg_pool(h, self.ndim)
        x = _shortcut_down(x, self.ndim)
        if self.in_dims != self.out_dims:
            x = Conv(self.out_dims, 1, in_features=self.in_dims,
                     dtype=self.dtype, ndim=self.ndim,
                     name="project_input")(x)
        return x + h


def _sum_pool(x):
    """Sum over all spatial axes, keep (B, C)."""
    axes = tuple(range(1, x.ndim - 1))
    return jnp.sum(x, axis=axes)


class DiscriminatorOutput(nn.Module):
    """norm -> act -> spatial sum-pool -> Linear (discriminator.py:126-146)."""

    in_dims: int
    out_dims: int
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        x = _sum_pool(x)
        return Dense(self.out_dims, in_features=self.in_dims,
                     dtype=self.dtype)(x)


class DiscriminatorPoolOnlyOutput(nn.Module):
    """norm -> act -> 1x1/4x4 conv -> avg/sum pool (discriminator.py:98-123)."""

    in_dims: int
    out_dims: int
    pool: str = "sum"  # 'sum' | 'avg' | 'conv'
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        kernel = 4 if self.pool == "conv" else 1
        feats = Conv(self.out_dims, kernel, in_features=self.in_dims,
                     dtype=self.dtype)(x)
        if self.pool == "avg":
            return jnp.mean(feats, axis=(1, 2))
        if self.pool == "sum":
            return jnp.sum(feats, axis=(1, 2, 3))[..., None]
        if self.pool == "conv":
            return feats
        raise ValueError(f"no pooling method named '{self.pool}'")


class IQNDiscriminatorOutput(nn.Module):
    """IQN head: sum-pool feats, mix with tau embedding, per-quantile linear
    output; computes the quantile-Huber loss in-graph when targets are given
    (discriminator.py:149-178). The whole head lives inside the jitted step.
    """

    in_dims: int
    out_dims: int
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True, targets=None, rng=None):
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        feats = _sum_pool(x)  # (B, F)
        if rng is None:
            rng = self.make_rng("iqn")
        feats_tau, taus = IQN(self.in_dims, dtype=self.dtype)(feats, rng)
        p_target_tau = Dense(self.out_dims, in_features=self.in_dims,
                             dtype=self.dtype, name="to_output")(feats_tau)
        num_quantiles = feats_tau.shape[0] // feats.shape[0]
        p_target = p_target_tau.reshape(
            num_quantiles, -1, self.out_dims).mean(axis=0)
        if targets is not None:
            taus_r = jnp.tile(taus, (1, self.out_dims))
            loss = iqn_loss(p_target_tau, targets, taus_r)
            return p_target, loss
        return p_target


class LinearOutput(nn.Module):
    """Plain linear head (discriminator.py:204-213)."""

    in_dims: int
    out_dims: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return Dense(self.out_dims, in_features=self.in_dims,
                     dtype=self.dtype)(x)


class GaussianParametersOutput(nn.Module):
    """Linear -> act -> Linear -> (mu, log_sigma) (discriminator.py:216-230)."""

    in_dims: int
    out_dims: int
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = Dense(self.in_dims, in_features=self.in_dims, dtype=self.dtype)(x)
        h = activation_fn(self.activation)(h)
        h = Dense(2 * self.out_dims, in_features=self.in_dims,
                  dtype=self.dtype)(h)
        return h[:, :self.out_dims], h[:, self.out_dims:]


class MultiModelDiscriminatorOutput(nn.Module):
    """Shared norm/act/sum-pool trunk feeding several output heads
    (discriminator.py:181-201); used by the InfoGAN trainer.
    ``head_factories`` maps (in_dims, dtype) -> nn.Module.
    """

    in_dims: int
    head_factories: Tuple[Callable, ...] = ()
    norm: str = "bn"
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = NormAct(self.norm, self.activation, self.dtype)(x, train)
        feats = _sum_pool(x)
        return [factory(self.in_dims, self.dtype)(feats)
                for factory in self.head_factories]
