"""Parity (sub-pixel / space-to-depth) block rewrites vs the flax blocks.

The parity blocks recompose the same math with pre-packed weights
(ops/parity.py), so forward values, gradients, running-stat updates, and
the R1 second-order gradient must all agree with the flax blocks to fp
round-off in f32. Param trees are identical by construction — the tests
apply the FLAX-initialized params to the parity module directly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.models.blocks import (
    ParityResidualDiscriminatorBlock,
    ParityResidualGeneratorBlock,
    ResidualDiscriminatorBlock,
    ResidualGeneratorBlock,
)
from tartangan_tpu.ops.parity import (
    depth_to_space,
    folded_moments,
    pack_down_conv,
    pack_full_conv,
    pack_up_conv,
    space_to_depth,
)

CIN, COUT, H, B = 24, 16, 8, 4


import contextlib


@contextlib.contextmanager
def _x64_flag():
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


# ---------------------------------------------------------------- op algebra
def test_space_depth_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 10, 5)), jnp.float32)
    assert np.array_equal(np.asarray(depth_to_space(space_to_depth(x), 5)),
                          np.asarray(x))


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _up2(x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def test_pack_up_conv_identity(rng):
    """conv3x3(up2(h), w) == d2s(conv3x3(h, pack_up(w))) incl borders."""
    h = jnp.asarray(rng.standard_normal((2, 7, 9, CIN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)), jnp.float32)
    ref = _conv(_up2(h), w)
    out = depth_to_space(_conv(h, pack_up_conv(w)), COUT)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pack_full_conv_identity(rng):
    """conv3x3(x, w) == d2s(conv3x3(s2d(x), pack_full(w)))."""
    x = jnp.asarray(rng.standard_normal((2, 12, 8, CIN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)), jnp.float32)
    ref = _conv(x, w)
    out = depth_to_space(_conv(space_to_depth(x), pack_full_conv(w)), COUT)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pack_up_conv2_identity(rng):
    """Merged-tap 2x2 form == the 3x3 sub-pixel packing (the
    structural-zero taps the 2x2 kernel drops contribute nothing;
    summation order differs, so fp round-off tolerance)."""
    from tartangan_tpu.ops.parity import conv_parity2, pack_up_conv2
    h = jnp.asarray(rng.standard_normal((2, 7, 9, CIN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((COUT,)), jnp.float32)
    ref = _conv(h, pack_up_conv(w)) + jnp.tile(b, 4)
    out = conv_parity2(h, pack_up_conv2(w), COUT, jnp.tile(b, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_pack_full_conv2_identity(rng):
    """Merged-tap 2x2 form == the 3x3 parity-plane packing."""
    from tartangan_tpu.ops.parity import conv_parity2, pack_full_conv2
    x = jnp.asarray(rng.standard_normal((2, 12, 8, CIN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((COUT,)), jnp.float32)
    xp = space_to_depth(x)
    ref = _conv(xp, pack_full_conv(w)) + jnp.tile(b, 4)
    out = conv_parity2(xp, pack_full_conv2(w), COUT, jnp.tile(b, 4))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_pack_conv2_grads_match(rng):
    """d/dw and d/dx of the 2x2 forms == the 3x3 forms (the parity
    blocks differentiate through the packing under jit and R1)."""
    from tartangan_tpu.ops.parity import (
        conv_parity2,
        pack_full_conv2,
        pack_up_conv2,
    )
    x = jnp.asarray(rng.standard_normal((2, 6, 6, CIN)), jnp.float32)
    xp = space_to_depth(jnp.asarray(
        rng.standard_normal((2, 12, 12, CIN)), jnp.float32))
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)), jnp.float32)

    for inp, pack3, pack2 in (
            (x, pack_up_conv, pack_up_conv2),
            (xp, pack_full_conv, pack_full_conv2)):
        f3 = jax.jit(lambda a, k, p3=pack3: jnp.sum(
            jnp.cos(_conv(a, p3(k)))))
        f2 = jax.jit(lambda a, k, p2=pack2: jnp.sum(
            jnp.cos(conv_parity2(a, p2(k), COUT))))
        g3 = jax.grad(f3, argnums=(0, 1))(inp, w)
        g2 = jax.grad(f2, argnums=(0, 1))(inp, w)
        for a, b_ in zip(g3, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=2e-4)


def test_pack_down_conv_identity(rng):
    """avgpool2(conv3x3(x, w)) == conv3x3(s2d(x), pack_down(w))."""
    from tartangan_tpu.ops.resize import avg_pool_2x
    x = jnp.asarray(rng.standard_normal((2, 12, 8, CIN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)), jnp.float32)
    ref = avg_pool_2x(_conv(x, w))
    out = _conv(space_to_depth(x), pack_down_conv(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pack_down_parity_conv_identity(rng):
    """s2d(avgpool2(conv3x3(x, w))) == stride-2 conv of s2d(x) with
    pack_down_parity(w) — the parity-emitting D conv2 (round 4)."""
    from tartangan_tpu.models.blocks import _conv_down2_pad1
    from tartangan_tpu.ops.parity import pack_down_parity_conv
    from tartangan_tpu.ops.resize import avg_pool_2x
    x = jnp.asarray(rng.standard_normal((2, 16, 8, CIN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)), jnp.float32)
    ref = space_to_depth(avg_pool_2x(_conv(x, w)))
    out = _conv_down2_pad1(space_to_depth(x), pack_down_parity_conv(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_downsample_bilinear_half_parity_to_parity(rng):
    """Parity-to-parity bilinear 0.5x == s2d(bilinear 0.5x of the
    restored full-res tensor) — the emit_parity D shortcut (round 4)."""
    from tartangan_tpu.ops.resize import (
        downsample_bilinear_half,
        downsample_bilinear_half_parity_to_parity,
    )
    x = jnp.asarray(rng.standard_normal((2, 16, 8, 5)), jnp.float32)
    xp = space_to_depth(x)
    for ac in (True, False):
        ref = space_to_depth(downsample_bilinear_half(x, align_corners=ac))
        out = downsample_bilinear_half_parity_to_parity(
            xp, 5, align_corners=ac)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def test_folded_moments_match_full_res(rng):
    x = jnp.asarray(rng.standard_normal((3, 6, 6, COUT)), jnp.float32)
    xp = space_to_depth(x)
    m, v = folded_moments(xp, COUT)
    np.testing.assert_allclose(np.asarray(m),
                               np.asarray(jnp.mean(x, axis=(0, 1, 2))),
                               rtol=1e-5, atol=1e-6)
    ref_v = jnp.mean(jnp.square(x), axis=(0, 1, 2)) - jnp.square(
        jnp.mean(x, axis=(0, 1, 2)))
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref_v),
                               rtol=1e-4, atol=1e-5)


# ------------------------------------------------------------------ G block
@pytest.fixture()
def g_pair(rng):
    x = jnp.asarray(rng.standard_normal((B, H, H, CIN)), jnp.float32)
    flax_block = ResidualGeneratorBlock(CIN, COUT)
    flax_vars = flax_block.init(jax.random.PRNGKey(0), x, train=True)
    return x, flax_block, flax_vars


def test_g_block_forward_and_stats(g_pair):
    x, flax_block, flax_vars = g_pair
    ref, ref_state = flax_block.apply(flax_vars, x, train=True,
                                      mutable=["batch_stats"])
    pblock = ParityResidualGeneratorBlock(CIN, COUT)
    pvars = pblock.init(jax.random.PRNGKey(1), x, train=True)
    assert (jax.tree_util.tree_structure(pvars)
            == jax.tree_util.tree_structure(flax_vars)), "param tree drift"
    out, state = pblock.apply(flax_vars, x, train=True,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_state)
    got = dict(jax.tree_util.tree_leaves_with_path(state))
    for path, leaf in ref_flat:
        np.testing.assert_allclose(np.asarray(got[path]), np.asarray(leaf),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_g_block_eval_mode(g_pair):
    x, flax_block, flax_vars = g_pair
    _, st = flax_block.apply(flax_vars, x, train=True,
                             mutable=["batch_stats"])
    merged = {"params": flax_vars["params"], **st}
    ref = flax_block.apply(merged, x, train=False)
    out = ParityResidualGeneratorBlock(CIN, COUT).apply(merged, x,
                                                        train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_g_block_grads(g_pair):
    x, flax_block, flax_vars = g_pair
    pblock = ParityResidualGeneratorBlock(CIN, COUT)

    def loss(block):
        def f(params, x):
            out, _ = block.apply(
                {"params": params,
                 "batch_stats": flax_vars["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return f

    gf_p, gf_x = jax.jit(jax.grad(loss(flax_block), argnums=(0, 1)))(
        flax_vars["params"], x)
    gp_p, gp_x = jax.jit(jax.grad(loss(pblock), argnums=(0, 1)))(
        flax_vars["params"], x)
    # f32 tolerance is reassociation-limited (the packing reorders the
    # pixel reductions); bias grads nearly cancel (sums over batch+space)
    # so atol rides the GLOBAL gradient scale. test_g_block_grads_f64
    # pins the math itself.
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gf_x),
                               rtol=2e-3, atol=1e-3)
    gmax = max(float(np.max(np.abs(np.asarray(leaf))))
               for leaf in jax.tree_util.tree_leaves(gf_p))
    for path_leaf, ref_leaf in zip(
            jax.tree_util.tree_leaves_with_path(gp_p),
            jax.tree_util.tree_leaves(gf_p)):
        np.testing.assert_allclose(
            np.asarray(path_leaf[1]), np.asarray(ref_leaf),
            rtol=2e-3, atol=2e-4 * gmax,
            err_msg=jax.tree_util.keystr(path_leaf[0]))


def test_g_block_grads_f64(rng):
    """With norm='id' (no BatchNorm, which is pinned to f32 compute in
    both paths) the f64 grads agree to ~1e-12 — the f32 deltas in
    test_g_block_grads are pure accumulation-order rounding, not math."""
    with _x64_flag():
        x = jnp.asarray(rng.standard_normal((2, 6, 6, CIN)), jnp.float64)
        fblock = ResidualGeneratorBlock(CIN, COUT, norm="id",
                                        dtype=jnp.float64)
        fvars = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64),
            fblock.init(jax.random.PRNGKey(0), x, train=True))
        pblock = ParityResidualGeneratorBlock(CIN, COUT, norm="id",
                                              dtype=jnp.float64)

        def loss(block):
            def f(params):
                out = block.apply({"params": params}, x, train=True)
                return jnp.sum(out ** 2)
            return f

        gf = jax.jit(jax.grad(loss(fblock)))(fvars["params"])
        gp = jax.jit(jax.grad(loss(pblock)))(fvars["params"])
        for path_leaf, ref_leaf in zip(
                jax.tree_util.tree_leaves_with_path(gp),
                jax.tree_util.tree_leaves(gf)):
            np.testing.assert_allclose(
                np.asarray(path_leaf[1]), np.asarray(ref_leaf),
                rtol=1e-9, atol=1e-11,
                err_msg=jax.tree_util.keystr(path_leaf[0]))


def test_g_block_identity_shortcut(rng):
    """cin == cout exercises the concat identity-shortcut path."""
    c = 16
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)), jnp.float32)
    flax_block = ResidualGeneratorBlock(c, c)
    fvars = flax_block.init(jax.random.PRNGKey(0), x, train=True)
    ref, _ = flax_block.apply(fvars, x, train=True, mutable=["batch_stats"])
    out, _ = ParityResidualGeneratorBlock(c, c).apply(
        fvars, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


# ------------------------------------------------------------------ D block
@pytest.fixture(params=[False, True], ids=["mid", "first"])
def d_pair(rng, request):
    first = request.param
    x = jnp.asarray(rng.standard_normal((B, 2 * H, 2 * H, CIN)), jnp.float32)
    flax_block = ResidualDiscriminatorBlock(CIN, COUT, first_block=first)
    flax_vars = flax_block.init(jax.random.PRNGKey(0), x, train=True)
    return x, flax_block, flax_vars, first


def test_d_block_forward_and_stats(d_pair):
    x, flax_block, flax_vars, first = d_pair
    ref, ref_state = flax_block.apply(flax_vars, x, train=True,
                                      mutable=["batch_stats"])
    pblock = ParityResidualDiscriminatorBlock(CIN, COUT, first_block=first)
    pvars = pblock.init(jax.random.PRNGKey(1), x, train=True)
    assert (jax.tree_util.tree_structure(pvars)
            == jax.tree_util.tree_structure(flax_vars)), "param tree drift"
    out, state = pblock.apply(flax_vars, x, train=True,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    got = dict(jax.tree_util.tree_leaves_with_path(state))
    for path, leaf in jax.tree_util.tree_leaves_with_path(ref_state):
        np.testing.assert_allclose(np.asarray(got[path]), np.asarray(leaf),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))


def test_d_block_r1_double_grad(d_pair):
    """The R1 penalty's grad-of-grad-wrt-input must agree — this is the
    path a custom-VJP kernel cannot support and the parity rewrite must."""
    x, flax_block, flax_vars, first = d_pair
    pblock = ParityResidualDiscriminatorBlock(CIN, COUT, first_block=first)

    def r1(block):
        def penalty(params):
            def d_sum(x):
                out, _ = block.apply(
                    {"params": params,
                     "batch_stats": flax_vars["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))
            gx = jax.grad(d_sum)(x)
            return jnp.sum(jnp.square(gx))
        return jax.jit(jax.grad(penalty))(flax_vars["params"])

    ref = r1(flax_block)
    got = r1(pblock)
    for path_leaf, ref_leaf in zip(
            jax.tree_util.tree_leaves_with_path(got),
            jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(
            np.asarray(path_leaf[1]), np.asarray(ref_leaf),
            rtol=2e-3, atol=1e-3,
            err_msg=jax.tree_util.keystr(path_leaf[0]))


# ------------------------------------------------------------------ factory
def test_factory_routes_parity_blocks():
    from tartangan_tpu.models import factories as F
    gf = F.g_block_factory("bn", "relu", parity=True)
    assert isinstance(gf(128, 64), ParityResidualGeneratorBlock)
    assert isinstance(gf(256, 128), ResidualGeneratorBlock)  # too wide
    assert isinstance(gf(128, 64, first_block=True), ResidualGeneratorBlock)
    assert isinstance(gf(128, 64, upsample=False), ResidualGeneratorBlock)
    df = F.d_block_factory("bn", "relu", parity=True)
    assert isinstance(df(16, 32), ParityResidualDiscriminatorBlock)
    assert isinstance(df(64, 128), ResidualDiscriminatorBlock)
    # selu (any activation) is fine; 1-D is not
    gf1d = F.g_block_factory("bn", "relu", ndim=1, parity=True)
    assert isinstance(gf1d(32, 16), ResidualGeneratorBlock)


# -------------------------------------------------- G output-stage fusion
def _build_generator(parity, cfg=None, remat=False):
    from tartangan_tpu.configs import GAN_CONFIGS
    from tartangan_tpu.models import factories as F
    from tartangan_tpu.models.pluggan import Generator
    cfg = cfg or GAN_CONFIGS["16"]
    return cfg, Generator(
        cfg,
        input_factory=F.g_input_factory("mlp", "relu"),
        block_factory=F.g_block_factory("bn", "relu", parity=parity,
                                        remat=remat),
        output_factory=F.g_output_factory("bn", "relu"),
    )


def test_generator_fuses_parity_output():
    """With parity blocks on, Generator swaps the output stage for the
    parity-domain form and the last tower block hands off in parity
    layout (no full-resolution pre-output tensor)."""
    from tartangan_tpu.models.blocks import ParityGeneratorOutput
    cfg, g = _build_generator(True)
    z = jnp.zeros((2, cfg.latent_dims), jnp.float32)
    v = g.init(jax.random.PRNGKey(0), z, train=True)
    bound = g.bind(v)
    assert isinstance(bound.output_block, ParityGeneratorOutput)
    assert bound.blocks[-1].emit_parity
    # remat-wrapped parity blocks fuse the same way (ADVICE r3 made
    # remat cover the parity variants; the clone must preserve the wrap)
    cfg, g_rm = _build_generator(True, remat=True)
    v_rm = g_rm.init(jax.random.PRNGKey(0), z, train=True)
    bound_rm = g_rm.bind(v_rm)
    assert isinstance(bound_rm.output_block, ParityGeneratorOutput)
    assert bound_rm.blocks[-1].emit_parity
    assert type(bound_rm.blocks[-1]).__name__.startswith("Checkpoint")


def test_generator_parity_output_matches_flax(rng):
    """Same params, parity generator (incl fused output) == flax
    generator: forward, running stats, grads — and param trees are
    identical by construction (checkpoints interoperate)."""
    cfg, g_flax = _build_generator(False)
    _, g_par = _build_generator(True)
    z = jnp.asarray(rng.standard_normal((4, cfg.latent_dims)), jnp.float32)
    v = g_flax.init(jax.random.PRNGKey(0), z, train=True)
    v2 = g_par.init(jax.random.PRNGKey(1), z, train=True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))

    def run(g):
        out, upd = g.apply(v, z, train=True, mutable=["batch_stats"])
        return out, upd["batch_stats"]

    out_f, bs_f = run(g_flax)
    out_p, bs_p = run(g_par)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f),
                               rtol=1e-4, atol=1e-5)
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(bs_p),
            jax.tree_util.tree_leaves_with_path(bs_f)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa))

    def loss(params, g):
        out, _ = g.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            z, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.square(out.astype(jnp.float32)))

    g_grad = jax.jit(jax.grad(loss), static_argnums=1)
    gf = g_grad(v["params"], g_flax)
    gp = g_grad(v["params"], g_par)
    # tolerance rides the GLOBAL gradient scale: bias grads nearly cancel
    # (sums over batch+space), so per-leaf relative comparison is
    # meaningless noise-vs-noise there; exact per-op math is pinned in
    # f64 by test_g_block_grads_f64
    gmax = max(float(np.max(np.abs(np.asarray(leaf))))
               for leaf in jax.tree_util.tree_leaves(gf))
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp),
            jax.tree_util.tree_leaves_with_path(gf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4 * gmax,
            err_msg=jax.tree_util.keystr(pa))

    # eval mode uses the running averages through the folded path
    out_fe = g_flax.apply(v, z, train=False)
    out_pe = g_par.apply(v, z, train=False)
    np.testing.assert_allclose(np.asarray(out_pe), np.asarray(out_fe),
                               rtol=1e-4, atol=1e-5)


def test_generator_no_fusion_when_attention_last(rng):
    """A trailing SelfAttention2d blocks the hand-off — the output stage
    stays the standard full-resolution module."""
    import dataclasses
    from tartangan_tpu.configs import GAN_CONFIGS
    from tartangan_tpu.models.blocks import GeneratorOutput
    cfg = dataclasses.replace(GAN_CONFIGS["16"], attention=(1,))
    _, g = _build_generator(True, cfg=cfg)
    z = jnp.zeros((2, cfg.latent_dims), jnp.float32)
    v = g.init(jax.random.PRNGKey(0), z, train=True)
    bound = g.bind(v)
    assert isinstance(bound.output_block, GeneratorOutput)


# -------------------------------------------------- D input-stage fusion
def test_downsample_bilinear_half_parity(rng):
    """Bilinear 0.5x from parity planes == bilinear 0.5x of the restored
    full-resolution tensor (both align_corners conventions)."""
    from tartangan_tpu.ops.resize import (
        downsample_bilinear_half,
        downsample_bilinear_half_parity,
    )
    x = jnp.asarray(rng.standard_normal((2, 12, 8, 5)), jnp.float32)
    xp = space_to_depth(x)
    for ac in (True, False):
        ref = downsample_bilinear_half(x, align_corners=ac)
        out = downsample_bilinear_half_parity(xp, 5, align_corners=ac)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)


def _build_discriminator(parity, cfg=None):
    from tartangan_tpu.configs import GAN_CONFIGS
    from tartangan_tpu.models import factories as F
    from tartangan_tpu.models.pluggan import Discriminator
    cfg = cfg or GAN_CONFIGS["16"]
    return cfg, Discriminator(
        cfg,
        block_factory=F.d_block_factory("bn", "relu", parity=parity),
        output_factory=F.d_output_factory("bn", "relu"),
    )


def test_discriminator_fuses_parity_input():
    from tartangan_tpu.models.blocks import ParityDiscriminatorInput
    cfg, d = _build_discriminator(True)
    x = jnp.zeros((2, cfg.max_size, cfg.max_size, 3), jnp.float32)
    v = d.init(jax.random.PRNGKey(0), x, train=True)
    bound = d.bind(v)
    assert isinstance(bound.input_block, ParityDiscriminatorInput)
    assert bound.blocks[0].accept_parity


def test_discriminator_chains_parity_blocks():
    """Consecutive parity D blocks hand off in parity layout: the
    earlier block emits (pack_down_parity_conv) and the later accepts —
    config '16' has exactly two parity blocks, one seam (round 4)."""
    cfg, d = _build_discriminator(True)
    x = jnp.zeros((2, cfg.max_size, cfg.max_size, 3), jnp.float32)
    v = d.init(jax.random.PRNGKey(0), x, train=True)
    bound = d.bind(v)
    assert bound.blocks[0].emit_parity
    assert bound.blocks[1].accept_parity
    assert not bound.blocks[1].emit_parity  # last block emits standard


def test_d_block_emit_parity_matches_flax(rng):
    """An emit_parity parity D block == flax block after restoring the
    layout, for both shortcut variants (projected and pre-stacked)."""
    x = jnp.asarray(rng.standard_normal((B, 2 * H, 2 * H, CIN)), jnp.float32)
    flax_block = ResidualDiscriminatorBlock(CIN, COUT)
    fvars = flax_block.init(jax.random.PRNGKey(0), x, train=True)
    ref, _ = flax_block.apply(fvars, x, train=True, mutable=["batch_stats"])
    pblock = ParityResidualDiscriminatorBlock(CIN, COUT, emit_parity=True)
    out, _ = pblock.apply(fvars, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(depth_to_space(out, COUT)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)
    # accept_parity + emit_parity (the mid-chain form)
    pblock2 = ParityResidualDiscriminatorBlock(
        CIN, COUT, accept_parity=True, emit_parity=True)
    out2, _ = pblock2.apply(fvars, space_to_depth(x), train=True,
                            mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(depth_to_space(out2, COUT)),
                               np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_discriminator_parity_input_matches_flax(rng):
    """Same params: parity D (incl fused input + parity-plane bilinear
    shortcut) == flax D for forward, stats, param grads AND the R1
    double gradient (D sits under grad-of-grad in the train step)."""
    cfg, d_flax = _build_discriminator(False)
    _, d_par = _build_discriminator(True)
    x = jnp.asarray(rng.standard_normal(
        (4, cfg.max_size, cfg.max_size, 3)), jnp.float32)
    v = d_flax.init(jax.random.PRNGKey(0), x, train=True)
    v2 = d_par.init(jax.random.PRNGKey(1), x, train=True)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v2))

    def run(d):
        out, upd = d.apply(v, x, train=True, mutable=["batch_stats"])
        return out, upd["batch_stats"]

    out_f, bs_f = run(d_flax)
    out_p, bs_p = run(d_par)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_f),
                               rtol=1e-4, atol=1e-4)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(bs_p),
            jax.tree_util.tree_leaves_with_path(bs_f)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa))

    def r1_loss(params, d):
        def d_sum(xx):
            out, _ = d.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                xx, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        gx = jax.grad(d_sum)(x)
        out, _ = d.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(jnp.square(gx)) + jnp.sum(jnp.square(out))

    # jitted: op-by-op dispatch of the double-grad graph dominates suite
    # wall-clock on this 1-core box; the compile hits the persistent cache
    r1_grad = jax.jit(jax.grad(r1_loss), static_argnums=1)
    gf = r1_grad(v["params"], d_flax)
    gp = r1_grad(v["params"], d_par)
    gmax = max(float(np.max(np.abs(np.asarray(leaf))))
               for leaf in jax.tree_util.tree_leaves(gf))
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(gp),
            jax.tree_util.tree_leaves_with_path(gf)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4 * gmax,
            err_msg=jax.tree_util.keystr(pa))
