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


def test_pack_down_conv_identity(rng):
    """avgpool2(conv3x3(x, w)) == conv3x3(s2d(x), pack_down(w))."""
    from tartangan_tpu.ops.resize import avg_pool_2x
    x = jnp.asarray(rng.standard_normal((2, 12, 8, CIN)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, CIN, COUT)), jnp.float32)
    ref = avg_pool_2x(_conv(x, w))
    out = _conv(space_to_depth(x), pack_down_conv(w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


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

    gf_p, gf_x = jax.grad(loss(flax_block), argnums=(0, 1))(
        flax_vars["params"], x)
    gp_p, gp_x = jax.grad(loss(pblock), argnums=(0, 1))(
        flax_vars["params"], x)
    # f32 tolerance is reassociation-limited (the packing reorders the
    # pixel reductions); test_g_block_grads_f64 pins the math itself
    np.testing.assert_allclose(np.asarray(gp_x), np.asarray(gf_x),
                               rtol=2e-3, atol=1e-3)
    for path_leaf, ref_leaf in zip(
            jax.tree_util.tree_leaves_with_path(gp_p),
            jax.tree_util.tree_leaves(gf_p)):
        np.testing.assert_allclose(
            np.asarray(path_leaf[1]), np.asarray(ref_leaf),
            rtol=2e-3, atol=1e-3,
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

        gf = jax.grad(loss(fblock))(fvars["params"])
        gp = jax.grad(loss(pblock))(fvars["params"])
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
        return jax.grad(penalty)(flax_vars["params"])

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
