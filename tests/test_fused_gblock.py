"""Fused generator-block kernels vs the flax ResidualGeneratorBlock.

Pins (1) the plain-jnp reference math used by the custom-VJP backward,
(2) the Pallas kernels in interpret mode, and (3) the gradients, against
the production flax block — in f32 where everything must agree to fp
round-off, plus a bf16 interpret-mode smoke.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.models.blocks import (
    FusedResidualGeneratorBlock,
    ResidualGeneratorBlock,
)

CIN, COUT, H, B = 24, 16, 8, 4


def flax_to_fused_params(flax_params, cin, cout):
    """Map a flax ResidualGeneratorBlock param tree onto the fused
    block's flat layout (also usable for checkpoint migration)."""
    def bn(tree):
        inner = tree
        while "scale" not in inner:
            inner = inner[next(iter(inner))]
        return inner["scale"], inner["bias"]

    s1, o1 = bn(flax_params["NormAct_0"])
    s2, o2 = bn(flax_params["NormAct_1"])
    out = {
        "conv1_kernel": flax_params["Conv_0"]["kernel"],
        "conv1_bias": flax_params["Conv_0"]["bias"],
        "conv2_kernel": flax_params["Conv_1"]["kernel"],
        "conv2_bias": flax_params["Conv_1"]["bias"],
        "bn1_scale": s1, "bn1_bias": o1,
        "bn2_scale": s2, "bn2_bias": o2,
    }
    if cin != cout:
        out["project_kernel"] = flax_params["project_input"]["kernel"]
        out["project_bias"] = flax_params["project_input"]["bias"]
    return out


def _kernel_params(fused_params, cin, cout):
    """Fused-module param tree -> the raw dict ops/pallas/gblock expects."""
    p = fused_params
    wp = (p["project_kernel"][0, 0] if cin != cout
          else jnp.eye(cin, dtype=jnp.float32))
    bp = (p["project_bias"] if cin != cout
          else jnp.zeros((cout,), jnp.float32))
    return {"w1": p["conv1_kernel"], "b1": p["conv1_bias"],
            "w2": p["conv2_kernel"], "b2": p["conv2_bias"],
            "wp": wp, "bp": bp,
            "s1": p["bn1_scale"], "o1": p["bn1_bias"],
            "s2": p["bn2_scale"], "o2": p["bn2_bias"]}


@pytest.fixture()
def pair(rng):
    x = jnp.asarray(rng.standard_normal((B, H, H, CIN)), jnp.float32)
    flax_block = ResidualGeneratorBlock(CIN, COUT)
    flax_vars = flax_block.init(jax.random.PRNGKey(0), x, train=True)
    fused_params = flax_to_fused_params(flax_vars["params"], CIN, COUT)
    return x, flax_block, flax_vars, fused_params


def test_module_forward_matches_flax(pair):
    """The fused module (reference-math path on CPU) == flax block, and the
    running-stat updates match flax's momentum-0.9 EMA."""
    x, flax_block, flax_vars, fused_params = pair
    ref, ref_state = flax_block.apply(flax_vars, x, train=True,
                                      mutable=["batch_stats"])

    fused_block = FusedResidualGeneratorBlock(CIN, COUT)
    fused_vars = fused_block.init(jax.random.PRNGKey(1), x, train=True)
    out, state = fused_block.apply(
        {"params": fused_params,
         "batch_stats": fused_vars["batch_stats"]},
        x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    ref_bn1 = ref_state["batch_stats"]["NormAct_0"]
    while "mean" not in ref_bn1:
        ref_bn1 = ref_bn1[next(iter(ref_bn1))]
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["bn1_mean"]),
        np.asarray(ref_bn1["mean"]), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state["batch_stats"]["bn1_var"]),
        np.asarray(ref_bn1["var"]), rtol=1e-5, atol=1e-6)


def test_module_eval_uses_running_stats(pair):
    """train=False normalizes with the running averages, as flax does."""
    x, flax_block, flax_vars, fused_params = pair
    # advance running stats one step on both sides
    _, ref_state = flax_block.apply(flax_vars, x, train=True,
                                    mutable=["batch_stats"])
    fused_block = FusedResidualGeneratorBlock(CIN, COUT)
    fused_vars = fused_block.init(jax.random.PRNGKey(1), x, train=True)
    _, state = fused_block.apply(
        {"params": fused_params, "batch_stats": fused_vars["batch_stats"]},
        x, train=True, mutable=["batch_stats"])

    ref_eval = flax_block.apply(
        {"params": flax_vars["params"], **ref_state}, x, train=False)
    out_eval = fused_block.apply(
        {"params": fused_params, **state}, x, train=False)
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(ref_eval),
                               rtol=1e-5, atol=1e-5)


def test_kernels_interpret_match_reference(pair):
    """Kernels A+B in interpret mode == the jnp reference math (f32)."""
    from tartangan_tpu.ops.pallas.gblock import (
        _fused_gblock_fwd_impl,
        _gblock_reference,
    )
    x, _, _, fused_params = pair
    kp = _kernel_params(fused_params, CIN, COUT)
    out, y1, stats = _fused_gblock_fwd_impl(x, kp, interpret=True)
    ref, ref_stats = _gblock_reference(x, kp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    for s, r in zip(stats, ref_stats):
        np.testing.assert_allclose(np.asarray(s), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_kernels_interpret_identity_shortcut(rng):
    """cin == cout exercises the I-projection (identity shortcut) path."""
    from tartangan_tpu.ops.pallas.gblock import (
        _fused_gblock_fwd_impl,
        _gblock_reference,
    )
    c = 16
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)), jnp.float32)
    p = {
        "w1": jnp.asarray(rng.standard_normal((3, 3, c, c)), jnp.float32)
        * 0.1,
        "b1": jnp.zeros((c,)),
        "w2": jnp.asarray(rng.standard_normal((3, 3, c, c)), jnp.float32)
        * 0.1,
        "b2": jnp.zeros((c,)),
        "wp": jnp.eye(c), "bp": jnp.zeros((c,)),
        "s1": jnp.ones((c,)), "o1": jnp.zeros((c,)),
        "s2": jnp.ones((c,)), "o2": jnp.zeros((c,)),
    }
    out, _, _ = _fused_gblock_fwd_impl(x, p, interpret=True)
    ref, _ = _gblock_reference(x, p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_kernels_interpret_bf16(rng):
    from tartangan_tpu.ops.pallas.gblock import (
        _fused_gblock_fwd_impl,
        _gblock_reference,
    )
    x = jnp.asarray(rng.standard_normal((2, 8, 8, CIN)), jnp.bfloat16)
    p = {
        "w1": jnp.asarray(
            rng.standard_normal((3, 3, CIN, COUT)), jnp.float32) * 0.1,
        "b1": jnp.zeros((COUT,)),
        "w2": jnp.asarray(
            rng.standard_normal((3, 3, COUT, COUT)), jnp.float32) * 0.1,
        "b2": jnp.zeros((COUT,)),
        "wp": jnp.asarray(
            rng.standard_normal((CIN, COUT)), jnp.float32) * 0.1,
        "bp": jnp.zeros((COUT,)),
        "s1": jnp.ones((CIN,)), "o1": jnp.zeros((CIN,)),
        "s2": jnp.ones((COUT,)), "o2": jnp.zeros((COUT,)),
    }
    out, _, _ = _fused_gblock_fwd_impl(x, p, interpret=True)
    ref, _ = _gblock_reference(x, p)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2)


def test_gradients_match_flax(pair):
    """d(sum out)/d(x, params) through the fused block's custom VJP == the
    flax block's autodiff grads (f32, CPU reference path)."""
    x, flax_block, flax_vars, fused_params = pair

    def flax_loss(params, x):
        out, _ = flax_block.apply(
            {"params": params,
             "batch_stats": flax_vars["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    fused_block = FusedResidualGeneratorBlock(CIN, COUT)
    fused_vars = fused_block.init(jax.random.PRNGKey(1), x, train=True)

    def fused_loss(params, x):
        out, _ = fused_block.apply(
            {"params": params,
             "batch_stats": fused_vars["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    gf_p, gf_x = jax.grad(flax_loss, argnums=(0, 1))(flax_vars["params"], x)
    gu_p, gu_x = jax.grad(fused_loss, argnums=(0, 1))(fused_params, x)

    np.testing.assert_allclose(np.asarray(gu_x), np.asarray(gf_x),
                               rtol=1e-4, atol=1e-4)
    mapped = flax_to_fused_params(gf_p, CIN, COUT)
    for name in mapped:
        np.testing.assert_allclose(
            np.asarray(gu_p[name]), np.asarray(mapped[name]),
            rtol=1e-4, atol=1e-4, err_msg=name)


def test_factory_selects_fused_blocks():
    """g_block_factory(fused=True) routes tower blocks to the fused class,
    first/base blocks to flax (comparison-baseline path; no CLI flag)."""
    from tartangan_tpu.models import factories as F
    fac = F.g_block_factory("bn", "relu", fused=True)
    assert isinstance(fac(24, 16), FusedResidualGeneratorBlock)
    assert isinstance(fac(24, 16, first_block=True),
                      ResidualGeneratorBlock)
    assert isinstance(fac(24, 16, upsample=False), ResidualGeneratorBlock)
    # unsupported norm/act keep flax everywhere
    fac_id = F.g_block_factory("id", "relu", fused=True)
    assert isinstance(fac_id(24, 16), ResidualGeneratorBlock)
