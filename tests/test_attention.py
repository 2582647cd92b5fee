"""Self-attention parity vs a torch transliteration of the reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.models.attention import SelfAttention2d

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402


def test_attention_matches_reference_math(rng):
    """Port our params into the reference formula (attention.py:21-35)."""
    c = 16
    x = rng.standard_normal((2, 8, 8, c)).astype(np.float32)
    mod = SelfAttention2d(c)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = jax.device_get(variables["params"])
    # force a nonzero gamma so the attention path matters
    params["gamma"] = np.float32(0.7)
    ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    # torch reference using the same weights (HWIO (1,1,C,Co) -> OIHW)
    def w(name):
        kern = params[name]["kernel"]  # (1, 1, cin, cout)
        return torch.from_numpy(
            np.ascontiguousarray(kern[0, 0].T[:, :, None, None]))

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    theta = TF.conv2d(xt, w("theta"))
    phi = TF.max_pool2d(TF.conv2d(xt, w("phi")), (2, 2))
    g = TF.max_pool2d(TF.conv2d(xt, w("g")), (2, 2))
    b, _, h, wd = xt.shape
    theta = theta.view(b, c // 8, h * wd)
    phi = phi.view(b, c // 8, h * wd // 4)
    g = g.view(b, c // 2, h * wd // 4)
    beta = TF.softmax(torch.bmm(theta.transpose(1, 2), phi), -1)
    o = TF.conv2d(
        torch.bmm(g, beta.transpose(1, 2)).view(b, c // 2, h, wd), w("o"))
    expected = (0.7 * o + xt).numpy().transpose(0, 2, 3, 1)

    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_pallas_kernel_interpret_matches_reference(rng):
    """Execute the kernel body in interpret mode on CPU and compare to the
    jnp reference formula (also exercises the q-tiling path)."""
    from tartangan_tpu.ops.pallas.attention import (
        _fused_attention_fwd_impl,
        _softmax_qkT,
    )
    b, lq, lk, ck, cv = 2, 1024, 256, 8, 16  # lq > _TILE_Q -> 2 q-tiles
    q = jnp.asarray(rng.standard_normal((b, lq, ck)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, ck)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lk, cv)), jnp.float32)
    out = _fused_attention_fwd_impl(q, k, v, interpret=True)
    ref = jnp.einsum("bqk,bkc->bqc", _softmax_qkT(q, k), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_backward_interpret_matches_xla_vjp(rng):
    """The flash-style backward kernel (dq direct, dk/dv scratch-accumulated
    across q-tiles) must reproduce the XLA einsum-chain VJP exactly."""
    from tartangan_tpu.ops.pallas.attention import (
        _attn_bwd_impl,
        _fused_attention_bwd_xla,
    )
    b, lq, lk, ck, cv = 2, 1024, 256, 8, 16  # lq > _TILE_Q -> 2 q-tiles
    q = jnp.asarray(rng.standard_normal((b, lq, ck)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, lk, ck)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, lk, cv)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((b, lq, cv)), jnp.float32)

    dq, dk, dv = _attn_bwd_impl(q, k, v, do, interpret=True)
    rq, rk, rv = _fused_attention_bwd_xla(q, k, v, do)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(rq),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(rk),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(rv),
                               rtol=1e-4, atol=1e-4)


def test_pallas_backward_bf16_dtypes(rng):
    """bf16 q/k/v/do (the TPU training dtypes) round-trip: f32 accumulation
    inside, outputs cast back to the input dtypes."""
    from tartangan_tpu.ops.pallas.attention import _attn_bwd_impl
    b, lq, lk, ck, cv = 1, 512, 128, 8, 16
    q = jnp.asarray(rng.standard_normal((b, lq, ck)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, lk, ck)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, lk, cv)), jnp.bfloat16)
    do = jnp.asarray(rng.standard_normal((b, lq, cv)), jnp.bfloat16)
    dq, dk, dv = _attn_bwd_impl(q, k, v, do, interpret=True)
    assert dq.dtype == jnp.bfloat16 and dq.shape == (b, lq, ck)
    assert dk.dtype == jnp.bfloat16 and dk.shape == (b, lk, ck)
    assert dv.dtype == jnp.bfloat16 and dv.shape == (b, lk, cv)
    assert np.isfinite(np.asarray(dq, np.float32)).all()


def test_pallas_kernel_unavailable_on_cpu_falls_back():
    from tartangan_tpu.ops.pallas.attention import fused_attention
    with pytest.raises(NotImplementedError):
        fused_attention(jnp.zeros((1, 16, 4)), jnp.zeros((1, 4, 4)),
                        jnp.zeros((1, 4, 8)))

    # the module-level wrapper must fall back silently
    mod = SelfAttention2d(16, use_pallas=True)
    x = jnp.zeros((1, 4, 4, 16))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x)
    assert out.shape == x.shape


def test_r1_double_grad_through_pallas_attention(rng, monkeypatch):
    """The R1 penalty differentiates D twice; the attention kernel's
    DOUBLE-nested custom_vjp (ops/pallas/attention.py: a second-level
    rule on the forward, one on the backward) supports exactly two
    differentiation levels — so the D builders keep the fused kernel
    (round 3 routed D's attention to XLA; this pins the round-4 fix).
    Exercised genuinely via interpret mode: the kernels execute on CPU
    and the second-order grads must match the XLA attention path."""
    import tartangan_tpu.ops.pallas.attention as pallas_attn
    from tartangan_tpu.configs import GAN_CONFIGS
    from tartangan_tpu.models import factories as F
    from tartangan_tpu.models.pluggan import (
        Discriminator,
        Generator,
        IQNDiscriminator,
    )
    from tartangan_tpu.models.shared import SharedDiscriminator

    assert IQNDiscriminator.attn_use_pallas is True
    assert SharedDiscriminator.attn_use_pallas is True
    assert Generator.attn_use_pallas is True

    import dataclasses

    # same shape family as test128 (attention mid-tower), shrunk to 16 px
    # so the interpret-mode double grads stay affordable
    cfg = dataclasses.replace(GAN_CONFIGS["16"], blocks=(16, 8),
                              attention=(1,))
    assert cfg.attention
    x = jnp.asarray(rng.standard_normal(
        (2, cfg.max_size, cfg.max_size, 3)), jnp.float32)

    def r1_grads(use_pallas):
        d = Discriminator(
            cfg,
            block_factory=F.d_block_factory("bn", "relu"),
            output_factory=F.d_output_factory("bn", "relu"),
            attn_use_pallas=use_pallas,
        )
        d_vars = d.init(jax.random.PRNGKey(0), x, train=True)

        def r1(params):
            def d_sum(x):
                out, _ = d.apply(
                    {"params": params,
                     "batch_stats": d_vars["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return jnp.sum(out.astype(jnp.float32))
            gx = jax.grad(d_sum)(x)
            return jnp.sum(jnp.square(gx))

        return jax.jit(jax.grad(r1))(d_vars["params"])

    monkeypatch.setattr(pallas_attn, "_INTERPRET", True)
    via_kernel = r1_grads(True)
    via_xla = r1_grads(False)
    flat_k = jax.tree_util.tree_leaves(via_kernel)
    flat_x = jax.tree_util.tree_leaves(via_xla)
    for a, b in zip(flat_k, flat_x):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a))
        scale = max(float(np.max(np.abs(b))), 1e-6)
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4)
