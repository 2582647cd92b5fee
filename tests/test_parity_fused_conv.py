"""G-side fused merged-tap parity conv (ops/pallas/parity_conv.py):
interpret-mode parity against the production 3x3-packed XLA forms, at
the op, gradient and block level. The kernel only changes WHERE the
merged-tap contraction and realignment execute (one VMEM pass vs
HBM-materialized slices); the math is the round-4 merged-tap form,
already pinned bit-identical to the reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.models import blocks as B
from tartangan_tpu.ops import parity as P
from tartangan_tpu.ops.pallas import parity_conv as PC


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(PC, "_INTERPRET", True)


def _default_up(h, w, b, cout):
    return B._conv_same(h, P.pack_up_conv(w), jnp.tile(b, 4))


def _default_full(h, w, b, cout):
    return B._conv_same(h, P.pack_full_conv(w), jnp.tile(b, 4))


@pytest.mark.parametrize("mode", ["up", "full"])
def test_fused_matches_packed_forward(rng, mode):
    cin, cout, hsz = (3, 5, 6) if mode == "up" else (12, 5, 6)
    x = jnp.asarray(rng.standard_normal((2, hsz, hsz, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin if mode == "up"
                                         else cin // 4, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    got = PC.fused_parity_conv(x, w, b, cout, mode)
    want = (_default_up if mode == "up" else _default_full)(x, w, b, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["up", "full"])
def test_fused_gradients_match_packed(rng, mode):
    cin, cout, hsz = (4, 3, 4) if mode == "up" else (8, 3, 4)
    x = jnp.asarray(rng.standard_normal((2, hsz, hsz, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, cin if mode == "up"
                                         else cin // 4, cout)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    cot = jnp.asarray(
        rng.standard_normal((2, hsz, hsz, 4 * cout)), jnp.float32)

    def loss_fused(x, w, b):
        return jnp.sum(PC.fused_parity_conv(x, w, b, cout, mode) * cot)

    def loss_ref(x, w, b):
        f = _default_up if mode == "up" else _default_full
        return jnp.sum(f(x, w, b, cout) * cot)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    for a, e in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-5)


def test_parity_g_block_fused_matches_default(rng, monkeypatch):
    """ParityResidualGeneratorBlock under ops.parity.FUSED_G reproduces
    the default block (forward + input grad)."""
    x = jnp.asarray(rng.standard_normal((2, 4, 4, 8)), jnp.float32)
    blk = B.ParityResidualGeneratorBlock(8, 4, dtype=jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x, train=True)

    def run():
        out, _ = blk.apply(v, x, train=True, mutable=["batch_stats"])
        return out

    def grad_in():
        def f(xx):
            out, _ = blk.apply(v, xx, train=True, mutable=["batch_stats"])
            return jnp.sum(out ** 2)
        return jax.grad(f)(x)

    base, gbase = run(), grad_in()
    monkeypatch.setattr(P, "FUSED_G", True)
    fused, gfused = run(), grad_in()
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gfused), np.asarray(gbase),
                               rtol=1e-5, atol=1e-5)


def test_batch_tile_respects_budget_and_divides():
    bt = PC._batch_tile(128, 32, 32, 64, 128)
    assert bt >= 1 and 128 % bt == 0
    # shapes whose single-image working set exceeds the calibrated VMEM
    # budget return 0 -> the op falls back to the 3x3-packed XLA form
    # (observed scoped-vmem OOM at 25.22 MB on the 64px 4*16->4*16 conv)
    assert PC._batch_tile(128, 64, 64, 64, 64) == 0
    assert PC._batch_tile(128, 256, 256, 256, 256) == 0
