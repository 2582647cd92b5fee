"""--remat-policy: jax.checkpoint policies on the rematted blocks are
semantics-preserving (identical forward AND gradients to no-remat) for
every policy, on both the flax and parity block families. The policies
only change what the backward pass recomputes vs saves — a memory/FLOPs
trade measured on hardware (docs/PERF.md round 5, VERDICT r4 next #6)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.models import factories as F


def _g_tower(remat, policy, parity):
    fac = F.g_block_factory("bn", "relu", remat=remat, parity=parity,
                            remat_policy_name=policy)
    return fac(8, 4, first_block=False, upsample=True, dtype=jnp.float32)


def _d_tower(remat, policy, parity):
    fac = F.d_block_factory("bn", "relu", remat=remat, parity=parity,
                            remat_policy_name=policy)
    return fac(4, 8, first_block=False, dtype=jnp.float32)


@pytest.mark.parametrize("policy", ["full", "convs", "dots"])
@pytest.mark.parametrize("parity", [False, True])
@pytest.mark.parametrize("side", ["g", "d"])
def test_remat_policy_preserves_semantics(rng, policy, parity, side):
    build = _g_tower if side == "g" else _d_tower
    cin = 8 if side == "g" else 4
    x = jnp.asarray(rng.standard_normal((2, 8, 8, cin)), jnp.float32)
    base = build(False, "full", parity)
    blk = build(True, policy, parity)
    v = base.init(jax.random.PRNGKey(0), x, train=True)

    def loss(mod, params, xx):
        # train positionally: nn.remat(static_argnums=(2,)) requires the
        # static arg to arrive positionally, exactly as the towers call
        # their blocks (models/base.py block(h, train))
        out, _ = mod.apply({**v, "params": params}, xx, True,
                           mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    lb, (gpb, gxb) = (
        jax.value_and_grad(lambda p, xx: loss(base, p, xx),
                           argnums=(0, 1))(v["params"], x))
    lr, (gpr, gxr) = (
        jax.value_and_grad(lambda p, xx: loss(blk, p, xx),
                           argnums=(0, 1))(v["params"], x))
    np.testing.assert_allclose(float(lb), float(lr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gxr), np.asarray(gxb),
                               rtol=1e-5, atol=1e-6)
    for a, e in zip(jax.tree_util.tree_leaves(gpr),
                    jax.tree_util.tree_leaves(gpb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e),
                                   rtol=1e-5, atol=1e-6)


def test_remat_policy_cli_flag_reaches_factories(tiny_archive, tmp_path):
    """--remat --remat-policy convs builds and steps end-to-end."""
    from tartangan_tpu.train.cnn import CNNTrainer
    trainer = CNNTrainer.create_from_cli([
        str(tiny_archive), "--config", "8", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--remat", "--remat-policy", "convs", "--run-id", "rp",
        "--gen-freq", "1000000", "--checkpoint-freq", "1000000",
        "--quiet-logs",
    ])
    trainer.train()
    assert trainer.steps > 0


def test_unknown_policy_raises():
    with pytest.raises(ValueError):
        F.remat_policy("nope")
