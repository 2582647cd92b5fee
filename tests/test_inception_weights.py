"""Ported-Inception-weights path, testable without torchvision.

A deterministic synthetic state_dict with torchvision's exact key/shape
schema exercises the whole user path in-image: torch .pth file ->
port_weights CLI -> npz -> --inception-weights / env-var load -> forward.
A committed activation fixture pins the port + forward numerics against
regression (absolute torchvision parity is pinned separately by
test_inception_fid.py's test, which needs a torchvision install).
"""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.eval.inception import InceptionWrapper
from tartangan_tpu.models.inception import (
    WEIGHTS_ENV_VAR,
    init_inception,
    load_weights_npz,
    port_torch_state_dict,
    save_weights_npz,
    torch_key_map,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "inception_port_expected.npz")


def synthetic_state_dict(template):
    """torchvision-schema state_dict with deterministic pseudo-weights.

    Values are keyed on the (sorted) torch key so the committed activation
    fixture stays stable; shapes are the torch-side ones (conv OIHW,
    fc (out,in)), exactly what port_torch_state_dict consumes.
    """
    import flax
    mapping = torch_key_map(template)
    flat = flax.traverse_util.flatten_dict(template, sep=".")
    out = {}
    for flax_key in sorted(mapping):
        torch_key, shape = mapping[flax_key], flat[flax_key].shape
        leaf = flax_key.split(".")[-1]
        if leaf == "kernel":
            if len(shape) == 4:  # conv HWIO -> torch OIHW
                shape = (shape[3], shape[2], shape[0], shape[1])
            else:  # fc (in,out) -> torch (out,in)
                shape = (shape[1], shape[0])
        import zlib
        rng = np.random.default_rng(zlib.crc32(torch_key.encode()))
        if leaf in ("scale", "var"):  # BN weight / running_var: positive
            val = rng.uniform(0.5, 1.5, shape)
        else:
            val = rng.normal(0.0, 0.05, shape)
        out[torch_key] = val.astype(np.float32)
    return out


@pytest.fixture(scope="module")
def ported():
    model, template = init_inception()
    state_dict = synthetic_state_dict(template)
    variables = port_torch_state_dict(template, state_dict)
    return model, template, state_dict, variables


def _input_image():
    rng = np.random.default_rng(42)
    return rng.uniform(-1.0, 1.0, (1, 299, 299, 3)).astype(np.float32)


def test_port_cli_roundtrip(tmp_path, ported):
    """torch.save'd state_dict -> port CLI -> npz == direct port."""
    import torch

    from tartangan_tpu.eval import port_weights

    model, template, state_dict, variables = ported
    pth = tmp_path / "weights.pth"
    torch.save({k: torch.from_numpy(v) for k, v in state_dict.items()},
               str(pth))
    npz = tmp_path / "weights.npz"
    port_weights.main([str(pth), str(npz)])

    loaded = load_weights_npz(template, str(npz))
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wrapper_loads_weights_arg_and_env(tmp_path, ported, monkeypatch):
    _, _, _, variables = ported
    npz = tmp_path / "weights.npz"
    save_weights_npz(variables, str(npz))

    img = jnp.asarray(_input_image())
    by_arg = InceptionWrapper(weights=str(npz))
    assert by_arg.pretrained
    pool_arg, probs_arg = by_arg(img)

    monkeypatch.setenv(WEIGHTS_ENV_VAR, str(npz))
    by_env = InceptionWrapper()
    assert by_env.pretrained
    pool_env, _ = by_env(img)
    np.testing.assert_array_equal(np.asarray(pool_arg), np.asarray(pool_env))
    assert np.all(np.isfinite(np.asarray(pool_arg)))
    np.testing.assert_allclose(float(np.asarray(probs_arg).sum()), 1.0,
                               rtol=1e-4)


def test_load_rejects_wrong_npz(tmp_path, ported):
    _, template, _, _ = ported
    bad = tmp_path / "bad.npz"
    np.savez(bad, foo=np.zeros(3))
    with pytest.raises(KeyError):
        load_weights_npz(template, str(bad))


def test_port_activation_fixture(ported):
    """Pin the ported forward against the committed fixture — catches any
    regression in the key mapping, transposes, BN stats or the forward."""
    model, _, _, variables = ported
    pool, logits = model.apply(variables, jnp.asarray(_input_image()))
    expected = np.load(FIXTURE)
    np.testing.assert_allclose(np.asarray(pool), expected["pool"],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(logits), expected["logits"],
                               rtol=2e-4, atol=2e-4)
