"""ONNX export: the emitted graph must reproduce the flax eval forward.

The exported ModelProto is parsed back and executed by our own numpy
interpreter (export/onnx_eval.py) — no onnx/onnxruntime install needed —
and compared against ``Generator.apply(train=False)`` (eval-mode BN, the
semantics the export folds into constants).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tartangan_tpu.configs import GAN_CONFIGS
from tartangan_tpu.export.onnx import export_generator
from tartangan_tpu.export.onnx_eval import evaluate, parse_model
from tartangan_tpu.models import factories as F
from tartangan_tpu.models.pluggan import Generator


def _build_generator(config, g_base="mlp", activation="relu", norm="bn"):
    cfg = GAN_CONFIGS[config]
    g = Generator(
        cfg,
        input_factory=F.g_input_factory(g_base, activation),
        block_factory=F.g_block_factory(norm, activation),
        output_factory=F.g_output_factory(norm, activation),
    )
    variables = g.init(jax.random.PRNGKey(0),
                       jnp.zeros((2, cfg.latent_dims)), train=True)
    # make running stats non-trivial: a couple of train-mode applies
    z = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.latent_dims))
    for _ in range(2):
        _, updates = g.apply(variables, z, train=True,
                             mutable=["batch_stats"])
        variables = {"params": variables["params"], **updates}
    return g, variables, cfg


@pytest.mark.parametrize("config,g_base,activation", [
    ("16", "mlp", "relu"),
    ("32", "tiledz", "selu"),     # tiledz needs latent == first block width
    ("test128", "mlp", "relu"),   # covers the attention block
])
def test_onnx_matches_flax_eval(config, g_base, activation):
    g, variables, cfg = _build_generator(config, g_base, activation)
    model_bytes = export_generator(g, variables, batch_size=2)

    z = np.asarray(jax.random.normal(
        jax.random.PRNGKey(7), (2, cfg.latent_dims)), np.float32)
    expected = np.asarray(g.apply(variables, jnp.asarray(z), train=False))

    out = evaluate(model_bytes, {"z": z})["image"]
    got = np.transpose(out, (0, 2, 3, 1))  # NCHW -> NHWC
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_graph_structure():
    g, variables, cfg = _build_generator("16")
    model_bytes = export_generator(g, variables, batch_size=1)
    nodes, initializers, inputs, outputs = parse_model(model_bytes)
    assert inputs == ["z"] and outputs == ["image"]
    ops = [n["op"] for n in nodes]
    assert ops.count("Resize") == len(cfg.blocks)      # one 2x per scale
    assert ops.count("Conv") == 2 * len(cfg.blocks) + 1 + sum(
        1 for i, o in zip((cfg.blocks[0],) + cfg.blocks[:-1], cfg.blocks)
        if i != o)                                      # + projections
    assert "Gemm" in ops and "Tanh" in ops
    # every node input resolves to an initializer, a graph input, or an
    # earlier node output
    known = set(initializers) | set(inputs)
    for node in nodes:
        for name in node["inputs"]:
            assert name == "" or name in known, (node["op"], name)
        known.update(node["outputs"])


def test_attention_graph_ops():
    g, variables, _ = _build_generator("test128")
    nodes, _, _, _ = parse_model(export_generator(g, variables))
    ops = [n["op"] for n in nodes]
    assert ops.count("Softmax") == 1
    assert ops.count("MatMul") == 2
    assert ops.count("MaxPool") == 2
