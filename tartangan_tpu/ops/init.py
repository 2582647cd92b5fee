"""Parameter initializers matching the reference's (torch-default) init.

torch ``nn.Conv2d``/``nn.Linear`` default to ``kaiming_uniform_(a=sqrt(5))``,
which is ``U(-sqrt(1/fan_in), sqrt(1/fan_in))`` — equivalent to
``variance_scaling(1/3, 'fan_in', 'uniform')``. Biases default to
``U(-1/sqrt(fan_in), 1/sqrt(fan_in))``. Matching the init distribution keeps
early training dynamics comparable to the reference (trainers/cnn.py:84-95).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

# Weight init for conv + dense layers (torch default kaiming_uniform a=sqrt(5))
torch_kaiming_uniform = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_uniform(fan_in: int):
    """torch default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / jnp.sqrt(jnp.maximum(fan_in, 1))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )
    return init


def selu_normal(fan_in: int):
    """SELU init used when ``--activation selu``: N(0, 1/fan_in)
    (reference trainers/cnn.py:97-105; 1-D params are zeroed there)."""
    std = (1.0 / max(fan_in, 1)) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init
