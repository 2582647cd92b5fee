"""Device-mesh / sharding helpers (data-parallel scale-out).

The reference has no distributed backend at all (SURVEY.md section 2.11):
training is 1 process x 1 device. The TPU-native replacement is GSPMD over a
``jax.sharding.Mesh``: parameters replicated, the global batch sharded over
the ``data`` axis, gradient/batch-norm reductions becoming ICI collectives
inserted by XLA. The single-chip path is the degenerate 1-device mesh.

Works identically on a real TPU slice and on the N-virtual-device CPU mesh
used in tests (``XLA_FLAGS=--xla_force_host_platform_device_count=N``).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Batch-axis sharding for input batches."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding for parameters/optimizer state."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Device-put a host batch sharded over the data axis."""
    return jax.device_put(batch, data_sharding(mesh, axis_name))


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    return jax.device_put(tree, replicated_sharding(mesh))
