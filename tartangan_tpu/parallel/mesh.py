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
MODEL_AXIS = "model"


def make_mesh(num_devices: int | None = None, axis_name: str = DATA_AXIS,
              tp: int = 1) -> Mesh:
    """Device mesh. ``tp=1``: 1-D data-parallel mesh. ``tp>1``: 2-D
    (data, model) mesh — the model axis shards output-channel dims of the
    weight tensors (tensor parallelism) while the data axis shards the
    batch."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    if tp <= 1:
        return Mesh(np.array(devices), (axis_name,))
    assert len(devices) % tp == 0, (len(devices), tp)
    grid = np.array(devices).reshape(len(devices) // tp, tp)
    return Mesh(grid, (axis_name, MODEL_AXIS))


# leaf names (last key-path component) that carry an output-feature trailing
# dim and are safe to shard over the model axis. Everything else (BN
# scale/bias/stats, biases, gammas, step counters) replicates. Adam moments
# mirror the param tree, so their leaf names match and shard identically.
TP_SHARDED_LEAVES = ("kernel", "embedding_u", "embedding_v")


def param_sharding(tree, mesh: Mesh, axis_name: str = MODEL_AXIS,
                   quiet: bool = False):
    """Tensor-parallel placement for a parameter/optimizer pytree: shard the
    trailing (output-feature) dim over the model axis for the explicit
    allowlist of weight leaves (TP_SHARDED_LEAVES) when divisible by tp;
    replicate everything else. XLA/GSPMD inserts the all-gathers /
    reduce-scatters the partitioned convs need. Logs a one-line placement
    summary so the effective sharding is auditable."""
    if axis_name not in mesh.axis_names:
        return jax.device_put(tree, NamedSharding(mesh, P()))
    tp = mesh.shape[axis_name]
    counts = {"sharded": 0, "replicated": 0}

    def place(path, leaf):
        name = str(path[-1].key) if hasattr(path[-1], "key") else \
            str(getattr(path[-1], "name", path[-1]))
        if (name in TP_SHARDED_LEAVES
                and getattr(leaf, "ndim", 0) >= 2
                and leaf.shape[-1] % tp == 0):
            spec = P(*([None] * (leaf.ndim - 1)), axis_name)
            counts["sharded"] += 1
        else:
            spec = P()
            counts["replicated"] += 1
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    placed = jax.tree_util.tree_map_with_path(place, tree)
    if not quiet:
        print(f"[tp] model-axis placement (tp={tp}): "
              f"{counts['sharded']} weight leaves sharded on their "
              f"output-feature dim, {counts['replicated']} replicated")
    return placed


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
