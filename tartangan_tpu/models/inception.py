"""InceptionV3 (pool3 features + logits) in flax, NHWC.

The FID/IS engine needs the torchvision InceptionV3 forward
(reference inception_utils.py:35-92 runs it via ``WrapInception``). This is
a from-scratch NHWC implementation of that architecture whose module/param
naming mirrors the torchvision state_dict so pretrained weights can be
ported mechanically (``port_torch_state_dict``). Runs entirely on device:
the 299x299 bilinear resize (align_corners=True, matching
inception_utils.py:49) lives in eval/inception.py.

All convs are bias-free + BatchNorm(eps=1e-3) + ReLU (torchvision
``BasicConv2d``); inference uses the ported running statistics.
"""
from __future__ import annotations

import functools
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.resize import max_pool

Dtype = Any


def _avg_pool_3x3_s1(x):
    """AvgPool2d(3, stride=1, padding=1, count_include_pad=True)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / 9.0


class BasicConv2d(nn.Module):
    out_channels: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_channels, self.kernel, strides=self.stride,
            padding=[(self.padding[0],) * 2, (self.padding[1],) * 2],
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, dtype=jnp.float32,
            param_dtype=jnp.float32, name="bn",
        )(x)
        return nn.relu(x).astype(self.dtype)


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), dtype=d,
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_s1(x)
        bp = BasicConv2d(self.pool_features, (1, 1), dtype=d,
                         name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(384, (3, 3), stride=(2, 2), dtype=d,
                         name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=(2, 2), dtype=d,
                         name="branch3x3dbl_3")(bd)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d, c7 = self.dtype, self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_s1(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b3 = BasicConv2d(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=(2, 2), dtype=d,
                         name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), dtype=d,
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), dtype=d,
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=(2, 2), dtype=d,
                         name="branch7x7x3_4")(b7)
        bp = max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        b1 = BasicConv2d(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                        name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1), dtype=d,
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), dtype=d,
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), dtype=d,
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = _avg_pool_3x3_s1(x)
        bp = BasicConv2d(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """The torchvision InceptionV3 trunk used by the FID wrapper: takes a
    299x299x3 normalized image, returns (pool2048, logits1000) — the exact
    layer sequence of reference inception_utils.py:50-92."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = self.dtype
        x = x.astype(d)
        x = BasicConv2d(32, (3, 3), stride=(2, 2), dtype=d,
                        name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), dtype=d,
                        name="Conv2d_2b_3x3")(x)
        x = max_pool(x, 3, 2)
        x = BasicConv2d(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = max_pool(x, 3, 2)
        x = InceptionA(32, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE(dtype=d, name="Mixed_7b")(x)
        x = InceptionE(dtype=d, name="Mixed_7c")(x)
        pool = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # (B, 2048)
        logits = nn.Dense(1000, dtype=jnp.float32, param_dtype=jnp.float32,
                          name="fc")(pool)
        return pool, logits


def init_inception(dtype=jnp.float32, seed: int = 0):
    """Template variables with pseudo-random values (used when pretrained
    weights are absent and by the port-parity tests).

    The tree is built from ``jax.eval_shape`` of the flax init (shape/dtype
    tracing only — never compiled or executed) and filled host-side: conv /
    fc kernels get small numpy normals, biases zero, BN stats the
    fresh-layer (0, 1). The values carry no contract — every real consumer
    overwrites them via port_torch_state_dict / load_weights_npz /
    resolve_pretrained — but compiling the 23M-param init graph costs ~12 s
    on this host's CPU backend (minutes through the TPU tunnel's AOT
    compiler), paid per process by every CLI stage that builds a wrapper.

    Memoized: the returned (model, variables) pair is SHARED between
    callers — treat the variables tree as read-only.
    """
    return _init_inception_cached(dtype, seed)


@functools.lru_cache(maxsize=2)
def _init_inception_cached(dtype, seed):
    import flax

    model = InceptionV3Features(dtype=dtype)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 299, 299, 3), jnp.float32))
    flat = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(lambda s: (s.shape, s.dtype), shapes),
        sep=".")
    rng = np.random.default_rng(seed)
    out = {}
    for key, (shape, dt) in flat.items():
        leaf = key.split(".")[-1]
        if leaf in ("scale", "var"):
            val = np.ones(shape)
        elif leaf in ("bias", "mean"):
            val = np.zeros(shape)
        else:  # conv/fc kernels: fan-in-ish scale keeps activations finite
            fan_in = int(np.prod(shape[:-1])) or 1
            val = rng.normal(0.0, fan_in ** -0.5, shape)
        out[key] = jnp.asarray(val.astype(dt))
    variables = flax.core.freeze(flax.traverse_util.unflatten_dict(
        out, sep="."))
    return model, flax.core.unfreeze(variables)


class _nullcontext:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def port_torch_state_dict(variables, state_dict):
    """Map a torchvision ``inception_v3`` state_dict onto our variables.

    Handles the naming convention: torch ``Mixed_5b.branch1x1.conv.weight``
    -> params[Mixed_5b][branch1x1][conv][kernel] (OIHW -> HWIO), BN
    weight/bias/running_mean/running_var -> scale/bias/mean/var.
    """
    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep=".")
    out = {}
    for key, val in flat.items():
        # key like 'params.Mixed_5b.branch1x1.conv.kernel'
        parts = key.split(".")
        collection, path, leaf = parts[0], parts[1:-1], parts[-1]
        torch_path = ".".join(p for p in path)
        if leaf == "kernel" and path[-1] == "conv":
            w = np.asarray(state_dict[f"{torch_path}.weight"])
            out[key] = jnp.asarray(w.transpose(2, 3, 1, 0))
        elif path and path[-1] == "fc":
            if leaf == "kernel":
                w = np.asarray(state_dict["fc.weight"])
                out[key] = jnp.asarray(w.T)
            else:
                out[key] = jnp.asarray(np.asarray(state_dict["fc.bias"]))
        elif path and path[-1] == "bn":
            if collection == "params":
                torch_leaf = {"scale": "weight", "bias": "bias"}[leaf]
            else:  # batch_stats
                torch_leaf = {"mean": "running_mean", "var": "running_var"}[leaf]
            out[key] = jnp.asarray(
                np.asarray(state_dict[f"{torch_path}.{torch_leaf}"]))
        else:
            raise KeyError(f"unmapped variable {key}")
        assert out[key].shape == val.shape, (
            f"{key}: {out[key].shape} vs {val.shape}")
    return flax.traverse_util.unflatten_dict(out, sep=".")


def torch_key_map(variables):
    """flax flat key ('params.Mixed_5b...conv.kernel') -> the torchvision
    state_dict key it is ported from. The exact inverse of
    ``port_torch_state_dict``'s mapping; used by the dump CLI and the
    in-image port fixtures."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep=".")
    mapping = {}
    for key in flat:
        parts = key.split(".")
        collection, path, leaf = parts[0], parts[1:-1], parts[-1]
        torch_path = ".".join(path)
        if leaf == "kernel" and path[-1] == "conv":
            mapping[key] = f"{torch_path}.weight"
        elif path and path[-1] == "fc":
            mapping[key] = f"fc.{'weight' if leaf == 'kernel' else 'bias'}"
        elif path and path[-1] == "bn":
            if collection == "params":
                torch_leaf = {"scale": "weight", "bias": "bias"}[leaf]
            else:
                torch_leaf = {"mean": "running_mean",
                              "var": "running_var"}[leaf]
            mapping[key] = f"{torch_path}.{torch_leaf}"
        else:
            raise KeyError(f"unmapped variable {key}")
    return mapping


def save_weights_npz(variables, path):
    """Serialize ported Inception variables to a flat npz archive (keys are
    '.'-joined variable paths). The format ``--inception-weights`` loads."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep=".")
    # uncompressed: f32 weight tensors barely deflate (~5%) and zlib costs
    # multiple seconds per save/load of the 90 MB tree
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_weights_npz(variables, path):
    """Load an npz written by ``save_weights_npz`` into the shape of the
    given template ``variables`` (shape-checked leaf by leaf).

    Also accepts a STATS-ONLY archive (every key under ``batch_stats.``,
    as written by ``eval/calibrate.py``): BN running stats load from the
    file and every other leaf keeps its template value — calibration
    only moves the normalization statistics, so a ~100 KB archive stands
    in for the full 90 MB tree."""
    import flax

    flat = flax.traverse_util.flatten_dict(variables, sep=".")
    with np.load(path) as data:
        stats_only = all(k.startswith("batch_stats.") for k in data.files)
        expected = [k for k in flat
                    if not stats_only or k.startswith("batch_stats.")]
        missing = [k for k in expected if k not in data.files]
        if missing:
            raise KeyError(
                f"{path} is missing {len(missing)} inception variables "
                f"(first: {missing[0]}) — was it written by "
                "save_weights_npz / the dump-inception-weights CLI?")
        out = {}
        for key, val in flat.items():
            if key not in data.files:
                out[key] = jnp.asarray(val)  # template value (stats-only)
                continue
            arr = data[key]
            if arr.shape != val.shape:
                raise ValueError(
                    f"{path}: {key} has shape {arr.shape}, "
                    f"expected {val.shape}")
            out[key] = jnp.asarray(arr, val.dtype)
    return flax.traverse_util.unflatten_dict(out, sep=".")


WEIGHTS_ENV_VAR = "TARTANGAN_INCEPTION_WEIGHTS"


def resolve_pretrained(variables, weights_path=None):
    """Resolve pretrained Inception weights: an explicit npz path wins,
    then the TARTANGAN_INCEPTION_WEIGHTS env var, then a local torchvision
    install; otherwise keep the given (random) variables.

    Returns (variables, pretrained: bool). The npz path is produced by
    ``python -m tartangan_tpu.eval.port_weights`` from any torchvision
    inception_v3 state_dict — the weights themselves cannot be fetched in a
    zero-egress image, so they arrive as a user-supplied artifact.
    """
    import os

    path = weights_path or os.environ.get(WEIGHTS_ENV_VAR)
    if path:
        return load_weights_npz(variables, path), True
    return try_load_pretrained(variables)


def try_load_pretrained(variables):
    """Port torchvision's pretrained weights if they are available locally
    (zero-egress environments fall back to the given variables)."""
    try:
        from torchvision.models import inception_v3  # noqa: PLC0415
        net = inception_v3(pretrained=True, transform_input=False)
        return port_torch_state_dict(
            variables, net.state_dict()), True
    except Exception as e:  # pragma: no cover - depends on weight cache
        print(f"[inception] pretrained weights unavailable ({e}); "
              "using provided init")
        return variables, False
