"""Test config: force an 8-virtual-device CPU mesh before any computation.

This image's sitecustomize registers the axon TPU plugin and *overwrites*
``jax_platforms`` at interpreter start, so env vars alone don't stick — we
must call ``jax.config.update`` after import. XLA_FLAGS must be set before
the CPU client is instantiated (first computation), which this file
guarantees by running before any test module.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: this box has ONE cpu core, and jit-compiling
# the same tiny G/D graphs dominates suite wall-clock — cache them across
# tests and across runs (cache lives outside the repo tree)
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/tartangan_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def tiny_archive(tmp_path, rng):
    """A tiny pre-resized uint8 image archive on disk (.npz)."""
    images = rng.integers(0, 256, size=(24, 16, 16, 3), dtype=np.uint8)
    path = tmp_path / "data.npz"
    np.savez_compressed(path, images=images)
    return str(path)
