"""Surrogate-weight calibration (eval/calibrate.py): BN running stats
get replaced by data moments, layer by layer, and the calibrated tree
round-trips through the --inception-weights npz format."""
import numpy as np

from tartangan_tpu.eval.calibrate import (
    _conv_bn_pairs,
    calibrate_variables,
)


def test_calibrate_converges(rng):
    """After full calibration every BN's stored stats match the actual
    activation moments under the FINAL variables — the property the
    frozen-prefix topological scheme guarantees by construction (a
    simultaneous update oscillated ~1e20 off; this is the regression
    pin for that bug)."""
    import flax
    import jax

    from tartangan_tpu.eval.calibrate import _conv_bn_pairs, _prep_batch
    images = rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
    model, variables = calibrate_variables(images, batch_size=4)
    x = _prep_batch(images[:8])
    _, state = model.apply(
        variables, x,
        capture_intermediates=lambda mdl, name: (
            name == "__call__" and mdl.name == "conv"))
    bs = flax.traverse_util.flatten_dict(variables["batch_stats"])
    ratios = []
    for bn_path, y in _conv_bn_pairs(state["intermediates"]):
        y = np.asarray(y, np.float64)
        v_actual = max(float(y.var(axis=(0, 1, 2)).mean()), 1e-3)
        v_stored = max(float(np.mean(bs[bn_path + ("var",)])), 1e-3)
        ratios.append(v_actual / v_stored)
    ratios = np.array(ratios)
    # different batches than calibration saw -> sampling noise, but every
    # layer must be within a small constant factor (vs 1e20 divergence)
    assert float(np.median(ratios)) < 4.0
    assert float(ratios.max()) < 64.0


def test_calibrate_writes_data_stats(tmp_path, rng):
    images = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)
    model, variables = calibrate_variables(images, rounds=2, batch_size=4)
    import flax
    bs = flax.traverse_util.flatten_dict(variables["batch_stats"])
    means = [v for k, v in bs.items() if k[-1] == "mean"]
    vars_ = [v for k, v in bs.items() if k[-1] == "var"]
    # every BN was calibrated: stats are finite, variances positive, and
    # the tree moved off the fresh-layer (0, 1) init
    assert all(np.isfinite(m).all() for m in means)
    assert all((v > 0).all() for v in vars_)
    assert any(float(np.abs(m).max()) > 1e-3 for m in means)
    assert any(float(np.abs(v - 1.0).max()) > 1e-3 for v in vars_)

    # the calibrated tree round-trips through the STATS-ONLY npz format:
    # load_weights_npz merges the archive's batch_stats over the
    # deterministic template params (the ~100 KB fixture form)
    from tartangan_tpu.eval.calibrate import save_stats_npz
    from tartangan_tpu.models.inception import (
        init_inception,
        load_weights_npz,
    )
    path = str(tmp_path / "cal_stats.npz")
    save_stats_npz(variables, path)
    import os
    assert os.path.getsize(path) < 2 ** 20  # stats-only stays tiny
    _, template = init_inception()
    loaded = load_weights_npz(template, path)
    flat_a = flax.traverse_util.flatten_dict(variables)
    flat_b = flax.traverse_util.flatten_dict(loaded)
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(
            np.asarray(flat_a[k], np.float32),
            np.asarray(flat_b[k], np.float32), err_msg="/".join(k))


def test_conv_bn_pair_paths_match_batch_stats():
    """Every captured conv's sibling-bn path must exist in batch_stats —
    the path arithmetic the calibration writes through."""
    import flax
    import jax
    import jax.numpy as jnp

    from tartangan_tpu.models.inception import init_inception
    model, variables = init_inception()
    x = jnp.zeros((1, 299, 299, 3), jnp.float32)
    _, state = jax.eval_shape(
        lambda v, xx: model.apply(
            v, xx, capture_intermediates=lambda mdl, name: (
                name == "__call__" and mdl.name == "conv")),
        variables, x)
    pairs = _conv_bn_pairs(state["intermediates"])
    assert len(pairs) > 90  # InceptionV3 has 94 conv/bn units
    bs = flax.traverse_util.flatten_dict(variables["batch_stats"])
    for bn_path, _y in pairs:
        assert bn_path + ("mean",) in bs
        assert bn_path + ("var",) in bs
