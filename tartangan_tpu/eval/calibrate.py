"""Data-dependent calibration of surrogate InceptionV3 weights.

The real FID contract needs torchvision's pretrained weights
(reference inception_utils.py:262-283), which this zero-egress image
cannot fetch. The previous stand-in — deterministic pseudo-random
weights with fresh-layer BN stats (mean 0, var 1) — is *weakly
discriminative*: through 94 random conv+BN+ReLU layers the activation
scale collapses/saturates, the pool2048 features barely move with input
changes, and the measured FID-vs-steps curve was noise (docs/PERF.md
round-3 production run; VERDICT r4 weak #5).

This module fixes the scale collapse without any training: it
CALIBRATES every BatchNorm's running statistics to the actual moments
of its input activations on a reference image set (the classic
data-dependent / LSUV-style init, applied to the BN stats instead of
the weights). Each round forwards a batch with flax
``capture_intermediates`` over the ``conv`` submodules, computes each
conv output's per-channel mean/var, and writes them into the sibling
``bn``'s running stats — strictly in topological (call) order, one
frozen slice of layers per round, so every written stat is exact under
the final variables (see ``calibrate_variables``). Every BN input then
sits at ~N(0,1) per channel, the random projections stay in their
linear range all the way to pool2048 — random-feature FID with healthy
conditioning. The weight VALUES stay random; only the normalization
statistics are data-dependent.

CLI:
  python -m tartangan_tpu.eval.calibrate DATA.npz OUT.npz \
      [--batch-size 16] [--validate]

``--validate`` prints a three-way discriminativeness check (FID between
two disjoint halves of the set, vs a blurred copy, vs uniform noise —
a usable surrogate must order them holdout << blurred < noise).
The OUT.npz loads anywhere ``--inception-weights`` is accepted.
"""
from __future__ import annotations

import numpy as np


def _prep_batch(u8, size=299):
    """uint8 (B, H, W, 3) -> the wrapper's VGG-normalized 299px f32."""
    import jax.numpy as jnp

    from ..ops.resize import resize_bilinear
    from .inception import VGG_MEAN, VGG_STD
    x = u8.astype(np.float32) / 255.0
    x = (x - VGG_MEAN) / VGG_STD
    x = jnp.asarray(x)
    if x.shape[1] != size or x.shape[2] != size:
        x = resize_bilinear(x, size, size, align_corners=True)
    return x


def _conv_bn_pairs(intermediates):
    """(bn batch_stats path, conv output) pairs from a capture tree."""
    import flax
    flat = flax.traverse_util.flatten_dict(intermediates)
    out = []
    for path, val in flat.items():
        if len(path) >= 2 and path[-2] == "conv" and path[-1] == "__call__":
            y = val[0] if isinstance(val, tuple) else val
            out.append((path[:-2] + ("bn",), y))
    return out


def _bn_levels(order):
    """Topological LEVEL per bn path (level-k stats are exact once all
    levels < k are frozen), derived from InceptionV3's naming structure:
    the stem convs are sequential, and within a Mixed block the branches
    are parallel chains whose position is the trailing ``_<n><a|b>?``
    tag (``branch1x1`` / ``branch_pool`` are chain position 1;
    ``branch3x3dbl_3a`` and ``_3b`` are both position 3 — parallel
    consumers of ``_2``). Successive blocks stack on the previous
    block's deepest chain."""
    import re
    levels = {}
    base = 0
    cur_block = None
    block_max = 0
    for path in order:
        top = path[0]
        if top.startswith("Conv2d"):  # sequential stem
            base += 1
            levels[path] = base
            cur_block, block_max = None, 0
            continue
        if top != cur_block:  # entering a new Mixed block
            base += block_max
            cur_block, block_max = top, 0
        m = re.search(r"_(\d+)[ab]?$", path[1])
        local = int(m.group(1)) if m else 1
        block_max = max(block_max, local)
        levels[path] = base + local
    return levels


def calibrate_variables(images_u8, rounds=None, batch_size=8, seed=0,
                        var_floor=1e-3):
    """Return calibrated Inception variables (model, variables).

    ``images_u8``: (N, H, W, 3) uint8 reference set. Calibration is
    LSUV-style and strictly topological: round r writes stats ONLY for
    the BNs at dependency level r (``_bn_levels``) — every such layer
    has all its upstream BNs already frozen, so its measured moments are
    exact under the final variables and are never revisited. (The first
    implementation rewrote ALL stats every round — a simultaneous
    fixed-point update that oscillates through 94 layers of random
    weights: stats stayed ~1e20 off their activations. A call-order
    slice scheme fails the same way whenever a slice contains an
    intra-slice chain. Level-by-level converges by construction.)

    ``rounds`` caps how many levels run (None = all of them — one
    forward per level, ~47 for InceptionV3).
    """
    import jax
    import jax.numpy as jnp

    from ..models.inception import init_inception
    model, template = init_inception()
    # the cached template is shared & read-only — deep-copy before editing
    variables = jax.tree_util.tree_map(np.array, template)

    def fwd_moments(vars_, x):
        _, state = model.apply(
            vars_, x,
            capture_intermediates=lambda mdl, name: (
                name == "__call__" and mdl.name == "conv"))
        pairs = _conv_bn_pairs(state["intermediates"])
        moments = {}
        for bn_path, y in pairs:
            # Before calibration reaches a layer, its input can sit many
            # orders of magnitude off (random weights compound ~x4 per
            # conv): normalize by the per-channel max so mean/var of the
            # SCALED tensor stay inside f32, and rebuild the true moments
            # host-side in f64. Deep layers whose activations already
            # overflowed to inf produce nan here and are skipped by the
            # caller — the calibrated frontier advances every round.
            y32 = y.astype(jnp.float32)
            s = jnp.maximum(jnp.max(jnp.abs(y32), axis=(0, 1, 2)), 1.0)
            yn = y32 / s
            mn = jnp.mean(yn, axis=(0, 1, 2))
            vn = jnp.mean(jnp.square(yn), axis=(0, 1, 2)) - jnp.square(mn)
            moments[bn_path] = (mn, vn, s)
        return moments

    fwd_moments = jax.jit(fwd_moments)
    rng = np.random.default_rng(seed)
    import flax
    # largest stats representable such that (y - m) / sqrt(v) stays finite
    f32_cap = np.float64(1e37)
    # call-order layer list (shape-level capture, no execution)
    _, shapes = jax.eval_shape(
        lambda v, xx: model.apply(
            v, xx, capture_intermediates=lambda mdl, name: (
                name == "__call__" and mdl.name == "conv")),
        variables, _prep_batch(images_u8[:1]))
    order = [p for p, _ in _conv_bn_pairs(shapes["intermediates"])]
    levels = _bn_levels(order)
    level_list = sorted(set(levels.values()))
    if rounds is not None:
        level_list = level_list[:rounds]
    for lv in level_list:
        active = {p for p, plv in levels.items() if plv == lv}
        idx = rng.choice(len(images_u8), size=batch_size, replace=False)
        x = _prep_batch(images_u8[idx])
        moments = jax.device_get(fwd_moments(variables, x))
        bs = flax.traverse_util.flatten_dict(variables["batch_stats"])
        for bn_path, (mn, vn, s) in moments.items():
            if bn_path not in active:
                continue  # upstream slices are frozen, later ones waiting
            s64 = np.asarray(s, np.float64)
            m = np.asarray(mn, np.float64) * s64
            v = np.asarray(vn, np.float64) * s64 * s64
            if not (np.isfinite(m).all() and np.isfinite(v).all()):
                continue
            m = np.clip(m, -f32_cap, f32_cap)
            v = np.clip(v, var_floor, f32_cap)
            bs[bn_path + ("mean",)] = m.astype(np.float32)
            bs[bn_path + ("var",)] = v.astype(np.float32)
        variables = dict(variables)
        variables["batch_stats"] = flax.traverse_util.unflatten_dict(bs)
    return model, variables


def save_stats_npz(variables, path):
    """Write ONLY the calibrated batch_stats (~100 KB vs the 90 MB full
    tree — the conv/fc params are the deterministic ``init_inception``
    template and need not be stored). ``load_weights_npz`` /
    ``--inception-weights`` accept the stats-only archive directly."""
    import flax
    flat = flax.traverse_util.flatten_dict(
        {"batch_stats": variables["batch_stats"]}, sep=".")
    np.savez(path, **{k: np.asarray(v) for k, v in flat.items()})


def _pool_features(wrapper, images_u8, batch_size=64):
    """pool2048 features for a uint8 image set, batched on device."""
    feats = []
    n = (len(images_u8) // batch_size) * batch_size
    for i in range(0, n, batch_size):
        x = images_u8[i:i + batch_size].astype(np.float32) / 127.5 - 1.0
        pool, _ = wrapper(x)
        feats.append(np.asarray(pool, np.float32))
    return np.concatenate(feats, axis=0)


def fid_between(wrapper, a_u8, b_u8, batch_size=64):
    from .fid import numpy_frechet_distance
    fa = _pool_features(wrapper, a_u8, batch_size)
    fb = _pool_features(wrapper, b_u8, batch_size)
    mu_a, mu_b = fa.mean(0), fb.mean(0)
    sa = np.cov(fa, rowvar=False)
    sb = np.cov(fb, rowvar=False)
    return float(numpy_frechet_distance(mu_a, sa, mu_b, sb))


def validate_weights(weights_path, images_u8, n=2048, batch_size=64,
                     seed=0):
    """Three-way discriminativeness check; returns the dict of FIDs."""
    from scipy.ndimage import uniform_filter
    from .inception import InceptionWrapper
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(images_u8))
    half = min(n, len(images_u8) // 2)
    a = images_u8[idx[:half]]
    b = images_u8[idx[half:2 * half]]
    blurred = uniform_filter(
        a.astype(np.float32), size=(1, 5, 5, 1)).astype(np.uint8)
    noise = rng.integers(0, 256, a.shape, dtype=np.uint8)
    wrapper = InceptionWrapper(weights=weights_path)
    out = {
        "fid_holdout": fid_between(wrapper, a, b, batch_size),
        "fid_blurred": fid_between(wrapper, a, blurred, batch_size),
        "fid_noise": fid_between(wrapper, a, noise, batch_size),
    }
    out["ordered"] = (out["fid_holdout"] < out["fid_blurred"]
                      < out["fid_noise"])
    return out


def main(argv=None):
    import argparse

    from ..utils.fs import smart_open

    p = argparse.ArgumentParser(
        description="Calibrate surrogate Inception weights on an image "
                    "archive (BN running stats <- data moments).")
    p.add_argument("dataset", help="npz archive with an 'images' array")
    p.add_argument("destination", help="output weights npz")
    p.add_argument("--rounds", type=int, default=None,
                   help="cap the number of call-order slices calibrated "
                        "(default: all of them)")
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--validate", action="store_true",
                   help="run the three-way discriminativeness check on "
                        "the calibrated weights")
    p.add_argument("--validate-n", type=int, default=2048)
    args = p.parse_args(argv)

    with smart_open(args.dataset, "rb") as f:
        images = np.load(f)["images"]
    _, variables = calibrate_variables(
        images, rounds=args.rounds, batch_size=args.batch_size,
        seed=args.seed)
    save_stats_npz(variables, args.destination)
    print(f"calibrated BN stats (levels) -> {args.destination}")
    if args.validate:
        checks = validate_weights(args.destination, images,
                                  n=args.validate_n)
        print("discriminativeness:", checks)


if __name__ == "__main__":
    main()
