"""utils coverage: fs helpers, cli replay files, slerp, imaging."""
import numpy as np
import pytest

from tartangan_tpu.utils.cli import save_cli_arguments, type_or_none
from tartangan_tpu.utils.fs import (
    is_s3_path,
    list_files_recursive,
    maybe_makedirs,
    smart_ls,
    smart_open,
)
from tartangan_tpu.utils.imaging import make_grid, save_image, to_uint8
from tartangan_tpu.utils.slerp import slerp, slerp_grid


def test_smart_open_local_roundtrip(tmp_path):
    path = tmp_path / "deep" / "dir" / "f.txt"
    with smart_open(str(path), "w") as f:
        f.write("hello")
    with smart_open(str(path), "r") as f:
        assert f.read() == "hello"


def test_maybe_makedirs_s3_noop():
    maybe_makedirs("s3://bucket/prefix")  # must not raise


def test_is_s3():
    assert is_s3_path("s3://b/k")
    assert not is_s3_path("/tmp/x")


def test_smart_ls_local(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b.txt").write_text("x")
    assert sorted(smart_ls(str(tmp_path))) == ["a", "b.txt"]
    assert smart_ls(str(tmp_path / "missing")) == []


def test_list_files_recursive(tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "x.PNG").write_bytes(b"")
    (tmp_path / "y.jpg").write_bytes(b"")
    (tmp_path / "z.txt").write_bytes(b"")
    files = list_files_recursive(str(tmp_path), (".png", ".jpg"))
    assert len(files) == 2


def test_save_cli_arguments_explicit_argv(tmp_path):
    path = tmp_path / "config.args"
    save_cli_arguments(str(path), argv=["data.npz", "--config", "32"])
    assert path.read_text().splitlines() == ["data.npz", "--config", "32"]


def test_save_cli_arguments_argfile_copy(tmp_path):
    src = tmp_path / "in.args"
    src.write_text("data\n--batch-size\n8\n")
    out = tmp_path / "out.args"
    save_cli_arguments(str(out), argv=[f"@{src}"])
    assert out.read_text().splitlines() == ["data", "--batch-size", "8"]


def test_type_or_none():
    f = type_or_none(int)
    assert f("None") is None
    assert f(None) is None
    assert f("7") == 7


def test_slerp_endpoints(rng):
    a = rng.standard_normal(8)
    b = rng.standard_normal(8)
    np.testing.assert_allclose(slerp(0.0, a, b), a, atol=1e-9)
    np.testing.assert_allclose(slerp(1.0, a, b), b, atol=1e-9)


def test_slerp_grid_shape(rng):
    zs = rng.standard_normal((4, 8))
    grid = slerp_grid(*zs, 3, 5)
    assert grid.shape == (15, 8)


def test_imaging_grid_and_save(tmp_path, rng):
    imgs = rng.standard_normal((5, 6, 6, 3)).astype(np.float32)
    u8 = to_uint8(imgs)
    assert u8.dtype == np.uint8
    grid = make_grid(u8, nrow=3, padding=1)
    assert grid.shape == (2 * 6 + 3, 3 * 6 + 4, 3)
    out = tmp_path / "g.png"
    save_image(imgs, str(out), nrow=3)
    assert out.exists()


def test_profiler_component_timing(tmp_path):
    from collections import defaultdict
    from types import SimpleNamespace

    from tartangan_tpu.train.components.profiler import ProfilerComponent
    args = SimpleNamespace(profile_dir=None, profile_start=10,
                           profile_steps=5, timing_freq=2, batch_size=4)
    comp = ProfilerComponent(args)
    comp.trainer = SimpleNamespace(args=args)
    logs = defaultdict(list)
    comp.on_train_begin(0, logs)
    for step in range(5):
        comp.on_batch_begin(step, logs)
        comp.on_batch_end(step, logs)
    assert len(logs["images_per_sec"]) == 2  # steps 2 and 4
    assert all(v > 0 for v in logs["images_per_sec"])
