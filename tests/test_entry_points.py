"""Every console script's target module imports and exposes main()."""
import importlib

import pytest

ENTRY_POINTS = [
    "tartangan_tpu.scraper",
    "tartangan_tpu.train.cnn",
    "tartangan_tpu.train.iqn",
    "tartangan_tpu.train.info",
    "tartangan_tpu.train.scene",
    "tartangan_tpu.train.text_cnn",
    "tartangan_tpu.train.shared.cnn",
    "tartangan_tpu.train.shared.iqn",
    "tartangan_tpu.data.image_bytes",
    "tartangan_tpu.data.synthetic",
    "tartangan_tpu.eval.moments",
    "tartangan_tpu.export.web",
    "tartangan_tpu.serve",
]


@pytest.mark.parametrize("module_name", ENTRY_POINTS)
def test_entry_point_importable(module_name):
    module = importlib.import_module(module_name)
    assert callable(getattr(module, "main"))


def test_setup_py_lists_all_entry_points():
    setup = open("setup.py").read()
    for module_name in ENTRY_POINTS:
        assert module_name in setup, f"{module_name} missing from setup.py"
