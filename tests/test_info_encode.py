"""info_encode explore app against a freshly trained InfoGAN checkpoint."""
import os
import pickle

import numpy as np
from PIL import Image

from tartangan_tpu.train.info import InfoTrainer


def test_info_encode_roundtrip(tiny_archive, tmp_path):
    argv = [
        tiny_archive, "--config", "8", "--batch-size", "8",
        "--epochs", "1", "--output", str(tmp_path / "out"),
        "--gen-freq", "100", "--run-id", "enc",
        "--dtype", "f32", "--quiet-logs",
        "--info-cat-dims", "4", "--info-cont-dims", "2",
    ]
    trainer = InfoTrainer.create_from_cli(argv)
    trainer.train()
    run = str(tmp_path / "out" / "enc")

    # target images to encode
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (16, 16, 3),
                                     dtype=np.uint8)).save(
            img_dir / f"t{i}.png")

    from tartangan_tpu.explore.info_encode import InfoGANEncodeImage
    out = tmp_path / "enc_out" / "codes"
    app = InfoGANEncodeImage(InfoGANEncodeImage.parse_cli_args(
        [run, str(out), str(img_dir / "*.png"), "--batch-size", "2"]))
    app.run()

    with open(f"{out}_codes.pkl", "rb") as f:
        data = pickle.load(f)
    assert len(data["id"]) == 3
    assert data["features"][0].shape == (6,)  # cat 4 + cont 2
