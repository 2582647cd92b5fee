"""North-star FID recipe, pinned end-to-end at the CLI level.

The zero-egress build image cannot obtain torchvision's pretrained
InceptionV3 weights, so the absolute-FID north star (BASELINE.json)
cannot be measured here. This test keeps the path WARM (VERDICT r3 #8):
it runs the EXACT four-command sequence docs/PERF.md prescribes, with
the deterministic fixture weights standing in for the real .pth — so
the day real weights are available, the real measurement is re-running
these commands with that file:

    python -m tartangan_tpu.eval.port_weights inception.pth inception.npz
    python -m tartangan_tpu.data.synthetic data.npz --num N --size S
    python -m tartangan_tpu.eval.moments data.npz moments.npz \
        --inception-weights inception.npz
    python -m tartangan_tpu.train.cnn data.npz --fid \
        --inception-moments moments.npz --inception-weights inception.npz

Reference surface: tartangan/inception_utils.py:285-328 (moments prep)
and components/metrics (FID component wiring).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.mark.slow
def test_fid_recipe_cli_end_to_end(tmp_path):
    from test_inception_weights import synthetic_state_dict

    from tartangan_tpu.models.inception import init_inception

    # 0. port: torchvision-schema .pth -> npz (the one step that needs
    # the real download; fixture weights have the exact key/shape schema)
    _, template = init_inception()
    pth = tmp_path / "inception.pth"
    torch.save({k: torch.from_numpy(v)
                for k, v in synthetic_state_dict(template).items()},
               str(pth))
    npz = str(tmp_path / "inception.npz")
    from tartangan_tpu.eval import port_weights
    port_weights.main([str(pth), npz])

    # 1. dataset
    from tartangan_tpu.data import synthetic
    data = str(tmp_path / "data.npz")
    synthetic.main([data, "--num", "16", "--size", "16"])

    # 2. moments of the dataset under the ported weights
    from tartangan_tpu.eval import moments
    mpath = str(tmp_path / "moments.npz")
    moments.main([data, mpath, "--batch-size", "8",
                  "--inception-weights", npz, "--quiet-logs"])
    m = np.load(mpath)
    assert m["mu"].shape == (2048,) and m["sigma"].shape == (2048, 2048)

    # 3. train with --fid against those moments + weights
    from tartangan_tpu.train.cnn import CNNTrainer
    # batch_end sees steps BEFORE the increment (reference trainer.py:99,105)
    # so with 2 batches/epoch the component fires at steps==2: epoch 2, batch 1
    trainer = CNNTrainer.create_from_cli([
        data, "--config", "16", "--batch-size", "8", "--epochs", "2",
        "--output", str(tmp_path / "out"), "--run-id", "fidrec",
        "--gen-freq", "100", "--checkpoint-freq", "100", "--quiet-logs",
        "--fid", "--fid-freq", "2", "--n-inception-imgs", "8",
        "--inception-moments", mpath, "--inception-weights", npz,
    ])
    trainer.train()
    fids = [float(v) for v in trainer.logs.get("fid", [])]
    assert fids, "FID component never fired"
    assert all(np.isfinite(v) and v >= 0 for v in fids)
