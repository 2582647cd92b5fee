"""Convert torchvision InceptionV3 weights to the npz ``--inception-weights``
format.

The FID contract (reference inception_utils.py:262-328) requires the
*pretrained* torchvision ``inception_v3`` weights; this zero-egress image
cannot download them, so they arrive as a user artifact — either a
state_dict file saved with ``torch.save`` (any machine with torchvision:
``torch.save(inception_v3(pretrained=True).state_dict(), 'w.pth')``) or a
local torchvision install with a populated weight cache. Usage:

    python -m tartangan_tpu.eval.port_weights SOURCE.pth OUT.npz
    python -m tartangan_tpu.eval.port_weights torchvision OUT.npz

The output npz loads via ``--inception-weights OUT.npz`` on the FID
component / moments CLI, or the TARTANGAN_INCEPTION_WEIGHTS env var.
"""
from __future__ import annotations


def load_torch_state_dict(source: str):
    """Read a torch state_dict from a .pth/.pt file (raw state_dict or a
    checkpoint dict wrapping one) or from an installed torchvision."""
    if source == "torchvision":
        from torchvision.models import inception_v3
        return inception_v3(pretrained=True,
                            transform_input=False).state_dict()
    import torch

    obj = torch.load(source, map_location="cpu", weights_only=True)
    if not hasattr(obj, "keys"):
        raise ValueError(f"{source} does not contain a state_dict")
    if "state_dict" in obj and hasattr(obj["state_dict"], "keys"):
        obj = obj["state_dict"]
    # tolerate DataParallel-style 'module.' prefixes
    return {k.removeprefix("module."): v for k, v in obj.items()}


def port(source: str, destination: str):
    from ..models.inception import (
        init_inception,
        port_torch_state_dict,
        save_weights_npz,
    )

    state_dict = load_torch_state_dict(source)
    _, template = init_inception()
    variables = port_torch_state_dict(template, state_dict)
    save_weights_npz(variables, destination)
    import numpy as np

    n = sum(int(np.prod(tuple(v.shape))) for v in state_dict.values())
    print(f"ported {n} torch weights -> {destination}")


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Port torchvision inception_v3 weights to the npz "
                    "format --inception-weights consumes.")
    p.add_argument("source",
                   help="torch state_dict file (.pth/.pt), or 'torchvision' "
                        "to read an installed torchvision's weight cache")
    p.add_argument("destination", help="Output npz path")
    args = p.parse_args(argv)
    port(args.source, args.destination)


if __name__ == "__main__":
    main()
