"""Package a trained generator for serving/web deployment.

Parity: reference tartangan/prep4web.py — wraps the generator so its output
layout suits an HTML canvas (reference permutes NCHW->NWHC,
prep4web.py:7-20; we start from NHWC so the permute is H<->W), strips
training-only machinery, and serializes a deployable artifact.

TPU-native export format: StableHLO via ``jax.export`` (the portable XLA
program format — loadable from any PJRT runtime, and convertible to ONNX
with external tooling). When the ``onnx`` package is importable we also
emit an ONNX graph for the reference's ONNX.js browser demo path; in this
image it is absent and the ONNX branch is gated.

Usage: python -m tartangan_tpu.export.web CHECKPOINT_ROOT --output ttgan
"""
from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..explore.base import GOutputApp


class WebExportApp(GOutputApp):
    app_name = "Package generator for web"

    def run(self):
        self.load_generator(target=not self.args.no_target)
        cfg = self.gan_config
        batch = self.args.batch_size
        g_vars = self.g_vars
        g = self.g

        def web_forward(z):
            """z (B, latent) -> image (B, W, H, C) float in [-1, 1]
            (canvas-friendly NWHC, reference prep4web.py:18-19)."""
            imgs, _ = g.apply(g_vars, z, train=True,
                              mutable=["batch_stats"])
            return jnp.transpose(imgs, (0, 2, 1, 3)).astype(jnp.float32)

        z_spec = jax.ShapeDtypeStruct((batch, cfg.latent_dims), jnp.float32)
        exported = jax.export.export(jax.jit(web_forward))(z_spec)
        blob = exported.serialize()

        out_base = self.args.output
        if os.path.dirname(out_base):
            os.makedirs(os.path.dirname(out_base), exist_ok=True)
        with open(f"{out_base}.stablehlo", "wb") as f:
            f.write(blob)
        meta = {
            "latent_dims": cfg.latent_dims,
            "image_size": cfg.max_size,
            "batch_size": batch,
            "layout": "NWHC",
            "value_range": [-1.0, 1.0],
            "format": "jax.export serialized StableHLO",
        }
        with open(f"{out_base}.json", "w") as f:
            json.dump(meta, f, indent=2)
        print(f"wrote {out_base}.stablehlo ({len(blob)} bytes) "
              f"and {out_base}.json")

        # sanity roundtrip: deserialize + run
        rehydrated = jax.export.deserialize(blob)
        z = np.zeros((batch, cfg.latent_dims), np.float32)
        out = rehydrated.call(z)
        assert out.shape == (batch, cfg.max_size, cfg.max_size,
                             cfg.data_dims)

        if self.args.onnx:
            self._export_onnx(web_forward, z_spec, out_base)

    def _export_onnx(self, fn, z_spec, out_base):
        try:
            import onnx  # noqa: F401, PLC0415
        except ImportError:
            print("[export] onnx not installed; skipping .onnx artifact "
                  "(the .stablehlo artifact is the portable format here)")
            return
        # Placeholder for jax->onnx conversion tooling (not available in
        # this environment); kept gated for parity with prep4web's opset-7
        # export surface.
        print("[export] ONNX export requires jax->onnx tooling; "
              "not available in this environment")

    @classmethod
    def add_args_to_parser(cls, p):
        p.add_argument("checkpoint_root",
                       help="Path to a checkpoint step dir or run dir.")
        p.add_argument("--trunc-norm", type=float, default=None)
        p.add_argument("--output", default="ttgan")
        p.add_argument("--batch-size", default=1, type=int)
        p.add_argument("--no-target", action="store_true",
                       help="Export the live G instead of the EMA target G")
        p.add_argument("--onnx", action="store_true",
                       help="Also attempt an ONNX export (needs onnx)")


# reference parse: prep4web exposes `package_for_web(model, filename)`
def package_for_web(generator_app: GOutputApp, filename: str,
                    batch_size: int = 1):
    """Programmatic entry mirroring reference prep4web.py:23-30."""
    generator_app.args.output = filename
    generator_app.args.batch_size = batch_size
    generator_app.run()


def main():
    WebExportApp.run_from_cli()


if __name__ == "__main__":
    main()
