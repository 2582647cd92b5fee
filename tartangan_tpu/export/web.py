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
            self._export_onnx(out_base)

    def _export_onnx(self, out_base):
        """Emit the ONNX artifact for the in-browser demo (web/index.html).

        Uses our own ModelProto emitter (export/onnx.py) — no onnx package
        needed. The graph bakes eval-mode BatchNorm (running stats) into
        constants, so it matches ``g.apply(train=False)``; output layout is
        NCHW (the browser page handles the canvas transpose)."""
        from .onnx import export_generator
        from .onnx_eval import evaluate

        model_bytes = export_generator(
            self.g, self.g_vars, batch_size=self.args.batch_size)
        with open(f"{out_base}.onnx", "wb") as f:
            f.write(model_bytes)
        # sanity roundtrip through the numpy interpreter
        z = np.zeros((self.args.batch_size, self.gan_config.latent_dims),
                     np.float32)
        out = evaluate(model_bytes, {"z": z})["image"]
        assert out.shape == (self.args.batch_size,
                             self.gan_config.data_dims,
                             self.gan_config.max_size,
                             self.gan_config.max_size)
        print(f"wrote {out_base}.onnx ({len(model_bytes)} bytes)")
        if self.args.page:
            import shutil
            page_src = os.path.join(
                os.path.dirname(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__)))), "web", "index.html")
            dest_dir = os.path.dirname(out_base) or "."
            shutil.copy(page_src, os.path.join(dest_dir, "index.html"))
            print(f"wrote {dest_dir}/index.html "
                  "(serve the directory and open it)")

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
                       help="Also emit a .onnx artifact for the in-browser "
                            "demo (self-contained emitter, no onnx package)")
        p.add_argument("--page", action="store_true",
                       help="With --onnx: copy the static demo page "
                            "(web/index.html) next to the artifact")


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
