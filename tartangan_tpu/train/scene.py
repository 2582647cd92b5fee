"""Scene trainer — structured patch-composition generator.

Parity: reference tartangan/trainers/scene.py:27-190 — the CNN loop (BCE +
R1 + EMA) with a StructuredSceneGenerator and extra CLI flags
``--scene-size/--patch-size/--num-patches/--refine-patches/--patch-noise``.
Patch noise is threaded through a dedicated 'scene' rng collection.
"""
from __future__ import annotations

from ..models.scene import StructuredSceneGenerator
from .cnn import CNNTrainer, make_cnn_train_step


class SceneTrainer(CNNTrainer):
    def build_generator(self):
        args = self.args
        return StructuredSceneGenerator(
            self.gan_config,
            scene_size=args.scene_size,
            patch_size=args.patch_size,
            num_patches=args.num_patches,
            refine_patches=args.refine_patches,
            patch_noise=args.patch_noise,
            norm=args.norm, activation=args.activation,
            dtype=self.dtype,
        )

    def init_generator(self, init_z):
        key = self.next_key()
        return self.g.init({"params": key, "scene": key}, init_z, train=True)

    def _g_rngs(self):
        if self.args.patch_noise:
            return {"scene": self.next_key()}
        return {}

    def make_train_step(self):
        return make_cnn_train_step(
            self.g, self.d, self.opt_g, self.opt_d,
            latent_dims=self.gan_config.latent_dims,
            grad_penalty=self.args.grad_penalty,
            ema_factor=self.args.lr_target_g,
            dtype=self.dtype,
            g_rng_name="scene" if self.args.patch_noise else None,
        )

    @classmethod
    def add_args_to_parser(cls, p):
        super().add_args_to_parser(p)
        p.add_argument("--scene-size", type=int, default=16)
        p.add_argument("--patch-size", type=int, default=3)
        p.add_argument("--num-patches", type=int, default=20)
        p.add_argument("--refine-patches", action="store_true")
        p.add_argument("--patch-noise", action="store_true")


def main(argv=None):
    trainer = SceneTrainer.create_from_cli(argv)
    trainer.train()


if __name__ == "__main__":
    main()
