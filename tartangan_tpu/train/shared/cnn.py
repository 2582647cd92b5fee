"""Shared-filter-bank CNN trainer.

Parity: reference tartangan/trainers/shared/cnn.py:30-171 — identical loop
to the CNN trainer but with the shared-parameter generator/discriminator
(one global filter bank each, models/shared.py).
"""
from __future__ import annotations

from ...models.shared import SharedDiscriminator, SharedGenerator
from ..cnn import CNNTrainer


class SharedCNNTrainer(CNNTrainer):
    def build_generator(self):
        args = self.args
        return SharedGenerator(
            self.gan_config, norm=args.norm, activation=args.activation,
            g_base=args.g_base, dtype=self.dtype,
        )

    def build_discriminator(self):
        args = self.args
        return SharedDiscriminator(
            self.gan_config, norm=args.norm, activation=args.activation,
            dtype=self.dtype,
        )


def main(argv=None):
    trainer = SharedCNNTrainer.create_from_cli(argv)
    trainer.train()


if __name__ == "__main__":
    main()
