"""Shared-filter-bank IQN trainer.

Parity: reference tartangan/trainers/shared/iqn.py:31-157.
"""
from __future__ import annotations

from ...models.shared import SharedGenerator, SharedIQNDiscriminator
from ..iqn import IQNTrainer


class SharedIQNTrainer(IQNTrainer):
    def build_generator(self):
        args = self.args
        return SharedGenerator(
            self.gan_config, norm=args.norm, activation=args.activation,
            g_base=args.g_base, dtype=self.dtype,
        )

    def build_discriminator(self):
        args = self.args
        return SharedIQNDiscriminator(
            self.gan_config, norm=args.norm, activation=args.activation,
            dtype=self.dtype,
        )


def main(argv=None):
    trainer = SharedIQNTrainer.create_from_cli(argv)
    trainer.train()


if __name__ == "__main__":
    main()
