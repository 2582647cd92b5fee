"""Step-numbered checkpoint save/resume.

Parity: reference components/model_checkpoint.py:11-117 — same layout
(``{output}/{run_id}/checkpoints/{steps}/``), same artifact set
(g / g_target / d / opt_g / opt_d + trainer.json), same CLI
(``--checkpoint-freq`` / ``--resume-training-step`` /
``--resume-training-latest``), same re-save suppression, S3-capable paths.

Formats (``--checkpoint-format``): ``msgpack`` (default) writes one flax
msgpack pytree per artifact — pure data, no code objects, S3-capable;
``orbax`` writes each artifact through Orbax's StandardCheckpointer
(sharding-aware, local paths only).
"""
from __future__ import annotations

import json

import jax
from flax import serialization

from ...utils.cli import type_or_none
from ...utils.fs import maybe_makedirs, smart_open, smart_ls
from .base import TrainerComponent

ARTIFACT_FILES = {
    "g": "g.msgpack",
    "g_target": "g_target.msgpack",
    "d": "d.msgpack",
    "opt_g": "opt_g.msgpack",
    "opt_d": "opt_d.msgpack",
}


class ModelCheckpointComponent(TrainerComponent):
    """Saves the models at regular intervals."""

    def on_train_begin(self, steps, logs):
        self._loaded_from = None
        if self.trainer.args.resume_training_step:
            self.trainer.steps = self.trainer.args.resume_training_step
            self.load_checkpoint()
        elif self.trainer.args.resume_training_latest:
            self.resume_training_from_latest()

    def on_batch_end(self, steps, logs):
        if steps and self.every(self.trainer.args.checkpoint_freq, steps):
            if self._loaded_from != steps:  # prevent immediate re-save
                self.save_checkpoint(steps)

    def on_train_end(self, steps, logs):
        self.save_checkpoint(steps)

    @property
    def _format(self):
        return getattr(self.trainer.args, "checkpoint_format", "msgpack")

    def save_checkpoint(self, steps):
        maybe_makedirs(self.checkpoint_root)
        print(f"saving checkpoint to {self.checkpoint_root}")
        artifacts = jax.device_get(self.trainer.checkpoint_artifacts())
        if self._format == "orbax":
            import os

            import orbax.checkpoint as ocp
            with ocp.StandardCheckpointer() as ckptr:
                for name, tree in artifacts.items():
                    path = os.path.abspath(
                        f"{self.checkpoint_root}/{name}.orbax")
                    ckptr.save(path, tree, force=True)
        else:
            for name, tree in artifacts.items():
                fname = ARTIFACT_FILES.get(name, f"{name}.msgpack")
                filename = f"{self.checkpoint_root}/{fname}"
                with smart_open(filename, "wb") as outfile:
                    outfile.write(serialization.to_bytes(tree))
        with smart_open(f"{self.checkpoint_root}/trainer.json", "w") as out:
            json.dump(self.trainer.get_state(), out)

    def load_checkpoint(self):
        print(f"resuming from checkpoint {self.checkpoint_root}")
        self._loaded_from = self.trainer.steps

        templates = self.trainer.checkpoint_artifacts()
        loaded = {}
        if self._format == "orbax":
            import os

            import orbax.checkpoint as ocp
            with ocp.StandardCheckpointer() as ckptr:
                for name, template in templates.items():
                    path = os.path.abspath(
                        f"{self.checkpoint_root}/{name}.orbax")
                    loaded[name] = ckptr.restore(
                        path, jax.device_get(template))
        else:
            for name, template in templates.items():
                fname = ARTIFACT_FILES.get(name, f"{name}.msgpack")
                filename = f"{self.checkpoint_root}/{fname}"
                with smart_open(filename, "rb") as infile:
                    loaded[name] = serialization.from_bytes(
                        jax.device_get(template), infile.read())
        self.trainer.load_checkpoint_artifacts(loaded)

        with smart_open(f"{self.checkpoint_root}/trainer.json", "r") as infile:
            self.trainer.set_state(json.load(infile))

    def resume_training_from_latest(self):
        latest_id = self.latest_checkpoint_id()
        if latest_id is not None:
            self.trainer.steps = latest_id
            self.load_checkpoint()
        else:
            print("No checkpoints found to resume.")

    def latest_checkpoint_id(self):
        """Largest numeric subdir of checkpoints/
        (reference model_checkpoint.py:84-99)."""
        int_dirs = []
        for key in smart_ls(self.all_checkpoints_root):
            try:
                int_dirs.append(int(key))
            except ValueError:
                pass
        return max(int_dirs) if int_dirs else None

    @property
    def checkpoint_root(self):
        return f"{self.all_checkpoints_root}/{self.trainer.steps}"

    @property
    def all_checkpoints_root(self):
        return f"{self.trainer.output_root}/checkpoints"

    @classmethod
    def add_args_to_parser(cls, parser):
        parser.add_argument("--checkpoint-freq", type=int, default=100000,
                            help="Output a checkpoint every N batches")
        parser.add_argument("--resume-training-step",
                            type=type_or_none(int), default=None,
                            help="Resume training from this step's checkpoint "
                                 "under the --run-id output path")
        parser.add_argument("--resume-training-latest", action="store_true",
                            help="Resume from the latest checkpoint for the "
                                 "given run-id")
        parser.add_argument("--checkpoint-format", default="msgpack",
                            choices=["msgpack", "orbax"],
                            help="msgpack: one flax pytree per artifact "
                                 "(S3-capable); orbax: StandardCheckpointer "
                                 "directories (sharding-aware)")
