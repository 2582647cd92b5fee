"""Profiling + per-step timing component.

The reference has no tracing/profiling at all (SURVEY.md section 5). Here:
``--profile-dir DIR`` captures a JAX/XLA device trace (viewable in
TensorBoard / Perfetto) over steps [``--profile-start``,
``--profile-start + --profile-steps``), and wall-clock throughput
(images/sec) is appended to the logs every ``--timing-freq`` steps.
"""
from __future__ import annotations

import time

import jax

from .base import TrainerComponent


class ProfilerComponent(TrainerComponent):
    def on_train_begin(self, steps, logs):
        self._active = False
        self._t0 = time.perf_counter()
        self._steps0 = steps

    def on_batch_begin(self, steps, logs):
        args = self.trainer.args
        if (args.profile_dir and not self._active
                and steps == args.profile_start):
            print(f"[profiler] starting trace -> {args.profile_dir}")
            jax.profiler.start_trace(args.profile_dir)
            self._active = True

    def on_batch_end(self, steps, logs):
        args = self.trainer.args
        if (self._active
                and steps >= args.profile_start + args.profile_steps):
            jax.profiler.stop_trace()
            self._active = False
            print("[profiler] trace captured")

        if args.timing_freq and steps and self.every(args.timing_freq, steps):
            now = time.perf_counter()
            imgs = (steps - self._steps0) * args.batch_size
            rate = imgs / max(now - self._t0, 1e-9)
            logs["images_per_sec"].append(rate)
            self._t0, self._steps0 = now, steps

    def on_train_end(self, steps, logs):
        if self._active:
            jax.profiler.stop_trace()

    @classmethod
    def add_args_to_parser(cls, parser):
        parser.add_argument("--profile-start", type=int, default=10,
                            help="Step at which to start the device trace")
        parser.add_argument("--profile-steps", type=int, default=5,
                            help="Number of steps to trace")
        parser.add_argument("--timing-freq", type=int, default=100,
                            help="Log images/sec every N steps (0=off)")
