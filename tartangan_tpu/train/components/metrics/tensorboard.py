"""Per-batch TensorBoard scalars, written torch-free.

Parity surface: reference components/metrics/tensorboard.py:9-25 (latest
value of every logged metric emitted per batch under the trainer-class main
tag). The reference pulls in torch's SummaryWriter; here the event file is
produced by our own dependency-free writer (utils/tb_events.py). One
deliberate difference: torch's ``add_scalars`` fans every tag out into its
own sub-run directory, which multiplies file handles — all tags go into ONE
event file as ``MainTag/metric`` scalars instead.
"""
from __future__ import annotations

from .base import FileBasedMetricsComponent


class TensorboardComponent(FileBasedMetricsComponent):
    whitelist = None

    def on_train_begin(self, steps, logs):
        from ....utils.tb_events import ScalarEventWriter
        metrics_path = f"{self.args.metrics_path}/{self.trainer.run_id}"
        self.summary_writer = ScalarEventWriter(metrics_path)

    def on_batch_end(self, steps, logs):
        from ....utils.scalars import last_scalar
        scalars = {
            f"{self.main_tag}/{key}": last_scalar(values[-1])
            for key, values in logs.items()
            if values and (not self.whitelist or key in self.whitelist)
        }
        self.summary_writer.add_scalars(steps, scalars)

    def on_train_end(self, steps, logs):
        self.summary_writer.close()

    @property
    def main_tag(self):
        return self.trainer.__class__.__name__
