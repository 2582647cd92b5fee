"""Metrics collector emission formats (katib INI, kubeflow JSON)."""
import configparser
import json
from collections import defaultdict
from types import SimpleNamespace

from tartangan_tpu.train.components.metrics.katib import (
    KatibMetricsComponent,
)
from tartangan_tpu.train.components.metrics.kubeflow_pipeline import (
    KubeflowMetricsComponent,
)


def _logs():
    logs = defaultdict(list)
    logs["g_loss"] += [1.0, 0.5]
    logs["d_loss"] += [2.0, 1.5]
    logs["fid"] += [42.0]
    return logs


def test_katib_ini(tmp_path):
    path = tmp_path / "metrics.ini"
    comp = KatibMetricsComponent(SimpleNamespace(metrics_path=str(path)))
    comp.on_train_end(10, _logs())
    config = configparser.ConfigParser()
    config.read(path)
    assert float(config["metrics"]["g-loss"]) == 0.5
    assert float(config["metrics"]["fid"]) == 42.0


def test_kubeflow_json(tmp_path):
    path = tmp_path / "metrics.json"
    comp = KubeflowMetricsComponent(SimpleNamespace(metrics_path=str(path)))
    comp.on_train_end(10, _logs())
    data = json.loads(path.read_text())
    by_name = {m["name"]: m["numberValue"] for m in data["metrics"]}
    assert by_name["d-loss"] == 1.5
    assert by_name["fid"] == 42.0


def test_tensorboard_component(tmp_path):
    import os
    from tartangan_tpu.train.components.metrics.tensorboard import (
        TensorboardComponent,
    )
    args = SimpleNamespace(metrics_path=str(tmp_path / "tb"))
    comp = TensorboardComponent(args)
    comp.trainer = SimpleNamespace(run_id="run", __class__=type("T", (), {}))
    comp.trainer.run_id = "run"
    comp.on_train_begin(0, _logs())
    comp.on_batch_end(1, _logs())
    comp.on_train_end(2, _logs())
    event_files = os.listdir(tmp_path / "tb" / "run")
    assert event_files and event_files[0].startswith("events.out.tfevents")
