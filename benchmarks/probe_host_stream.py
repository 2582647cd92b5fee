"""Honest-mode measurement of the host-streamed input path (VERDICT r2 #2).

Round 1 chose prefetch depth=0 and rejected a background-thread uploader
from *deferred-mode* timings — the regime later retracted (docs/PERF.md).
This probe re-derives the design in honest (synchronous) mode:

  A. pure upload rate of one b128 uint8 batch (6.3 MB), value-fenced
  B. pure step rate with a resident batch (the device ceiling)
  C. strictly-serial upload+step per iteration (no overlap possible)
  D. the production path at prefetch depth 0 / 1 / 2 / 4
  E. a background-thread uploader (double buffering) at depth 1 / 2

If C ~= D ~= (A+B combined) the relay serializes uploads with compute and
the host-path gap to --device-data is physical; if deeper pipelines close
the gap, the winning depth becomes the default in data/prefetch.py.

Run alone (no other python process may touch the TPU):
    python benchmarks/probe_host_stream.py [--steps 40]
"""
from __future__ import annotations

import argparse
import json
import os
import queue
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _cached_archive, enter_honest_mode  # noqa: E402


def build(config="128", batch_size=128):
    import jax

    from tartangan_tpu.train.cnn import CNNTrainer

    size = {"128": 128}.get(config, 128)
    archive = _cached_archive(batch_size * 50, size)
    trainer = CNNTrainer.create_from_cli([
        archive, "--config", config, "--batch-size", str(batch_size),
        "--epochs", "1", "--output", "/tmp/probe_out",
        "--gen-freq", "1000000", "--checkpoint-freq", "1000000",
        "--run-id", "probe", "--quiet-logs",
    ])
    trainer.build_models()
    trainer.dataset = trainer.prepare_dataset()
    step = trainer._train_step
    return trainer, step, jax


def fence(x):
    import numpy as np
    return float(np.ravel(np.asarray(x))[-1])


def run(steps=40, batch_size=128):
    enter_honest_mode()
    trainer, step, jax = build(batch_size=batch_size)
    import numpy as np

    from tartangan_tpu.data.prefetch import EpochBatcher, prefetch_to_device

    batcher = EpochBatcher(trainer.dataset, batch_size)
    host_batches = []
    it = batcher.epoch()
    for _ in range(steps + 8):
        host_batches.append(next(it))

    put = lambda b: jax.device_put(b, trainer._batch_sharding)
    results = {}

    # warm compile + honest warmup
    state = trainer.state
    dev = put(host_batches[0])
    for i in range(3):
        state, m = step(state, dev, trainer.next_key())
    fence(m["g_loss"])

    # A: upload-only (each batch fenced via a tiny consumer reduction)
    sums = []
    t0 = time.perf_counter()
    for b in host_batches[:steps]:
        arr = put(b)
        sums.append(jax.numpy.sum(arr[0, 0, 0]))  # forces materialization
    jax.block_until_ready(sums[-1])
    fence(sums[-1])
    dt = time.perf_counter() - t0
    results["A_upload_only_ms"] = dt / steps * 1e3

    # B: step-only with one resident batch
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, dev, trainer.next_key())
    fence(m["g_loss"])
    dt = time.perf_counter() - t0
    results["B_step_only_ms"] = dt / steps * 1e3

    # C: strictly serial upload->step (fence the upload before stepping)
    t0 = time.perf_counter()
    for b in host_batches[:steps]:
        arr = put(b)
        jax.block_until_ready(arr)
        state, m = step(state, arr, trainer.next_key())
        jax.block_until_ready(m["g_loss"])
    fence(m["g_loss"])
    dt = time.perf_counter() - t0
    results["C_serial_ms"] = dt / steps * 1e3

    # D: production async path at several prefetch depths
    for depth in (0, 1, 2, 4):
        t0 = time.perf_counter()
        n = 0
        for arr in prefetch_to_device(iter(host_batches[:steps]), put,
                                      depth=depth):
            state, m = step(state, arr, trainer.next_key())
            n += 1
        jax.block_until_ready(m["g_loss"])
        fence(m["g_loss"])
        dt = time.perf_counter() - t0
        results[f"D_depth{depth}_ms"] = dt / n * 1e3

    # E: background-thread uploader (double buffer)
    for depth in (1, 2):
        q: queue.Queue = queue.Queue(maxsize=depth)

        def worker(batches=host_batches[:steps]):
            for b in batches:
                q.put(put(b))
            q.put(None)

        th = threading.Thread(target=worker, daemon=True)
        t0 = time.perf_counter()
        th.start()
        n = 0
        while True:
            arr = q.get()
            if arr is None:
                break
            state, m = step(state, arr, trainer.next_key())
            n += 1
        jax.block_until_ready(m["g_loss"])
        fence(m["g_loss"])
        dt = time.perf_counter() - t0
        th.join()
        results[f"E_thread_depth{depth}_ms"] = dt / n * 1e3

    bs = batch_size
    report = {k: round(v, 2) for k, v in results.items()}
    report.update({
        f"{k}_img_s": round(bs / (v / 1e3), 1) for k, v in results.items()})
    print(json.dumps(report, indent=1))
    return report


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=40)
    p.add_argument("--batch-size", type=int, default=128)
    args = p.parse_args()
    run(args.steps, args.batch_size)
