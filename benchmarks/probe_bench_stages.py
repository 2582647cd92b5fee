"""Run every bench.py stage in isolation with full error reporting —
used to localize failures that the driver's one-line JSON would mask.
Run alone."""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    bench.enter_honest_mode()
    stages = [
        ("headline_k32", lambda: bench.measure_step(
            "128", 128, steps=64, warmup=2, repeats=1, steps_per_call=32)),
        ("single_dispatch", lambda: bench.measure_step(
            "128", 128, steps=16, warmup=2, repeats=1, steps_per_call=1)),
        ("e2e_dd_chunked", lambda: bench.measure_end_to_end(
            "128", 128, steps=64, device_data=True, steps_per_call=32)),
        ("e2e_dd", lambda: bench.measure_end_to_end(
            "128", 128, steps=30, device_data=True)),
        ("e2e_host", lambda: bench.measure_end_to_end("128", 128, steps=30)),
        ("iqn64", lambda: bench.measure_step(
            steps=16, warmup=2, repeats=1, steps_per_call=8,
            workload="iqn", config="64", batch_size=128)),
        ("sagan256", lambda: bench.measure_step(
            steps=16, warmup=2, repeats=1, steps_per_call=8,
            workload="cnn", config="256", batch_size=64)),
        ("lazy_r1_16", lambda: bench.measure_step(
            steps=32, warmup=2, repeats=1, steps_per_call=16,
            workload="cnn", config="128", batch_size=128, r1_interval=16)),
    ]
    for name, fn in stages:
        try:
            out = fn()
            print(f"{name}: OK {out}", flush=True)
        except Exception:
            print(f"{name}: FAIL", flush=True)
            traceback.print_exc()
            print("----", flush=True)


if __name__ == "__main__":
    main()
