"""bench.py measurement plumbing on CPU: the driver runs bench.py on
hardware at the end of every round — a wiring break there (factory
signatures, chunk/alt composition, state donation) must be caught in CI,
not on the TPU. Numbers from these runs are meaningless (CPU); only
execution is asserted.
"""
import numpy as np

import bench


def test_measure_step_runs_chunked_cpu():
    vals = bench.measure_step(config="8", batch_size=8, steps=4, warmup=1,
                              repeats=1, steps_per_call=2)
    assert len(vals) == 1 and np.isfinite(vals[0]) and vals[0] > 0


def test_measure_step_lazy_r1_row_cpu():
    """The r1_interval>1 workload row composes chunking with the lazy-R1
    lax.cond alternation."""
    vals = bench.measure_step(config="8", batch_size=8, steps=4, warmup=1,
                              repeats=1, steps_per_call=2, r1_interval=2)
    assert len(vals) == 1 and np.isfinite(vals[0]) and vals[0] > 0


def test_measure_step_iqn_cpu():
    vals = bench.measure_step(config="8", batch_size=8, steps=4, warmup=1,
                              repeats=1, steps_per_call=2, workload="iqn")
    assert len(vals) == 1 and np.isfinite(vals[0]) and vals[0] > 0


def test_measure_end_to_end_chunked_host_cpu():
    """The e2e_chunked_host row: host-streamed batches stacked K at a time
    through the trainer's scan path (VERDICT r3 weak #5)."""
    v = bench.measure_end_to_end(config="8", batch_size=8, steps=4,
                                 device_data=False, steps_per_call=2)
    assert np.isfinite(v) and v > 0
