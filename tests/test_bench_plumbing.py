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


def test_measure_step_with_flops_cpu():
    """with_flops=True returns (values, flops) with a positive XLA
    cost-model FLOP count — feeds the BENCH_r*.json mfu columns."""
    vals, flops = bench.measure_step(config="8", batch_size=8, steps=4,
                                     warmup=1, repeats=1, steps_per_call=2,
                                     with_flops=True)
    assert len(vals) == 1 and vals[0] > 0
    assert flops is not None and flops > 0
    fields = bench._mfu_fields(flops, vals[0], 8, 2)
    assert fields["flops_per_step"] == flops
    assert fields["ms_per_step"] > 0
    assert "mfu" not in fields  # CPU backend: no TPU-peak MFU claim


def test_measure_step_with_flops_lazy_r1_weighting_cpu():
    """The lazy-R1 row's FLOPs must be the cadence-weighted average of the
    R1 and no-R1 step variants (strictly below the full-R1 count)."""
    _, flops_full = bench.measure_step(config="8", batch_size=8, steps=4,
                                       warmup=1, repeats=1,
                                       with_flops=True)
    _, flops_lazy = bench.measure_step(config="8", batch_size=8, steps=4,
                                       warmup=1, repeats=1, r1_interval=4,
                                       with_flops=True)
    assert flops_lazy < flops_full


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
