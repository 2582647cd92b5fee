"""'512thin' remat-policy experiment (VERDICT r4 next #6).

The 512thin b64 --remat row runs at 15.3% MFU with 180 GB of XLA-booked
bytes — flagged 'genuinely bandwidth-suspect' but never dissected: how
much of the step is remat recompute vs BN/attention chain traffic? This
probe measures, per jax.checkpoint policy:

  - XLA cost-model FLOPs (includes the recompute each policy causes)
  - XLA booked bytes
  - honest ms/step (k-sweep slope, short chunks — the step is ~276 ms)

over: no remat at all (if it fits HBM), --remat full (recompute
everything, the round-4 default), --remat-policy convs (save the tagged
main-path conv outputs, recompute only norm/act chains), and
--remat-policy dots (jax's stock dot-saving policy).

Run on the TPU: ``python benchmarks/probe_remat_policy.py``
(add ``--config 512thin --batch-size 64`` variants as needed).
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import enter_honest_mode  # noqa: E402
from benchmarks.probe_mfu import honest_ms_per_step, step_cost  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="512thin")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--k-lo", type=int, default=2)
    p.add_argument("--k-hi", type=int, default=8)
    p.add_argument("--skip-timing", action="store_true")
    args = p.parse_args()

    enter_honest_mode()
    variants = [
        ("no_remat", dict(remat=False)),
        ("remat_full", dict(remat=True, remat_policy="full")),
        ("remat_convs", dict(remat=True, remat_policy="convs")),
        ("remat_dots", dict(remat=True, remat_policy="dots")),
    ]
    results = {}
    for name, kw in variants:
        try:
            flops, byts = step_cost(args.config, args.batch_size, **kw)
            row = {"flops": flops, "gb": round(byts / 1e9, 1)}
            if not args.skip_timing:
                ms = honest_ms_per_step(args.config, args.batch_size,
                                        k_lo=args.k_lo, k_hi=args.k_hi,
                                        **kw)
                row["ms"] = round(ms, 2)
                row["tflops"] = round(flops / (ms / 1e3) / 1e12, 1)
                row["mfu_vs_190"] = round(
                    flops / (ms / 1e3) / 190e12, 3)
                row["img_s"] = round(args.batch_size / (ms / 1e3), 1)
            results[name] = row
        except Exception as e:  # noqa: BLE001 — OOM rows must not kill it
            results[name] = {"error": f"{type(e).__name__}: {str(e)[:160]}"}
        print(name, results[name], flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
