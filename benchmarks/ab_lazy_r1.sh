#!/bin/bash
# Lazy-R1 quality A/B: one '128' b128 training run at a fixed wall-clock
# budget, surrogate-FID tracked against the calibrated Inception weights
# (tests/fixtures/inception_calibrated.npz — see docs/PERF.md "Calibrated
# surrogate weights"). Run once with interval 1 (reference semantics,
# /root/reference/tartangan/trainers/cnn.py:133-135) and once with 16
# (StyleGAN2 lazy regularization), then compare FID vs wall-clock.
#
# usage: ab_lazy_r1.sh INTERVAL BUDGET_SECONDS OUTDIR [FID_FREQ]
# Output: $OUTDIR/log.txt with "ELAPSED_S <line>" prefixes; FID lines
# ("FID is X") correspond to steps k*FID_FREQ in order.
#
# Environment rules (CLAUDE.md): run alone — no other python process may
# start while this is in flight (the relay serializes clients).
set -u
IV=$1; BUDGET=$2; OUT=$3; FREQ=${4:-6400}
DATA=${AB_DATA:-/tmp/tartan128.npz}
MOMENTS=${AB_MOMENTS:-/tmp/moments128.npz}
WEIGHTS=${AB_WEIGHTS:-tests/fixtures/inception_calibrated.npz}
mkdir -p "$OUT"
timeout -s TERM "$BUDGET" python -u -m tartangan_tpu.train.cnn "$DATA" \
  --config 128 --batch-size 128 --device-data --steps-per-call 32 \
  --seed 1 --r1-interval "$IV" \
  --fid --fid-freq "$FREQ" --n-inception-imgs 2560 \
  --inception-moments "$MOMENTS" --inception-weights "$WEIGHTS" \
  --gen-freq 1000000 --checkpoint-freq 1000000 --epochs 1000000 \
  --log-iters 3200 --log-progress-newlines \
  --output "$OUT" 2>&1 \
  | awk -W interactive -v s="$(date +%s)" '{ print systime()-s, $0 }' \
  > "$OUT/log.txt"
echo "done: $OUT (rc=$?)"
