#!/bin/bash
# Relaunch the flagship training run on transient TPU-backend failures,
# resuming from the last checkpoint when one exists.  The tunneled chip
# occasionally drops a connection mid-run (FAILED_PRECONDITION); the
# driver checkpoints every epoch, so a restart loses at most one epoch.
OUT=${1:-runs/flagship_r3}
TRIES=${2:-12}
for i in $(seq 1 "$TRIES"); do
  RESUME=""
  if [ -d "$OUT/ckpt_last" ]; then
    RESUME="--checkpoint $OUT/ckpt_last"
  fi
  echo "[babysit] attempt $i $(date -u +%H:%M:%S) resume='$RESUME'" >> "$OUT.log"
  python -u -m progressivecodec_tpu.cli.train \
    --config runs/flagship_cfg.json --natural --natural-n 8000 \
    --epochs 150 --eval-every 10 --out "$OUT" $RESUME >> "$OUT.log" 2>&1
  rc=$?
  echo "[babysit] exited rc=$rc $(date -u +%H:%M:%S)" >> "$OUT.log"
  if [ "$rc" -eq 0 ]; then
    break
  fi
  sleep 20
done
