#!/bin/bash
# Relaunch the flagship training run on transient TPU-backend failures,
# resuming from the last checkpoint when one exists.  The tunneled chip
# occasionally drops a connection mid-run (FAILED_PRECONDITION); the
# driver checkpoints every epoch, so a restart loses at most one epoch.
#
# GUARD (round-5 incident): if the run dir already has training history
# (metrics.jsonl) but no resumable checkpoint, ABORT instead of silently
# starting from scratch — a fresh run would overwrite ckpt_last/ckpt_best
# with fresh-init params.  (save_checkpoint is now rename-swap atomic and
# load_checkpoint falls back to ckpt_last.old, so this should not occur.)
OUT=${1:-runs/flagship_r3}
TRIES=${2:-12}
for i in $(seq 1 "$TRIES"); do
  RESUME=""
  if [ -d "$OUT/ckpt_last" ]; then
    RESUME="--checkpoint $OUT/ckpt_last"
  elif [ -d "$OUT/ckpt_last.old" ]; then
    RESUME="--checkpoint $OUT/ckpt_last.old"
  elif [ -s "$OUT/metrics.jsonl" ]; then
    echo "[babysit] ABORT: $OUT has metrics.jsonl but no ckpt_last(.old) —" \
         "refusing to overwrite an existing run with a fresh start" >> "$OUT.log"
    exit 97
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
