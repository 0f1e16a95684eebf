#!/bin/bash
# Round-5 close-out (VERDICT r4 next #1..#8).  Run AFTER the trainer is
# stopped (kill its exact PID) and the chip lease is released.  Every step
# writes evidence incrementally and logs to runs/close_r5.log; a timeout
# on one step does not lose prior results.
#
# Order is by evidence value per chip-minute: the trained RD ladder is the
# round's headline artifact, then REM-at-flagship-scale, then the 2K tiled
# bench, then bench.py (the driver re-runs bench.py at round end; running
# it here warms the persistent compile cache for that run and records a
# local copy).
#
# GATE: the close-out is not complete unless the CPU test suite is green —
# run (niced) while the chip steps proceed, recorded at the end of the log.
set -x
mkdir -p runs
LOG=runs/close_r5.log
date -u >> "$LOG"

echo "== suite (CPU, background, niced) ==" >> "$LOG"
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  nice -n 19 python -m pytest tests/ -q > runs/suite_r5.log 2>&1 &
SUITE_PID=$!

CKPT=runs/flagship_r5/ckpt_best
[ -d "$CKPT" ] || CKPT=runs/flagship_r5/ckpt_last

echo "== rd ladder (full grid, trained r5, ckpt=$CKPT) ==" >> "$LOG"
timeout 4200 python tools/rd_ladder.py \
  --checkpoint "$CKPT" --grid full --n-images 8 \
  --out-jsonl runs/rd_r5_points.jsonl --out runs/rd_r5.json >> "$LOG" 2>&1

echo "== bd trajectory ==" >> "$LOG"
python tools/bd_trajectory.py --run runs/flagship_r5 >> "$LOG" 2>&1

echo "== REM at flagship scale ==" >> "$LOG"
timeout 2700 python tools/rem_flagship.py \
  --checkpoint "$CKPT" --bank-steps 800 >> "$LOG" 2>&1

echo "== 2k tiled bench (forced-sync headline) ==" >> "$LOG"
timeout 2400 python tools/bench_2k.py >> "$LOG" 2>&1

echo "== bench (scalar-fenced, subprocess per config) ==" >> "$LOG"
timeout 3600 python bench.py > runs/bench_r5_local.json 2>> "$LOG"
cat runs/bench_r5_local.json >> "$LOG"

echo "== suite gate ==" >> "$LOG"
wait "$SUITE_PID"
SUITE_RC=$?
tail -3 runs/suite_r5.log >> "$LOG"
if [ "$SUITE_RC" -ne 0 ]; then
  echo "SUITE RED (rc=$SUITE_RC) — close-out gate FAILED" >> "$LOG"
else
  echo "suite green" >> "$LOG"
fi

date -u >> "$LOG"
echo DONE >> "$LOG"
exit "$SUITE_RC"
