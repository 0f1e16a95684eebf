#!/bin/bash
# Round-4 close-out: run after the trainer is stopped and the chip lease
# is released.  Every step writes its evidence incrementally and logs to
# runs/close_r4.log; a timeout on one step does not lose prior results.
set -x
mkdir -p runs
LOG=runs/close_r4.log
date -u >> "$LOG"

echo "== bench ==" >> "$LOG"
timeout 1500 python bench.py > runs/bench_r4_local.json 2>> "$LOG"
cat runs/bench_r4_local.json >> "$LOG"

echo "== rd ladder (full grid) ==" >> "$LOG"
timeout 2400 python tools/rd_ladder.py \
  --checkpoint runs/flagship_r4/ckpt_best --grid full --n-images 8 \
  --out-jsonl runs/rd_r4_points.jsonl --out runs/rd_r4.json >> "$LOG" 2>&1

echo "== 2k tiled bench ==" >> "$LOG"
timeout 1500 python tools/bench_2k.py >> "$LOG" 2>&1

date -u >> "$LOG"
echo DONE >> "$LOG"
