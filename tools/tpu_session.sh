#!/bin/bash
# Round-2 TPU measurement session (single chip — run with training STOPPED):
#   1. coder lanes sweep   2. bench.py   3. full-grid RD sweep on the
#   trained flagship checkpoint over the synthetic-Kodak test set.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache


python tools/bench_coder.py --lanes 512,1024,2048,4096 2>&1 | tee runs/bench_coder.log

python bench.py 2>&1 | tee runs/bench_q10.log

python -m progressivecodec_tpu.cli.rd_sweep \
  --checkpoint runs/flagship/ckpt_last --synthetic-kodak --grid full \
  --max-images 4 --out runs/rd_full.json --plot runs/rd_full.png \
  2>&1 | tee runs/rd_sweep.log
