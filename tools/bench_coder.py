"""Coder-phase micro-benchmark: encode/decode scan throughput vs lanes.

The rANS scans dominate codec time (~60%, PARITY.md).  Their cost is
step-count x per-step overhead (table gathers + cumsum + window read), so
lane count is the main throughput lever: K lanes decode K symbols per
step.  This sweeps K at bench-realistic symbol volumes on the current
backend and prints one JSON line per configuration.

Usage: python tools/bench_coder.py [--lanes 512,1024,2048,4096] [--n 2000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# self-contained path setup: setting PYTHONPATH breaks the sandbox's axon
# TPU plugin registration, so insert the repo root here instead
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--lanes", type=str, default="512,1024,2048,4096")
    p.add_argument("--n", type=int, default=2_000_000,
                   help="symbols per stream (~Kodak 768x512 all-slices volume)")
    p.add_argument("--stages", type=int, default=21,
                   help="decode stages (z + 20 slices)")
    p.add_argument("--reps", type=int, default=5)
    args = p.parse_args()

    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from progressivecodec_tpu.coder import rans_device
    from progressivecodec_tpu.coder.tables import merge_tables
    from progressivecodec_tpu.entropy import build_gaussian_tables
    from progressivecodec_tpu.config import ScaleTableConfig

    merged, _ = merge_tables(build_gaussian_tables(ScaleTableConfig().values()))
    t = rans_device.DeviceTables.from_tables(merged)

    rng = np.random.default_rng(0)
    per = args.n // args.stages
    stages_np = []
    for _ in range(args.stages):
        idx = rng.integers(0, merged.cdf.shape[0], per).astype(np.int32)
        sym = np.round(rng.standard_normal(per) * 4).astype(np.int32)
        stages_np.append((sym, idx, np.ones(per, bool)))
    stages = [(jnp.asarray(s), jnp.asarray(i), jnp.asarray(k)) for s, i, k in stages_np]
    meta = [(i, k) for _, i, k in stages]

    for lanes in [int(x) for x in args.lanes.split(",")]:
        enc = jax.jit(lambda st: rans_device.encode_stages(st, t, lanes))

        def dec_all(stream, esc):
            d = rans_device.decoder_init(stream, lanes)
            outs = []
            for i, k in meta:
                d, v = rans_device.decode_stage(d, stream, esc, i, k, t, lanes)
                outs.append(v)
            return outs, rans_device.stream_ok(d)

        dec = jax.jit(dec_all)

        stream, n_words, esc, n_esc = enc(stages)
        outs, ok = dec(stream, esc)
        jax.block_until_ready(outs)
        assert bool(ok)

        t0 = time.perf_counter()
        for _ in range(args.reps):
            stream, n_words, esc, n_esc = enc(stages)
        jax.block_until_ready(stream)
        enc_dt = (time.perf_counter() - t0) / args.reps

        t0 = time.perf_counter()
        for _ in range(args.reps):
            outs, ok = dec(stream, esc)
        jax.block_until_ready(outs)
        dec_dt = (time.perf_counter() - t0) / args.reps

        print(json.dumps({
            "lanes": lanes,
            "enc_Msym_per_s": round(args.n / enc_dt / 1e6, 1),
            "dec_Msym_per_s": round(args.n / dec_dt / 1e6, 1),
            "enc_ms": round(enc_dt * 1e3, 2),
            "dec_ms": round(dec_dt * 1e3, 2),
        }))


if __name__ == "__main__":
    main()
