"""Amortized per-phase device timing of the codec chain.

tools/profile_codec.py blocks after every dispatch, which adds the
tunnel round-trip (~25 ms on remote chips) to every phase and swamps the
device time.  Here each phase runs `--n` times back-to-back and syncs
ONCE, so the reported per-iteration time is device time + one RTT/n.

Usage: python tools/probe_phases.py [--batch 1] [--lanes 512] [--n 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from progressivecodec_tpu.utils.cache import enable_compilation_cache
from progressivecodec_tpu.config import ModelConfig
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.models.codec_granular import GranularCodec


def timed(fn, n, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--lanes", type=int, default=512)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--quality", type=float, default=10.0)
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = ModelConfig()
    model = ChannelProgressiveWACNN(cfg=cfg)
    h, w = 512, 768
    x = jax.random.uniform(
        jax.random.PRNGKey(1), (args.batch, h, w, 3), jnp.float32
    )
    variables = jax.jit(lambda r, xx: model.init({"params": r}, xx, training=False))(
        jax.random.PRNGKey(0), x[:1, :64, :64]
    )
    codec = GranularCodec(model, variables, lanes=args.lanes)
    codec.update()
    n = args.n
    res = {"batch": args.batch, "lanes": args.lanes, "n": n}

    # full chain (pipelined, device-resident)
    def chain(xx):
        d = codec.compress(xx, quality=args.quality, to_host=False)
        return codec.decompress(d)

    t_chain, out = timed(chain, n, x)
    assert bool(out["stream_ok"])
    res["chain_ms"] = 1e3 * t_chain

    # encode only
    t_enc, d = timed(
        lambda xx: codec.compress(xx, quality=args.quality, to_host=False), n, x
    )
    res["encode_ms"] = 1e3 * t_enc

    # decode only (fixed container)
    t_dec, _ = timed(lambda dd: codec.decompress(dd), n, d)
    res["decode_ms"] = 1e3 * t_dec

    # analysis transform only
    t_ana, y = timed(lambda xx: codec._call("analyze", (), xx), n, x)
    res["analyze_ms"] = 1e3 * t_ana

    # encode minus coder: compress with the rANS phases skipped is not
    # separable, so time the coder scan triple directly on this stream's
    # stage grids
    z = codec._call("codec_hyper_enc", (), y)
    sym, idx, _ = codec._J_zquant(z, codec._medians())
    # representative grid: replicate the z stage to the stream's size
    total_syms = d["n_words_dev"].size if hasattr(d["n_words_dev"], "size") else 0
    enc = codec._J_encode_for(codec.lanes)
    stages = [(sym, idx, codec._ones(sym.size))]
    t_scan, _ = timed(lambda s: enc(s), n, stages)
    res["coder_z_only_ms"] = 1e3 * t_scan

    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v) for k, v in res.items()}))


if __name__ == "__main__":
    main()
