"""Phase breakdown of the granular codec on the current backend.

Wraps every jitted fragment dispatch with a blocking timer, runs a few
Kodak-size encode+decode round trips at q=10, and prints per-phase totals.
Blocking after each fragment defeats async pipelining, so the sum exceeds
bench.py's pipelined per-image time — use the *shares* to pick targets.

Usage: python tools/profile_codec.py [--lanes 512] [--n 4]
"""

from __future__ import annotations

import argparse
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
from progressivecodec_tpu.utils.profiling import PhaseTimer


class ProfiledCodec(GranularCodec):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.timer = PhaseTimer()
        # one jitted inner callable per phase, built on first access —
        # rebuilding jax.jit per dispatch would retrace and skew the shares
        self._timed_cache: dict = {}

    def _timed(self, name, fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        self.timer.totals[name] += time.perf_counter() - t0
        self.timer.counts[name] += 1
        return out

    def _call(self, name, statics, *args):
        key = (name,) + tuple(statics)
        if key not in self._jits:
            super()._call(name, statics, *args)  # compile
        return self._timed(f"frag:{name}", self._jits[key], self._fragment_vars(name), *args)

    def _J_encode_for(self, lanes):
        key = ("encode", lanes)
        if key not in self._timed_cache:
            self._timed_cache[key] = GranularCodec._J_encode_for(self, lanes)
        inner = self._timed_cache[key]
        return lambda stages: self._timed("coder:encode", inner, stages)

    def _J_decode_stage_for(self, lanes):
        key = ("decode_stage", lanes)
        if key not in self._timed_cache:
            self._timed_cache[key] = GranularCodec._J_decode_stage_for(self, lanes)
        inner = self._timed_cache[key]
        return lambda *a: self._timed("coder:decode_stage", inner, *a)

    def _cached_prop(self, name):
        if name not in self._timed_cache:
            self._timed_cache[name] = getattr(GranularCodec, name).func(self)
        return self._timed_cache[name]

    @property
    def _J_quant_slice(self):
        inner = self._cached_prop("_J_quant_slice")
        return lambda *a: self._timed("glue:quant", inner, *a)

    @property
    def _J_quant_masked_stacked(self):
        inner = self._cached_prop("_J_quant_masked_stacked")
        return lambda *a: self._timed("glue:quant_masked", inner, *a)

    @property
    def _J_quant_prog_slice(self):
        inner = self._cached_prop("_J_quant_prog_slice")
        return lambda *a: self._timed("glue:quant_prog", inner, *a)

    @property
    def _J_zquant(self):
        inner = self._cached_prop("_J_zquant")
        return lambda *a: self._timed("glue:zquant", inner, *a)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=512)
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--quality", type=float, default=10.0)
    args = ap.parse_args()

    enable_compilation_cache()
    cfg = ModelConfig()
    model = ChannelProgressiveWACNN(cfg=cfg)
    h, w = 512, 768
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, h, w, 3), jnp.float32)
    variables = jax.jit(lambda r, xx: model.init({"params": r}, xx, training=False))(
        jax.random.PRNGKey(0), x[:, :64, :64]
    )
    codec = ProfiledCodec(model, variables, lanes=args.lanes)
    codec.update()

    # warm up / compile
    d = codec.compress(x, quality=args.quality, to_host=False)
    out = codec.decompress(d)
    assert bool(out["stream_ok"])
    jax.block_until_ready(out["x_hat"])
    codec.timer = PhaseTimer()

    t0 = time.perf_counter()
    for _ in range(args.n):
        d = codec.compress(x, quality=args.quality, to_host=False)
        out = codec.decompress(d)
        jax.block_until_ready(out["x_hat"])
    total = time.perf_counter() - t0
    assert bool(out["stream_ok"])

    print(f"backend={jax.devices()[0].platform} lanes={args.lanes} "
          f"n={args.n} total={total:.3f}s per_image={total/args.n*1000:.1f}ms")
    rows = sorted(codec.timer.summary().items(), key=lambda kv: -kv[1]["total_s"])
    s = sum(v["total_s"] for _, v in rows)
    for k, v in rows:
        print(f"{k:28s} {v['total_s']/args.n*1000:8.2f} ms/img  {100*v['total_s']/s:5.1f}%  (n={v['n']})")


if __name__ == "__main__":
    main()
