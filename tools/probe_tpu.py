"""One-off TPU microprobes for the coder hot loop.

Answers three questions that decide the round-3 coder optimization plan:
  1. gather: cost of a random gather per element vs table size (does a
     VMEM-resident table change anything?)
  2. div: u32 divide vs f32-reciprocal(+fix) vs 16-bit-limb mulhi inside
     a scan
  3. scan: fixed per-step overhead (empty-ish scan body)

Usage: python tools/probe_tpu.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def probe_gather(n=2_000_000, lanes=512):
    """Scan of P steps, each gathering `lanes` random entries from a table
    of `size` uint32[2] rows — mimics the decode table read."""
    p = n // lanes
    rng = np.random.default_rng(0)
    for size in [1 << 14, 1 << 17, 1 << 20, 1 << 22, 1 << 24]:
        table = jnp.asarray(rng.integers(0, 2**31, (size, 2)).astype(np.uint32))
        idx = jnp.asarray(rng.integers(0, size, (p, lanes)).astype(np.int32))

        def run(table, idx):
            def step(acc, ii):
                g = table[ii]
                return acc + g[:, 0] + g[:, 1], ()

            acc, _ = jax.lax.scan(step, jnp.zeros((lanes,), jnp.uint32), idx)
            return acc

        dt = timed(jax.jit(run), table, idx)
        print(json.dumps({"probe": "gather_scan", "table_mb": round(size * 8 / 1e6, 1),
                          "Melem_per_s": round(n / dt / 1e6, 1)}))


def probe_gather_flat(n=2_000_000):
    """Same gathers as ONE flat (non-scan) op."""
    rng = np.random.default_rng(0)
    for size in [1 << 14, 1 << 20, 1 << 24]:
        table = jnp.asarray(rng.integers(0, 2**31, (size, 2)).astype(np.uint32))
        idx = jnp.asarray(rng.integers(0, size, (n,)).astype(np.int32))

        def run(table, idx):
            g = table[idx]
            return g[:, 0] + g[:, 1]

        dt = timed(jax.jit(run), table, idx)
        print(json.dumps({"probe": "gather_flat", "table_mb": round(size * 8 / 1e6, 1),
                          "Melem_per_s": round(n / dt / 1e6, 1)}))


def probe_div(n=2_000_000, lanes=512):
    p = n // lanes
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.integers(1 << 16, 1 << 31, (lanes,)).astype(np.uint32))
    fr = jnp.asarray(rng.integers(1, 1 << 16, (p, lanes)).astype(np.uint32))

    def run_div(x0, fr):
        def step(x, f):
            q = x // f
            r = x - q * f
            return (q << 16) + r + f, ()

        x, _ = jax.lax.scan(step, x0, fr)
        return x

    def run_nodiv(x0, fr):
        def step(x, f):
            q = x >> 16
            r = x & jnp.uint32(0xFFFF)
            return (q << 16) + r + f, ()

        x, _ = jax.lax.scan(step, x0, fr)
        return x

    def run_mulhi(x0, fr):
        # 16-bit-limb mulhi(x, rcp) — rcp here is just `f` as a stand-in
        # (cost model only; correctness not needed for timing)
        def step(x, f):
            a, b = x >> 16, x & jnp.uint32(0xFFFF)
            c, d = f >> 16, f & jnp.uint32(0xFFFF)
            t = b * d
            mid1 = a * d + (t >> 16)
            mid2 = b * c + (mid1 & jnp.uint32(0xFFFF))
            hi = a * c + (mid1 >> 16) + (mid2 >> 16)
            q = hi >> 1
            r = x - q * f
            return (q << 16) + r + f, ()

        x, _ = jax.lax.scan(step, x0, fr)
        return x

    def run_f32div(x0, fr):
        # two-limb exact f32 division with correction
        def step(x, f):
            ff = f.astype(jnp.float32)
            hi = (x >> 16).astype(jnp.float32)
            q1 = jnp.floor(hi / ff).astype(jnp.uint32)
            r1 = (x >> 16) - q1 * f
            fix = r1 >= f
            q1 = jnp.where(fix, q1 + 1, q1)
            r1 = jnp.where(fix, r1 - f, r1)
            y = (r1 << 16) | (x & jnp.uint32(0xFFFF))
            q2 = jnp.floor(y.astype(jnp.float32) / ff).astype(jnp.uint32)
            r2 = y - q2 * f
            fix2 = r2 >= f
            q2 = jnp.where(fix2, q2 + 1, q2)
            q = (q1 << 16) + q2
            r = jnp.where(fix2, r2 - f, r2)
            return (q << 16) + r + f, ()

        x, _ = jax.lax.scan(step, x0, fr)
        return x

    for name, fn in [("u32_div", run_div), ("no_div", run_nodiv),
                     ("limb_mulhi", run_mulhi), ("f32_2limb", run_f32div)]:
        dt = timed(jax.jit(fn), x0, fr)
        print(json.dumps({"probe": name, "Melem_per_s": round(n / dt / 1e6, 1)}))


def probe_window(n=2_000_000, lanes=512):
    """The decode word-window read: dynamic_slice + in-window gather."""
    p = n // lanes
    rng = np.random.default_rng(0)
    stream = jnp.asarray(rng.integers(0, 1 << 16, (n + lanes,)).astype(np.uint16))
    flags = jnp.asarray(rng.random((p, lanes)) < 0.5)

    def run(stream, flags):
        def step(off, fl):
            csum = jnp.cumsum(fl.astype(jnp.int32))
            window = jax.lax.dynamic_slice(stream, (off,), (lanes,))
            w = window[jnp.clip(csum - 1, 0, lanes - 1)].astype(jnp.uint32)
            return off + csum[-1], w.sum()

        off, acc = jax.lax.scan(step, jnp.int32(0), flags)
        return acc

    dt = timed(jax.jit(run), stream, flags)
    print(json.dumps({"probe": "window", "Melem_per_s": round(n / dt / 1e6, 1)}))


if __name__ == "__main__":
    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices())
    probe_div()
    probe_window()
    probe_gather()
    probe_gather_flat()
