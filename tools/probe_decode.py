"""Probe the decode scan's TRUE bottleneck: carry-dependent table gathers.

probe_tpu.py's gather probes index with scan *inputs*, which XLA hoists
out of the loop as one flat gather — the real decode indexes with the
carry (cum = state & 0xFFFF), which cannot be hoisted.  This measures the
carry-dependent variants, building up the real decode step piecewise.

Usage: python tools/probe_decode.py
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

MASK16 = jnp.uint32(0xFFFF)


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def probe(n=1_000_000, lanes=512):
    p = n // lanes
    rng = np.random.default_rng(0)
    rows = 256
    size = rows << 16

    table1 = jnp.asarray(rng.integers(0, 2**31, (size,)).astype(np.uint32))
    table2 = jnp.asarray(rng.integers(0, 2**31, (size, 2)).astype(np.uint32))
    idx_in = jnp.asarray(rng.integers(0, rows, (p, lanes)).astype(np.int32))
    states0 = jnp.asarray(rng.integers(1 << 16, 1 << 31, (lanes,)).astype(np.uint32))
    stream = jnp.asarray(rng.integers(0, 1 << 16, (n + lanes,)).astype(np.uint16))

    def run_dep_gather1(states0, idx_in):
        """carry-dependent gather from flat u32 table"""
        def step(states, ii):
            cum = states & MASK16
            lin = (ii << 16) + cum.astype(jnp.int32)
            g = table1[lin]
            states = states * jnp.uint32(5) + g
            return states, ()

        s, _ = jax.lax.scan(step, states0, idx_in)
        return s

    def run_dep_gather2(states0, idx_in):
        """carry-dependent gather from (size,2) table (the real layout)"""
        def step(states, ii):
            cum = states & MASK16
            lin = (ii << 16) + cum.astype(jnp.int32)
            g = table2[lin]
            states = states * jnp.uint32(5) + g[:, 0] + g[:, 1]
            return states, ()

        s, _ = jax.lax.scan(step, states0, idx_in)
        return s

    def run_full_decode(states0, idx_in):
        """the real decode step body (minus escapes)"""
        def step(carry, ii):
            states, offset = carry
            cum = states & MASK16
            lin = (ii << 16) + cum.astype(jnp.int32)
            packed = table2[lin]
            sf = packed[:, 0]
            start = sf >> 16
            freq = sf & MASK16
            adv = freq * (states >> 16) + cum - start
            flag = adv < jnp.uint32(1 << 16)
            csum = jnp.cumsum(flag.astype(jnp.int32))
            window = jax.lax.dynamic_slice(stream, (offset,), (lanes,))
            w = window[jnp.clip(csum - 1, 0, lanes - 1)].astype(jnp.uint32)
            adv = jnp.where(flag, (adv << 16) | w, adv)
            offset = offset + csum[-1]
            return (adv, offset), packed[:, 1]

        (s, _), vals = jax.lax.scan(step, (states0, jnp.int32(0)), idx_in)
        return s, vals

    def run_no_gather(states0, idx_in):
        """same math, gather replaced by arithmetic (isolates gather cost)"""
        def step(carry, ii):
            states, offset = carry
            cum = states & MASK16
            sf = (cum * jnp.uint32(2654435761)) ^ ii.astype(jnp.uint32)
            start = sf >> 16
            freq = sf & MASK16
            adv = freq * (states >> 16) + cum - start
            flag = adv < jnp.uint32(1 << 16)
            csum = jnp.cumsum(flag.astype(jnp.int32))
            window = jax.lax.dynamic_slice(stream, (offset,), (lanes,))
            w = window[jnp.clip(csum - 1, 0, lanes - 1)].astype(jnp.uint32)
            adv = jnp.where(flag, (adv << 16) | w, adv)
            offset = offset + csum[-1]
            return (adv, offset), sf
        (s, _), vals = jax.lax.scan(step, (states0, jnp.int32(0)), idx_in)
        return s, vals

    for name, fn in [("dep_gather_flat_u32", run_dep_gather1),
                     ("dep_gather_pairs", run_dep_gather2),
                     ("full_decode_step", run_full_decode),
                     ("decode_no_gather", run_no_gather)]:
        dt = timed(jax.jit(fn), states0, idx_in)
        print(json.dumps({"probe": name, "Melem_per_s": round(n / dt / 1e6, 1),
                          "us_per_step": round(dt / p * 1e6, 2)}))




def probe_bisect(n=1_000_000, lanes=512):
    """Bisect the gather-free decode step cost: cumsum vs window read vs
    in-window gather."""
    p = n // lanes
    rng = np.random.default_rng(0)
    states0 = jnp.asarray(rng.integers(1 << 16, 1 << 31, (lanes,)).astype(np.uint32))
    stream = jnp.asarray(rng.integers(0, 1 << 16, (n + lanes,)).astype(np.uint16))
    idx_in = jnp.asarray(rng.integers(0, 256, (p, lanes)).astype(np.int32))

    def mk(with_cumsum, with_window, with_wgather):
        def run(states0, idx_in):
            def step(carry, ii):
                states, offset = carry
                cum = states & MASK16
                sf = (cum * jnp.uint32(2654435761)) ^ ii.astype(jnp.uint32)
                start = sf >> 16
                freq = sf & MASK16
                adv = freq * (states >> 16) + cum - start
                flag = adv < jnp.uint32(1 << 16)
                if with_cumsum:
                    csum = jnp.cumsum(flag.astype(jnp.int32))
                else:
                    csum = flag.astype(jnp.int32) * 3
                if with_window:
                    window = jax.lax.dynamic_slice(stream, (offset,), (lanes,))
                    if with_wgather:
                        w = window[jnp.clip(csum - 1, 0, lanes - 1)].astype(jnp.uint32)
                    else:
                        w = window.astype(jnp.uint32)
                else:
                    w = csum.astype(jnp.uint32)
                adv = jnp.where(flag, (adv << 16) | w, adv)
                offset = offset + csum[-1]
                return (adv, offset), sf
            (s, _), vals = jax.lax.scan(step, (states0, jnp.int32(0)), idx_in)
            return s, vals
        return run

    for name, flags in [("math_only", (False, False, False)),
                        ("plus_cumsum", (True, False, False)),
                        ("plus_window", (True, True, False)),
                        ("plus_wgather(all)", (True, True, True))]:
        dt = timed(jax.jit(mk(*flags)), states0, idx_in)
        print(json.dumps({"probe": name, "Melem_per_s": round(n / dt / 1e6, 1),
                          "us_per_step": round(dt / p * 1e6, 2)}))


if __name__ == "__main__":
    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices())
    probe()
    probe_bisect()
