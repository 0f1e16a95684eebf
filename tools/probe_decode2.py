"""Round-3 decode-scan design probes.

Questions:
  A. How do per-step costs scale with lane width (fixed overhead vs
     per-element)?  -> decides whether bigger lanes amortize.
  B. Does a carry-dependent gather get cheaper when the table is small
     (VMEM-resident)?  -> decides alias-table redesign.
  C. Is the one-hot MXU matmul faster than the in-window gather for the
     monotone renorm-word read?

Usage: python tools/probe_decode2.py
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


def probe_lane_scaling(n=2_000_000):
    """Empty-carry scan, math-only, and full decode step at several widths."""
    rng = np.random.default_rng(0)
    size = 256 << 16
    table2 = jnp.asarray(rng.integers(0, 2**31, (size, 2)).astype(np.uint32))

    for lanes in [512, 1024, 2048, 4096]:
        p = n // lanes
        states0 = jnp.asarray(
            rng.integers(1 << 16, 1 << 31, (lanes,)).astype(np.uint32))
        idx_in = jnp.asarray(rng.integers(0, 256, (p, lanes)).astype(np.int32))
        stream = jnp.asarray(
            rng.integers(0, 1 << 16, (n + lanes,)).astype(np.uint16))

        def run_empty(states0, idx_in):
            def step(s, ii):
                return s + jnp.uint32(1), ()
            s, _ = jax.lax.scan(step, states0, idx_in)
            return s

        def run_math(states0, idx_in):
            def step(states, ii):
                cum = states & MASK16
                sf = (cum * jnp.uint32(2654435761)) ^ ii.astype(jnp.uint32)
                freq = sf & MASK16
                adv = freq * (states >> 16) + cum - (sf >> 16)
                return jnp.where(adv > 0, adv, states), ()
            s, _ = jax.lax.scan(step, states0, idx_in)
            return s

        def run_full(states0, idx_in):
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
                states = jnp.where(flag | True, adv, states)
                offset = offset + csum[-1]
                return (states, offset), packed[:, 1]
            (s, _), vals = jax.lax.scan(step, (states0, jnp.int32(0)), idx_in)
            return s, vals

        row = {"lanes": lanes}
        for name, fn in [("empty", run_empty), ("math", run_math),
                         ("full", run_full)]:
            dt = timed(jax.jit(fn), states0, idx_in)
            row[name + "_us_per_step"] = round(dt / p * 1e6, 2)
            row[name + "_Melem_s"] = round(n / dt / 1e6, 1)
        print(json.dumps(row))


def probe_table_size(n=1_000_000, lanes=512):
    """Carry-dependent gather cost vs table size."""
    p = n // lanes
    rng = np.random.default_rng(0)
    states0 = jnp.asarray(
        rng.integers(1 << 16, 1 << 31, (lanes,)).astype(np.uint32))
    for size_log2 in [14, 17, 20, 24]:  # 128KB .. 134MB (u64 pairs)
        size = 1 << size_log2
        table = jnp.asarray(rng.integers(0, 2**31, (size, 2)).astype(np.uint32))
        idx_in = jnp.asarray(
            rng.integers(0, max(size >> 16, 1), (p, lanes)).astype(np.int32))
        mask = jnp.uint32(size - 1)

        def run(states0, idx_in):
            def step(states, ii):
                lin = ((ii << 16) + (states & MASK16).astype(jnp.int32)) & mask
                g = table[lin]
                return states * jnp.uint32(5) + g[:, 0] + g[:, 1], ()
            s, _ = jax.lax.scan(step, states0, idx_in)
            return s

        dt = timed(jax.jit(run), states0, idx_in)
        print(json.dumps({"probe": "dep_gather", "table_mb": round(size * 8 / 1e6, 1),
                          "us_per_step": round(dt / p * 1e6, 2),
                          "Melem_s": round(n / dt / 1e6, 1)}))


def probe_matmul_window(n=1_000_000, lanes=512):
    """Monotone in-window read: gather vs one-hot MXU matmul."""
    p = n // lanes
    rng = np.random.default_rng(0)
    states0 = jnp.asarray(
        rng.integers(1 << 16, 1 << 31, (lanes,)).astype(np.uint32))
    idx_in = jnp.asarray(rng.integers(0, 256, (p, lanes)).astype(np.int32))
    stream = jnp.asarray(rng.integers(0, 1 << 16, (n + lanes,)).astype(np.uint16))
    lane_iota = jnp.arange(lanes, dtype=jnp.int32)

    def mk(use_matmul):
        def run(states0, idx_in):
            def step(carry, ii):
                states, offset = carry
                cum = states & MASK16
                sf = (cum * jnp.uint32(2654435761)) ^ ii.astype(jnp.uint32)
                freq = sf & MASK16
                adv = freq * (states >> 16) + cum - (sf >> 16)
                flag = adv < jnp.uint32(1 << 16)
                csum = jnp.cumsum(flag.astype(jnp.int32))
                window = jax.lax.dynamic_slice(stream, (offset,), (lanes,))
                if use_matmul:
                    # one-hot (lanes, lanes) @ window — exact for u16 in f32
                    onehot = (csum[:, None] - 1 == lane_iota[None, :])
                    w = jnp.dot(onehot.astype(jnp.float32),
                                window.astype(jnp.float32),
                                preferred_element_type=jnp.float32)
                    w = w.astype(jnp.uint32)
                else:
                    w = window[jnp.clip(csum - 1, 0, lanes - 1)].astype(jnp.uint32)
                adv = jnp.where(flag, (adv << 16) | w, adv)
                offset = offset + csum[-1]
                return (adv, offset), sf
            (s, _), vals = jax.lax.scan(step, (states0, jnp.int32(0)), idx_in)
            return s, vals
        return run

    for name, use in [("window_gather", False), ("window_matmul", True)]:
        dt = timed(jax.jit(mk(use)), states0, idx_in)
        print(json.dumps({"probe": name, "us_per_step": round(dt / p * 1e6, 2),
                          "Melem_s": round(n / dt / 1e6, 1)}))


if __name__ == "__main__":
    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices())
    probe_lane_scaling()
    probe_table_size()
    probe_matmul_window()
