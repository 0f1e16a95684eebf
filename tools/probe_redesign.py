"""Validate the redesigned encode/decode scan steps before they land.

Decode v2: one u32 sf gather in-scan, one-hot MXU matmuls for cumsum +
window read, cum emitted per step, vals gathered flat post-scan.
Encode v2: sf pre-gathered flat (input indices), exact 2-limb f32 div
in-scan.

Usage: python tools/probe_redesign.py [lanes ...]
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


def probe(lanes, n=2_000_000):
    p = n // lanes
    rng = np.random.default_rng(0)
    rows = 256
    dec_sf = jnp.asarray(rng.integers(0, 2**31, (rows << 16,)).astype(np.uint32))
    idx_in = jnp.asarray(rng.integers(0, rows, (p, lanes)).astype(np.int32))
    states0 = jnp.asarray(rng.integers(1 << 16, 1 << 31, (lanes,)).astype(np.uint32))
    stream = jnp.asarray(rng.integers(0, 1 << 16, (n + lanes,)).astype(np.uint16))
    tril = jnp.tril(jnp.ones((lanes, lanes), jnp.float32))
    lane_iota = jnp.arange(lanes, dtype=jnp.int32)

    def dec_v2(states0, idx_in):
        def step(carry, ii):
            states, offset = carry
            cum = states & MASK16
            lin = (ii << 16) + cum.astype(jnp.int32)
            sf = dec_sf[lin]
            start = sf >> 16
            freq = sf & MASK16
            adv = freq * (states >> 16) + cum - start
            flag = adv < jnp.uint32(1 << 16)
            ff = flag.astype(jnp.float32)
            csum_f = jnp.dot(tril, ff, preferred_element_type=jnp.float32)
            csum = csum_f.astype(jnp.int32)
            window = jax.lax.dynamic_slice(stream, (offset,), (lanes,))
            onehot = (csum[:, None] - 1 == lane_iota[None, :]).astype(jnp.float32)
            w = jnp.dot(onehot, window.astype(jnp.float32),
                        preferred_element_type=jnp.float32).astype(jnp.uint32)
            adv = jnp.where(flag, (adv << 16) | w, adv)
            offset = offset + csum[-1]
            return (adv, offset), cum
        (s, _), cums = jax.lax.scan(step, (states0, jnp.int32(0)), idx_in)
        # post-scan flat val gather
        vals = dec_sf[(idx_in << 16) + cums.astype(jnp.int32)]
        return s, vals

    # encode v2: pre-gathered sf, 2-limb exact f32 div inside the scan
    enc_sf_in = jnp.asarray(rng.integers((1 << 16) | 1, 2**31, (p, lanes)).astype(np.uint32))

    def enc_v2(states0, enc_sf_in):
        def step(states, inp):
            sf, = inp
            start = sf >> 16
            freq = sf & MASK16
            x_max = freq << 16
            flag = states >= x_max
            words = (states & MASK16).astype(jnp.uint16)
            x = jnp.where(flag, states >> 16, states)
            # exact 2-limb f32 division x // freq (freq in [1, 2^16])
            ff = freq.astype(jnp.float32)
            hi = (x >> 16).astype(jnp.float32)
            q1 = jnp.floor(hi / ff).astype(jnp.uint32)
            r1 = (x >> 16) - q1 * freq
            over = r1 >= freq
            neg = r1 > jnp.uint32(0x7FFFFFFF)
            q1 = jnp.where(over, q1 + 1, jnp.where(neg, q1 - 1, q1))
            r1 = jnp.where(over, r1 - freq, jnp.where(neg, r1 + freq, r1))
            y = (r1 << 16) | (x & MASK16)
            q2 = jnp.floor(y.astype(jnp.float32) / ff).astype(jnp.uint32)
            r2 = y - q2 * freq
            over2 = r2 >= freq
            neg2 = r2 > jnp.uint32(0x7FFFFFFF)
            q2 = jnp.where(over2, q2 + 1, jnp.where(neg2, q2 - 1, q2))
            r2 = jnp.where(over2, r2 - freq, jnp.where(neg2, r2 + freq, r2))
            q = (q1 << 16) + q2
            states = (q << 16) + r2 + start
            return states, (words, flag)
        states, (words, flags) = jax.lax.scan(step, states0, (enc_sf_in,))
        return states, words, flags

    for name, fn, args in [("dec_v2", dec_v2, (states0, idx_in)),
                           ("enc_v2", enc_v2, (states0, enc_sf_in))]:
        dt = timed(jax.jit(fn), *args)
        print(json.dumps({"probe": name, "lanes": lanes,
                          "us_per_step": round(dt / p * 1e6, 2),
                          "Melem_s": round(n / dt / 1e6, 1)}))


if __name__ == "__main__":
    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    for lanes in [int(a) for a in (sys.argv[1:] or ["512", "1024", "2048"])]:
        probe(lanes)
