"""On-device vectorized interleaved rANS (PCT1 format) in pure JAX.

The TPU-native replacement for the reference's single-threaded CPU coder
(rans_interface.cpp): K lanes advance in lock-step inside `lax.scan`; all
per-symbol work is uint32 vector math + table gathers; renorm words from
all lanes share one stream via a per-step prefix-sum compaction.  Encode
and decode are jit-able end-to-end, so the *entire* compress/decompress
pipeline (transforms + entropy coding) stays on device — eliminating the
reference's GPU->CPU `.tolist()` marshalling boundary
(entropy_models.py:226-238).

Bit-identical to coder/rans_numpy.py (tested property + cross-impl).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.coder.tables import CoderTables, RANS_L, DEFAULT_LANES

_MASK16 = jnp.uint32(0xFFFF)


class DeviceTables(NamedTuple):
    """CoderTables as device arrays (cdf flattened for 1D gathers)."""

    cdf_flat: jax.Array  # (R*Lmax,) int32
    lmax: int
    cdf_length: jax.Array  # (R,) int32
    offset: jax.Array  # (R,) int32
    max_symbol: jax.Array  # (R,) int32
    inv_flat: jax.Array  # (R * 2^16,) int32

    @staticmethod
    def from_tables(t: CoderTables) -> "DeviceTables":
        return DeviceTables(
            cdf_flat=jnp.asarray(t.cdf.reshape(-1), jnp.int32),
            lmax=t.cdf.shape[1],
            cdf_length=jnp.asarray(t.cdf_length, jnp.int32),
            offset=jnp.asarray(t.offset, jnp.int32),
            max_symbol=jnp.asarray(t.max_symbol, jnp.int32),
            inv_flat=jnp.asarray(t.inverse().reshape(-1), jnp.int32),
        )


class DecoderState(NamedTuple):
    states: jax.Array  # (K,) uint32
    offset: jax.Array  # () int32 — next payload word index


def _pad_to_grid(x: jax.Array, lanes: int, fill=0):
    n = x.shape[0]
    p = -(-n // lanes)
    pad = p * lanes - n
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x.reshape(p, lanes)


def clamp_symbols(symbols: jax.Array, indexes: jax.Array, t: DeviceTables) -> jax.Array:
    v = symbols.astype(jnp.int32) - t.offset[indexes]
    return jnp.clip(v, 0, t.max_symbol[indexes])


def encode_stage_scan(states: jax.Array, v: jax.Array, idx: jax.Array, keep: jax.Array, t: DeviceTables):
    """Run the reverse-position encode scan for one stage.

    v, idx, keep: (P, K) grids.  Returns (states', words (P,K) uint16,
    flags (P,K) bool) with rows already re-ordered to decode (ascending)
    order.
    """

    def step(states, inp):
        vi, ii, ki = inp
        base = ii * t.lmax + vi
        start = t.cdf_flat[base].astype(jnp.uint32)
        nxt = t.cdf_flat[base + 1].astype(jnp.uint32)
        freq = jnp.where(ki, nxt - start, jnp.uint32(1))
        x_max = freq << 16
        flag = ki & (states >= x_max)
        words = (states & _MASK16).astype(jnp.uint16)
        x = jnp.where(flag, states >> 16, states)
        q = x // freq
        r = x - q * freq
        new_states = (q << 16) + r + start
        states = jnp.where(ki, new_states, states)
        return states, (words, flag)

    # scan over reversed position order
    states, (words, flags) = jax.lax.scan(step, states, (v[::-1], idx[::-1], keep[::-1]))
    return states, words[::-1], flags[::-1]


def encode_stages(stages, t: DeviceTables, lanes: int = DEFAULT_LANES):
    """stages: list of (symbols (n,), indexes (n,), keep (n,) bool) device
    arrays, in decode order.  Returns (stream (cap,) uint16, n_words ()).

    The encoder has no cross-stage dependency (all symbols are known), so
    every stage's position grid is concatenated and coded by ONE reverse
    scan — a single compiled loop regardless of slice count (the decoder
    must stay stage-wise: later params depend on earlier symbols).

    cap = 2*lanes + total padded symbol count (upper bound: <=1 word/symbol).
    """
    states = jnp.full((lanes,), RANS_L, dtype=jnp.uint32)
    v_all, idx_all, kp_all = [], [], []
    for symbols, indexes, keep in stages:
        v_all.append(_pad_to_grid(clamp_symbols(symbols, indexes, t), lanes))
        idx_all.append(_pad_to_grid(indexes.astype(jnp.int32), lanes))
        kp_all.append(_pad_to_grid(keep.astype(bool), lanes))
    v = jnp.concatenate(v_all, axis=0)
    idx = jnp.concatenate(idx_all, axis=0)
    kp = jnp.concatenate(kp_all, axis=0)
    states, words, flags = encode_stage_scan(states, v, idx, kp, t)

    words = words.reshape(-1)
    flags = flags.reshape(-1)

    # compact flagged words preserving order
    n_payload = flags.sum(dtype=jnp.int32)
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    cap = words.shape[0]
    payload = jnp.zeros((cap,), jnp.uint16)
    payload = payload.at[jnp.where(flags, pos, cap)].set(words, mode="drop")

    head = jnp.zeros((2 * lanes,), jnp.uint16)
    head = head.at[0::2].set((states & _MASK16).astype(jnp.uint16))
    head = head.at[1::2].set((states >> 16).astype(jnp.uint16))
    stream = jnp.concatenate([head, payload])
    return stream, n_payload + 2 * lanes


def decoder_init(stream: jax.Array, lanes: int = DEFAULT_LANES) -> DecoderState:
    head = stream[: 2 * lanes].astype(jnp.uint32)
    states = head[0::2] | (head[1::2] << 16)
    return DecoderState(states=states, offset=jnp.int32(2 * lanes))


def decode_stage(
    dec: DecoderState,
    stream: jax.Array,
    indexes: jax.Array,
    keep: jax.Array,
    t: DeviceTables,
    lanes: int = DEFAULT_LANES,
):
    """Decode one stage of n symbols; returns (dec', values (n,) int32)."""
    n = indexes.shape[0]
    idx = _pad_to_grid(indexes.astype(jnp.int32), lanes)
    kp = _pad_to_grid(keep.astype(bool), lanes)
    nwords = stream.shape[0]

    def step(carry, inp):
        states, offset = carry
        ii, ki = inp
        cum = states & _MASK16
        sym = t.inv_flat[(ii << 16) + cum.astype(jnp.int32)]
        base = ii * t.lmax + sym
        start = t.cdf_flat[base].astype(jnp.uint32)
        freq = t.cdf_flat[base + 1].astype(jnp.uint32) - start
        adv = freq * (states >> 16) + cum - start
        flag = ki & (adv < jnp.uint32(RANS_L))
        csum = jnp.cumsum(flag.astype(jnp.int32))
        pos = jnp.where(flag, offset + csum - 1, 0)
        w = stream[jnp.clip(pos, 0, nwords - 1)].astype(jnp.uint32)
        adv = jnp.where(flag, (adv << 16) | w, adv)
        states = jnp.where(ki, adv, states)
        offset = offset + csum[-1]
        vals = jnp.where(ki, sym + t.offset[ii], 0)
        return (states, offset), vals

    (states, offset), vals = jax.lax.scan(step, (dec.states, dec.offset), (idx, kp))
    return DecoderState(states, offset), vals.reshape(-1)[:n]


def stream_ok(dec: DecoderState) -> jax.Array:
    return (dec.states == jnp.uint32(RANS_L)).all()
