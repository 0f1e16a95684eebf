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
    """CoderTables as device arrays, packed for one-gather-per-symbol.

    enc_sf: (R*Lmax,) uint32 — start<<16 | freq, indexed by row*Lmax + sym
    dec_sf: (R*2^16,) uint32 — start<<16 | freq, indexed by row<<16 | cum
    dec_val: (R*2^16,) int32 — decoded value (sym + row offset), same index
    offset/max_symbol: per-row clamp metadata (tiny)
    """

    enc_sf: jax.Array
    dec_sf: jax.Array
    dec_val: jax.Array
    lmax: int
    cdf_length: jax.Array  # (R,) int32
    offset: jax.Array  # (R,) int32
    max_symbol: jax.Array  # (R,) int32

    @staticmethod
    def from_tables(t: CoderTables) -> "DeviceTables":
        cdf = t.cdf.astype(np.int64)
        r, lmax = cdf.shape
        starts = cdf
        freqs = np.zeros_like(cdf)
        freqs[:, :-1] = cdf[:, 1:] - cdf[:, :-1]
        enc_sf = (starts.astype(np.uint32) << 16) | (
            freqs.astype(np.uint32) & 0xFFFF
        )

        inv = t.inverse().astype(np.int64)  # (R, 2^16) symbol index
        d_start = np.take_along_axis(cdf, inv, axis=1)
        d_freq = np.take_along_axis(cdf, inv + 1, axis=1) - d_start
        dec_sf = (d_start.astype(np.uint32) << 16) | (
            d_freq.astype(np.uint32) & 0xFFFF
        )
        dec_val = (inv + t.offset[:, None].astype(np.int64)).astype(np.int32)

        return DeviceTables(
            enc_sf=jnp.asarray(enc_sf.reshape(-1)),
            dec_sf=jnp.asarray(dec_sf.reshape(-1)),
            dec_val=jnp.asarray(dec_val.reshape(-1)),
            lmax=lmax,
            cdf_length=jnp.asarray(t.cdf_length, jnp.int32),
            offset=jnp.asarray(t.offset, jnp.int32),
            max_symbol=jnp.asarray(t.max_symbol, jnp.int32),
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
        sf = t.enc_sf[ii * t.lmax + vi]
        start = sf >> 16
        freq = jnp.where(ki, sf & _MASK16, jnp.uint32(1))
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
    # slack so the contiguous window read never clips at the stream tail
    stream = jnp.concatenate([stream, jnp.zeros((lanes,), jnp.uint16)])

    def step(carry, inp):
        states, offset = carry
        ii, ki = inp
        cum = states & _MASK16
        lin = (ii << 16) + cum.astype(jnp.int32)
        sf = t.dec_sf[lin]
        start = sf >> 16
        freq = sf & _MASK16
        adv = freq * (states >> 16) + cum - start
        flag = ki & (adv < jnp.uint32(RANS_L))
        csum = jnp.cumsum(flag.astype(jnp.int32))
        # all words consumed this step are contiguous at `offset` — load the
        # window once, then index within it (avoids a global gather)
        window = jax.lax.dynamic_slice(stream, (offset,), (lanes,))
        w = window[jnp.clip(csum - 1, 0, lanes - 1)].astype(jnp.uint32)
        adv = jnp.where(flag, (adv << 16) | w, adv)
        states = jnp.where(ki, adv, states)
        offset = offset + csum[-1]
        vals = jnp.where(ki, t.dec_val[lin], 0)
        return (states, offset), vals

    (states, offset), vals = jax.lax.scan(step, (dec.states, dec.offset), (idx, kp))
    return DecoderState(states, offset), vals.reshape(-1)[:n]


def stream_ok(dec: DecoderState) -> jax.Array:
    return (dec.states == jnp.uint32(RANS_L)).all()
