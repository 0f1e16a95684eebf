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

# Python int, NOT jnp.uint32: an eagerly-created jnp scalar is a live
# device buffer, and a jitted program that captures one as a closure
# constant forces a host fetch at lowering — on the tunneled TPU backend
# the first such fetch permanently degrades the whole process's dispatch
# latency ~300x (measured round 4: 0.03 ms -> 12 ms per dispatch).
# Weak typing promotes `x & 0xFFFF` to the array dtype, so an int is
# bit-identical here.
_MASK16 = 0xFFFF


class DeviceTables(NamedTuple):
    """CoderTables as device arrays, laid out for the scan hot loops.

    enc_sf: (R*Lmax,) uint32 — start<<16 | freq, indexed by row*Lmax + sym.
        Encode indices are scan INPUTS, so this is gathered flat (fast)
        before the scan ever runs.
    dec_sf: (R*2^16,) uint32 — start<<16 | freq indexed by row<<16 | cum.
        The ONLY in-scan gather: carry-dependent gathers cost ~12ns/elem
        on TPU regardless of table size (tools/probe_decode2.py), so the
        scan reads just this u32 and emits `cum`; the decoded value is
        recovered by a flat post-scan gather from dec_val.
    dec_val: (R*2^16,) int32 — symbol value indexed by row<<16 | cum.
    offset/max_symbol: per-row escape metadata (tiny)
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
    esc_offset: jax.Array  # () int32 — next escape word index (into esc buf)


def _pad_to_grid(x: jax.Array, lanes: int, fill=0):
    n = x.shape[0]
    p = -(-n // lanes)
    pad = p * lanes - n
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x.reshape(p, lanes)


def split_escapes(symbols: jax.Array, indexes: jax.Array, keep: jax.Array, t: DeviceTables):
    """Symbols -> (coded CDF indices, escape flags).  Out-of-support
    symbols code the row sentinel (max_symbol + 1) in-stream and their
    exact int32 value in the escape segment (see tables.py)."""
    v = symbols.astype(jnp.int32) - t.offset[indexes]
    maxs = t.max_symbol[indexes]
    in_sup = (v >= 0) & (v <= maxs)
    esc = keep.astype(bool) & ~in_sup
    return jnp.where(in_sup, jnp.clip(v, 0, maxs), maxs + 1), esc


def _div_u32_by_u16(x: jax.Array, freq: jax.Array):
    """Exact (q, r) = divmod(x, freq) for x < 2^32, freq in [1, 2^16].

    TPU u32 division inside a scan is slow; two chained f32 divisions with
    one-step two-sided corrections are exact: each f32 quotient estimate
    has absolute error < 1 (operands < 2^24 exactly representable for the
    high limb; the low limb's relative error ≤ ~2^-23 with quotient < 2^16),
    so a single ±1 fix per limb recovers the integer result.
    """
    ff = freq.astype(jnp.float32)
    hi = x >> 16
    q1 = jnp.floor(hi.astype(jnp.float32) / ff).astype(jnp.uint32)
    r1 = hi - q1 * freq
    neg = r1 > jnp.uint32(0x7FFFFFFF)
    q1 = jnp.where(neg, q1 - 1, q1)
    r1 = jnp.where(neg, r1 + freq, r1)
    over = r1 >= freq
    q1 = jnp.where(over, q1 + 1, q1)
    r1 = jnp.where(over, r1 - freq, r1)
    y = (r1 << 16) | (x & _MASK16)
    q2 = jnp.floor(y.astype(jnp.float32) / ff).astype(jnp.uint32)
    r2 = y - q2 * freq
    neg2 = r2 > jnp.uint32(0x7FFFFFFF)
    q2 = jnp.where(neg2, q2 - 1, q2)
    r2 = jnp.where(neg2, r2 + freq, r2)
    over2 = r2 >= freq
    q2 = jnp.where(over2, q2 + 1, q2)
    r2 = jnp.where(over2, r2 - freq, r2)
    return (q1 << 16) + q2, r2


def encode_stage_scan(states: jax.Array, v: jax.Array, idx: jax.Array, keep: jax.Array, t: DeviceTables):
    """Run the reverse-position encode scan for one stage.

    v, idx, keep: (P, K) grids.  Returns (states', words (P,K) uint16,
    flags (P,K) bool) with rows already re-ordered to decode (ascending)
    order.

    The (start, freq) gather is input-indexed, so it runs as ONE flat
    gather before the scan; the scan body is pure vector math (renorm +
    exact f32-limb division) — ~10x the in-scan-gather design
    (tools/probe_redesign.py).
    """
    sf_all = t.enc_sf[idx * t.lmax + v]  # (P, K) flat pre-gather
    # barrier: stop XLA re-fusing the gather into the scan body (in-scan
    # gathers serialize at ~12ns/elem; materialized flat gathers don't)
    sf_all = jax.lax.optimization_barrier(sf_all)

    def step(states, inp):
        sf, ki = inp
        start = sf >> 16
        freq = jnp.where(ki, sf & _MASK16, jnp.uint32(1))
        x_max = freq << 16
        flag = ki & (states >= x_max)
        words = (states & _MASK16).astype(jnp.uint16)
        x = jnp.where(flag, states >> 16, states)
        q, r = _div_u32_by_u16(x, freq)
        new_states = (q << 16) + r + start
        states = jnp.where(ki, new_states, states)
        return states, (words, flag)

    # scan over reversed position order
    states, (words, flags) = jax.lax.scan(step, states, (sf_all[::-1], keep[::-1]))
    return states, words[::-1], flags[::-1]


def _stage_grids(stages, t: DeviceTables, lanes: int):
    """Concatenate every stage's padded (P, K) grids: (v, idx, kp, esc, sym).

    split_escapes runs exactly once per stage here; downstream encoders
    consume the escape flags directly (they were previously recomputed in
    encode_grids — a free half of the escape-classification gathers)."""
    v_all, idx_all, kp_all, esc_all, sym_all = [], [], [], [], []
    for symbols, indexes, keep in stages:
        keep = keep.astype(bool)
        kp_grid = _pad_to_grid(keep, lanes)
        idx_grid = _pad_to_grid(indexes.astype(jnp.int32), lanes)
        sym_grid = _pad_to_grid(symbols.astype(jnp.int32), lanes)
        v, esc = split_escapes(
            sym_grid.reshape(-1), idx_grid.reshape(-1), kp_grid.reshape(-1), t
        )
        v_all.append(v.reshape(kp_grid.shape))
        idx_all.append(idx_grid)
        kp_all.append(kp_grid)
        esc_all.append(esc.reshape(kp_grid.shape))
        sym_all.append(sym_grid)
    return (
        jnp.concatenate(v_all, axis=0),
        jnp.concatenate(idx_all, axis=0),
        jnp.concatenate(kp_all, axis=0),
        jnp.concatenate(esc_all, axis=0),
        jnp.concatenate(sym_all, axis=0),
    )


def encode_grids(v, idx, kp, esc_flags, sym, t: DeviceTables, lanes: int):
    """Encode pre-gridded (P, K) stage data into one PCT1 stream.

    The shared kernel of the single-stream, fused-grouped, and sharded
    encoders — a given (grids, lanes) always produces identical bytes.
    esc_flags: (P, K) bool from _stage_grids (computed once per stage).
    Returns (stream (2K+P*K,), n_words, esc (2*P*K,), n_esc).
    """
    states = jnp.full((lanes,), RANS_L, dtype=jnp.uint32)
    states, words, flags = encode_stage_scan(states, v, idx, kp, t)

    words = words.reshape(-1)
    flags = flags.reshape(-1)

    # compact flagged words preserving order
    n_payload = flags.sum(dtype=jnp.int32)
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    cap = words.shape[0]
    payload = jnp.zeros((cap,), jnp.uint16)
    payload = payload.at[jnp.where(flags, pos, cap)].set(words, mode="drop")

    # escape segment: compact raw values of escaped symbols, decode order
    # (cond-gated: in normal operation there are no escapes and the
    # common path pays only the flag reduction)
    sym_f = sym.reshape(-1)
    esc_flags = esc_flags.reshape(-1)
    n_esc = esc_flags.sum(dtype=jnp.int32)

    def build_esc(_):
        epos = jnp.cumsum(esc_flags.astype(jnp.int32)) - 1
        raw = sym_f.astype(jnp.uint32)
        e = jnp.zeros((2 * cap,), jnp.uint16)
        tgt = jnp.where(esc_flags, 2 * epos, 2 * cap)
        e = e.at[tgt].set((raw & _MASK16).astype(jnp.uint16), mode="drop")
        return e.at[tgt + 1].set((raw >> 16).astype(jnp.uint16), mode="drop")

    esc = jax.lax.cond(
        n_esc > 0, build_esc, lambda _: jnp.zeros((2 * cap,), jnp.uint16), None
    )

    head = jnp.zeros((2 * lanes,), jnp.uint16)
    head = head.at[0::2].set((states & _MASK16).astype(jnp.uint16))
    head = head.at[1::2].set((states >> 16).astype(jnp.uint16))
    stream = jnp.concatenate([head, payload])
    return stream, n_payload + 2 * lanes, esc, n_esc


def encode_stages(stages, t: DeviceTables, lanes: int = DEFAULT_LANES):
    """stages: list of (symbols (n,), indexes (n,), keep (n,) bool) device
    arrays, in decode order.  Returns
    (stream (cap,) uint16, n_words (), esc (2*cap_sym,) uint16, n_esc ()).

    The encoder has no cross-stage dependency (all symbols are known), so
    every stage's position grid is concatenated and coded by ONE reverse
    scan — a single compiled loop regardless of slice count (the decoder
    must stay stage-wise: later params depend on earlier symbols).

    cap = 2*lanes + total padded symbol count (upper bound: <=1 word/symbol).
    The escape segment is built OUTSIDE the scan (escape flags depend only
    on symbols, not coder state): exact raw int32 values as (lo, hi) uint16
    pairs in decode order; n_esc counts escapes (esc words used = 2*n_esc).

    NOTE: this is the one-shot composition (used by tests and the
    shard_map'd sharded coder, which need a single program).  The hot
    single-device codec path calls the three phases below as SEPARATE
    executables — composing flat ops with the scan in one XLA program
    degrades both by ~3x (layout/fusion pathology, tools/probe_redesign.py
    + bisect logs in runs/).
    """
    v, idx, kp, esc, sym = _stage_grids(stages, t, lanes)
    return encode_grids(v, idx, kp, esc, sym, t, lanes)


# --- split-executable encode phases (single-device hot path) -------------


def encode_prepare(stages, t: DeviceTables, lanes: int = DEFAULT_LANES):
    """Phase 1 (flat): grids + the input-indexed (start,freq) pre-gather.

    Returns (sf_rev (P,K) u32, kp_rev (P,K) bool, esc_flags (P,K) bool,
    sym (P,K) i32) with the scan inputs already position-reversed."""
    v, idx, kp, esc, sym = _stage_grids(stages, t, lanes)
    sf = t.enc_sf[idx * t.lmax + v]
    return sf[::-1], kp[::-1], esc, sym


def encode_scan_rev(sf_rev: jax.Array, kp_rev: jax.Array, lanes: int):
    """Phase 2 (pure scan): reverse-position encode over pre-gathered
    (start,freq).  Returns (states, words_rev (P,K) u16, flags_rev (P,K))."""
    states = jnp.full((lanes,), RANS_L, dtype=jnp.uint32)

    def step(states, inp):
        sf, ki = inp
        start = sf >> 16
        freq = jnp.where(ki, sf & _MASK16, jnp.uint32(1))
        x_max = freq << 16
        flag = ki & (states >= x_max)
        words = (states & _MASK16).astype(jnp.uint16)
        x = jnp.where(flag, states >> 16, states)
        q, r = _div_u32_by_u16(x, freq)
        new_states = (q << 16) + r + start
        states = jnp.where(ki, new_states, states)
        return states, (words, flag)

    states, (words, flags) = jax.lax.scan(step, states, (sf_rev, kp_rev))
    return states, words, flags


def encode_finalize(states, words_rev, flags_rev, esc_flags, sym, lanes: int):
    """Phase 3 (flat): payload compaction, escape segment, lane-state head."""
    words = words_rev[::-1].reshape(-1)
    flags = flags_rev[::-1].reshape(-1)
    n_payload = flags.sum(dtype=jnp.int32)
    pos = jnp.cumsum(flags.astype(jnp.int32)) - 1
    cap = words.shape[0]
    payload = jnp.zeros((cap,), jnp.uint16)
    payload = payload.at[jnp.where(flags, pos, cap)].set(words, mode="drop")

    sym_f = sym.reshape(-1)
    esc_flags = esc_flags.reshape(-1)
    n_esc = esc_flags.sum(dtype=jnp.int32)

    def build_esc(_):
        epos = jnp.cumsum(esc_flags.astype(jnp.int32)) - 1
        raw = sym_f.astype(jnp.uint32)
        e = jnp.zeros((2 * cap,), jnp.uint16)
        tgt = jnp.where(esc_flags, 2 * epos, 2 * cap)
        e = e.at[tgt].set((raw & _MASK16).astype(jnp.uint16), mode="drop")
        return e.at[tgt + 1].set((raw >> 16).astype(jnp.uint16), mode="drop")

    esc = jax.lax.cond(
        n_esc > 0, build_esc, lambda _: jnp.zeros((2 * cap,), jnp.uint16), None
    )

    head = jnp.zeros((2 * lanes,), jnp.uint16)
    head = head.at[0::2].set((states & _MASK16).astype(jnp.uint16))
    head = head.at[1::2].set((states >> 16).astype(jnp.uint16))
    stream = jnp.concatenate([head, payload])
    return stream, n_payload + 2 * lanes, esc, n_esc


def decoder_init(stream: jax.Array, lanes: int = DEFAULT_LANES) -> DecoderState:
    head = stream[: 2 * lanes].astype(jnp.uint32)
    states = head[0::2] | (head[1::2] << 16)
    return DecoderState(states=states, offset=jnp.int32(2 * lanes),
                        esc_offset=jnp.int32(0))


def decode_stage_scan(
    dec: DecoderState,
    stream: jax.Array,
    indexes_grid: jax.Array,
    keep_grid: jax.Array,
    t: DeviceTables,
    lanes: int = DEFAULT_LANES,
):
    """The decode state recursion for one stage (pure scan phase).

    indexes_grid/keep_grid: (P, K).  Returns (states, offset, cums (P,K))
    — `cums` are the per-position CDF positions from which the decoded
    values are recovered by a flat gather in decode_stage_values.
    """
    # slack so the contiguous window read never clips at the stream tail
    stream = jnp.concatenate([stream, jnp.zeros((lanes,), jnp.uint16)])
    lane_iota = jnp.arange(lanes, dtype=jnp.int32)

    def step(carry, inp):
        states, offset = carry
        ii, ki = inp
        cum = states & _MASK16
        lin = (ii << 16) + cum.astype(jnp.int32)
        sf = t.dec_sf[lin]  # the only in-scan gather
        start = sf >> 16
        freq = sf & _MASK16
        adv = freq * (states >> 16) + cum - start
        flag = ki & (adv < jnp.uint32(RANS_L))
        csum = jnp.cumsum(flag.astype(jnp.int32))
        # all words consumed this step are contiguous at `offset` — load the
        # window once, then distribute word j to the j-th flagged lane.
        # csum-1 is monotone, so the distribution is a 0/1 matrix: one MXU
        # matvec beats the in-window gather ~5x (probe_decode2.py); exact
        # because window values are u16 < 2^24.
        window = jax.lax.dynamic_slice(stream, (offset,), (lanes,))
        onehot = (csum[:, None] - 1 == lane_iota[None, :]).astype(jnp.float32)
        w = jnp.dot(onehot, window.astype(jnp.float32),
                    preferred_element_type=jnp.float32).astype(jnp.uint32)
        adv = jnp.where(flag, (adv << 16) | w, adv)
        states = jnp.where(ki, adv, states)
        offset = offset + csum[-1]
        return (states, offset), cum

    (states, offset), cums = jax.lax.scan(step, (dec.states, dec.offset), (indexes_grid, keep_grid))
    return states, offset, cums


def decode_stage_values(
    esc_offset,
    cums: jax.Array,
    esc: jax.Array,
    indexes: jax.Array,
    keep: jax.Array,
    t: DeviceTables,
    lanes: int = DEFAULT_LANES,
):
    """Recover decoded values from scan `cums` (flat phase).

    Returns (esc_offset', values (n,) int32).  The decoded value is not on
    the scan's critical path (the state recursion needs only start/freq),
    so it is ONE flat gather here; escape sentinels are substituted with
    their exact int32 from the escape segment, in order, behind a cond.
    """
    n = indexes.shape[0]
    idx = _pad_to_grid(indexes.astype(jnp.int32), lanes)
    kp = _pad_to_grid(keep.astype(bool), lanes)
    vals = t.dec_val[(idx << 16) + cums.astype(jnp.int32)]
    vals = jnp.where(kp, vals, 0).reshape(-1)[:n]

    idx_f = indexes.astype(jnp.int32)
    kp_f = keep.astype(bool)
    sentinel = t.offset[idx_f] + t.max_symbol[idx_f] + 1
    esc_flag = kp_f & (vals == sentinel)
    n_esc = esc_flag.sum(dtype=jnp.int32)

    def substitute(v):
        j = esc_offset + 2 * (jnp.cumsum(esc_flag.astype(jnp.int32)) - 1)
        safe = jnp.where(esc_flag, j, 0)
        lo = esc[jnp.clip(safe, 0, esc.shape[0] - 1)].astype(jnp.uint32)
        hi = esc[jnp.clip(safe + 1, 0, esc.shape[0] - 1)].astype(jnp.uint32)
        raw = (lo | (hi << 16)).astype(jnp.int32)
        return jnp.where(esc_flag, raw, v)

    vals = jax.lax.cond(n_esc > 0, substitute, lambda v: v, vals)
    return esc_offset + 2 * n_esc, vals


def decode_stage(
    dec: DecoderState,
    stream: jax.Array,
    esc: jax.Array,
    indexes: jax.Array,
    keep: jax.Array,
    t: DeviceTables,
    lanes: int = DEFAULT_LANES,
):
    """Decode one stage of n symbols; returns (dec', values (n,) int32).

    One-shot composition of decode_stage_scan + decode_stage_values (the
    hot codec path dispatches the two phases as separate executables —
    see encode_stages NOTE).
    """
    idx = _pad_to_grid(indexes.astype(jnp.int32), lanes)
    kp = _pad_to_grid(keep.astype(bool), lanes)
    states, offset, cums = decode_stage_scan(dec, stream, idx, kp, t, lanes)
    esc_offset, vals = decode_stage_values(
        dec.esc_offset, cums, esc, indexes, keep, t, lanes
    )
    return DecoderState(states, offset, esc_offset), vals


def stream_ok(dec: DecoderState) -> jax.Array:
    return (dec.states == jnp.uint32(RANS_L)).all()


# ---------------------------------------------------------------------------
# Grouped (shardable) format: G independent PCT1 sub-streams (PCT1-G)
# ---------------------------------------------------------------------------
#
# Group g owns lanes [g*K/G, (g+1)*K/G); its sub-stream is the standalone
# PCT1 encoding of those lanes' symbols with K/G lanes.  Bit-identical to
# rans_numpy.encode_stages_grouped.  Because groups never interact, the
# fused single-device path runs ONE scan over all K lanes and compacts
# per group; a mesh shards the same computation over its devices
# (parallel/sharded_coder.py), producing byte-identical sub-streams.


class GroupedDecoderState(NamedTuple):
    states: jax.Array  # (K,) uint32 — all groups' lane states
    offsets: jax.Array  # (G,) int32 — per-group payload word index
    esc_offsets: jax.Array  # (G,) int32 — per-group escape word index


def encode_stages_grouped(stages, t: DeviceTables, lanes: int = DEFAULT_LANES,
                          groups: int = 1):
    """Returns (streams (G, cap), n_words (G,), escs (G, 2*cap), n_escs (G,))
    where cap = 2*K/G + total padded positions * K/G."""
    assert lanes % groups == 0
    kt = lanes // groups
    states = jnp.full((lanes,), RANS_L, dtype=jnp.uint32)
    v, idx, kp, esc_flags, sym = _stage_grids(stages, t, lanes)
    states, words, flags = encode_stage_scan(states, v, idx, kp, t)

    p_total = words.shape[0]
    cap = p_total * kt

    # per-group payload compaction: group-major (p, local-lane) order
    def to_groups(x):  # (P, K) -> (G, P*Kt)
        return x.reshape(p_total, groups, kt).transpose(1, 0, 2).reshape(groups, -1)

    gw = to_groups(words)
    gf = to_groups(flags)
    n_words = gf.sum(axis=1, dtype=jnp.int32)
    pos = jnp.cumsum(gf.astype(jnp.int32), axis=1) - 1
    payload = jnp.zeros((groups, cap), jnp.uint16)
    rows = jnp.broadcast_to(jnp.arange(groups)[:, None], gf.shape)
    payload = payload.at[rows, jnp.where(gf, pos, cap)].set(gw, mode="drop")

    # per-group escape segments (cond-gated like the single-stream path;
    # esc_flags come from _stage_grids — computed once per stage)
    ge = to_groups(esc_flags)
    n_escs = ge.sum(axis=1, dtype=jnp.int32)

    def build_escs(_):
        graw = to_groups(sym).astype(jnp.uint32)
        epos = jnp.cumsum(ge.astype(jnp.int32), axis=1) - 1
        e = jnp.zeros((groups, 2 * cap), jnp.uint16)
        tgt = jnp.where(ge, 2 * epos, 2 * cap)
        e = e.at[rows, tgt].set((graw & _MASK16).astype(jnp.uint16), mode="drop")
        return e.at[rows, tgt + 1].set((graw >> 16).astype(jnp.uint16), mode="drop")

    escs = jax.lax.cond(
        n_escs.sum() > 0, build_escs,
        lambda _: jnp.zeros((groups, 2 * cap), jnp.uint16), None,
    )

    # per-group lane-state heads
    gs = states.reshape(groups, kt)
    head = jnp.zeros((groups, 2 * kt), jnp.uint16)
    head = head.at[:, 0::2].set((gs & _MASK16).astype(jnp.uint16))
    head = head.at[:, 1::2].set((gs >> 16).astype(jnp.uint16))
    streams = jnp.concatenate([head, payload], axis=1)
    return streams, n_words + 2 * kt, escs, n_escs


def grouped_decoder_init(streams: jax.Array, lanes: int, groups: int) -> GroupedDecoderState:
    """streams: (G, cap) — each row a PCT1 sub-stream with K/G lanes."""
    kt = lanes // groups
    head = streams[:, : 2 * kt].astype(jnp.uint32)
    states = (head[:, 0::2] | (head[:, 1::2] << 16)).reshape(-1)
    return GroupedDecoderState(
        states=states,
        offsets=jnp.full((groups,), 2 * kt, jnp.int32),
        esc_offsets=jnp.zeros((groups,), jnp.int32),
    )


def decode_stage_grouped(
    dec: GroupedDecoderState,
    streams: jax.Array,
    escs: jax.Array,
    indexes: jax.Array,
    keep: jax.Array,
    t: DeviceTables,
    lanes: int = DEFAULT_LANES,
    groups: int = 1,
):
    """Decode one stage across all groups in lock-step; returns
    (dec', values (n,) int32) in global symbol order."""
    kt = lanes // groups
    n = indexes.shape[0]
    idx = _pad_to_grid(indexes.astype(jnp.int32), lanes)
    kp = _pad_to_grid(keep.astype(bool), lanes)
    streams = jnp.concatenate(
        [streams, jnp.zeros((groups, kt), jnp.uint16)], axis=1
    )

    lane_iota = jnp.arange(kt, dtype=jnp.int32)

    def step(carry, inp):
        states, offsets = carry
        ii, ki = inp
        cum = states & _MASK16
        lin = (ii << 16) + cum.astype(jnp.int32)
        sf = t.dec_sf[lin]  # the only in-scan gather
        start = sf >> 16
        freq = sf & _MASK16
        adv = freq * (states >> 16) + cum - start
        flag = ki & (adv < jnp.uint32(RANS_L))
        gflag = flag.reshape(groups, kt)
        csum = jnp.cumsum(gflag.astype(jnp.int32), axis=1)
        window = jax.vmap(
            lambda s, o: jax.lax.dynamic_slice(s, (o,), (kt,))
        )(streams, offsets)
        # per-group monotone distribution as a batched 0/1 matmul (see
        # decode_stage) — exact for u16 words
        onehot = (csum[:, :, None] - 1 == lane_iota[None, None, :]).astype(
            jnp.float32
        )
        w = jnp.einsum(
            "gkj,gj->gk", onehot, window.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(-1).astype(jnp.uint32)
        adv = jnp.where(flag, (adv << 16) | w, adv)
        states = jnp.where(ki, adv, states)
        offsets = offsets + csum[:, -1]
        return (states, offsets), cum

    (states, offsets), cums = jax.lax.scan(step, (dec.states, dec.offsets), (idx, kp))
    vals = t.dec_val[(idx << 16) + cums.astype(jnp.int32)]
    vals = jnp.where(kp, vals, 0)
    p_total = idx.shape[0]

    # per-group escape substitution in group order (cond-gated: escapes
    # are ~never in normal operation)
    idx_g = idx.reshape(p_total, groups, kt).transpose(1, 0, 2).reshape(groups, -1)
    kp_g = kp.reshape(p_total, groups, kt).transpose(1, 0, 2).reshape(groups, -1)
    vals_g = vals.reshape(p_total, groups, kt).transpose(1, 0, 2).reshape(groups, -1)
    sentinel = t.offset[idx_g] + t.max_symbol[idx_g] + 1
    esc_flag = kp_g & (vals_g == sentinel)
    n_esc_g = esc_flag.sum(axis=1, dtype=jnp.int32)

    def substitute(v):
        j = dec.esc_offsets[:, None] + 2 * (
            jnp.cumsum(esc_flag.astype(jnp.int32), axis=1) - 1
        )
        safe = jnp.where(esc_flag, j, 0)
        rows = jnp.broadcast_to(jnp.arange(groups)[:, None], esc_flag.shape)
        lo = escs[rows, jnp.clip(safe, 0, escs.shape[1] - 1)].astype(jnp.uint32)
        hi = escs[rows, jnp.clip(safe + 1, 0, escs.shape[1] - 1)].astype(jnp.uint32)
        raw = (lo | (hi << 16)).astype(jnp.int32)
        return jnp.where(esc_flag, raw, v)

    vals_g = jax.lax.cond(n_esc_g.sum() > 0, substitute, lambda v: v, vals_g)
    esc_offsets = dec.esc_offsets + 2 * n_esc_g

    vals = vals_g.reshape(groups, p_total, kt).transpose(1, 0, 2).reshape(-1)[:n]
    return GroupedDecoderState(states, offsets, esc_offsets), vals


def grouped_stream_ok(dec: GroupedDecoderState) -> jax.Array:
    return (dec.states == jnp.uint32(RANS_L)).all()
