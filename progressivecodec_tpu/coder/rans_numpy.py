"""Golden host implementation of the PCT1 interleaved rANS format.

Vectorized numpy, bit-for-bit identical to the device coder — used as the
test oracle and the slow-but-sure host fallback.  See tables.py for the
format spec, including the lossless escape extension (sentinel symbol in
the rANS stream + fixed-width 32-bit raw value in the escape segment).
"""

from __future__ import annotations

import numpy as np

from progressivecodec_tpu.coder.tables import CoderTables, PRECISION, RANS_L, DEFAULT_LANES

_MASK16 = (1 << 16) - 1


def _stage_grid(n: int, lanes: int):
    """Positions P for n symbols across `lanes` lanes."""
    return (n + lanes - 1) // lanes


def split_escapes(symbols: np.ndarray, indexes: np.ndarray, keep: np.ndarray,
                  tables: CoderTables):
    """Symbols -> (coded indices v, escape flags).

    In-support symbols code their CDF index; out-of-support symbols code
    the row's sentinel index (max_symbol + 1, the tail entry — its
    frequency is >= 1 by the CDF builder's invariants) and their exact
    int32 value goes to the escape segment.  This replaces clamping, so
    the coder is lossless for arbitrary symbols (reference semantics:
    rans_interface.cpp:99-164, redesigned for SIMD lanes).
    """
    v = symbols.astype(np.int64) - tables.offset[indexes]
    maxs = tables.max_symbol[indexes]
    in_sup = (v >= 0) & (v <= maxs)
    esc = np.asarray(keep, bool) & ~in_sup
    v_coded = np.where(in_sup, v, maxs + 1).astype(np.int32)
    return v_coded, esc


def encode_stages(stages, tables: CoderTables, lanes: int = DEFAULT_LANES):
    """stages: list of (symbols int32[n], indexes int32[n], keep bool[n]).

    Returns (words, esc_start): the full stream as uint16 words
    [2*lanes state words][payload][escape segment], and the word index
    where the escape segment begins (= 2*lanes + n_payload).
    """
    states = np.full(lanes, RANS_L, dtype=np.uint64)
    cdf = tables.cdf
    payload_rev: list[np.ndarray] = []  # chunks in reverse global order
    esc_words: list[np.ndarray] = []  # in forward (decode) order

    for symbols, indexes, keep in stages:
        # escape raw values, in decode order (position-major, lane-minor)
        _, esc = split_escapes(symbols, indexes, keep, tables)
        if esc.any():
            raw = np.asarray(symbols, np.int64)[esc].astype(np.uint32)
            pair = np.empty(2 * raw.size, np.uint16)
            pair[0::2] = (raw & _MASK16).astype(np.uint16)
            pair[1::2] = (raw >> 16).astype(np.uint16)
            esc_words.append(pair)
        else:
            esc_words.append(np.zeros(0, np.uint16))

    for symbols, indexes, keep in reversed(stages):
        n = len(symbols)
        p = _stage_grid(n, lanes)
        pad = p * lanes - n
        v, _ = split_escapes(symbols, indexes, keep, tables)
        idx = np.asarray(indexes, dtype=np.int64)
        kp = np.asarray(keep, dtype=bool)
        if pad:
            v = np.concatenate([v, np.zeros(pad, np.int32)])
            idx = np.concatenate([idx, np.zeros(pad, np.int64)])
            kp = np.concatenate([kp, np.zeros(pad, bool)])
        v = v.reshape(p, lanes)
        idx = idx.reshape(p, lanes)
        kp = kp.reshape(p, lanes)

        for step in range(p - 1, -1, -1):
            vi, ii, ki = v[step], idx[step], kp[step]
            start = cdf[ii, vi].astype(np.uint64)
            freq = (cdf[ii, vi + 1] - cdf[ii, vi]).astype(np.uint64)
            freq = np.where(ki, freq, 1)  # avoid div-by-zero on skipped lanes
            flag = ki & (states >= (freq << 16))
            words = (states & _MASK16).astype(np.uint16)
            states = np.where(flag, states >> 16, states)
            q, r = np.divmod(states, freq)
            new_states = (q << 16) + r + start
            states = np.where(ki, new_states, states)
            if flag.any():
                # decoder reads this step's words in ascending lane order
                payload_rev.append(words[flag])

    payload = (
        np.concatenate(payload_rev[::-1]) if payload_rev else np.zeros(0, np.uint16)
    )
    head = np.zeros(2 * lanes, dtype=np.uint16)
    head[0::2] = (states & _MASK16).astype(np.uint16)
    head[1::2] = ((states >> 16) & _MASK16).astype(np.uint16)
    esc_start = 2 * lanes + len(payload)
    return np.concatenate([head, payload] + esc_words), esc_start


class StreamDecoder:
    """Stage-by-stage decoder carrying (states, word offset, escape ptr)."""

    def __init__(self, stream: np.ndarray, tables: CoderTables,
                 lanes: int = DEFAULT_LANES, esc_start: int | None = None):
        self.words = np.asarray(stream, dtype=np.uint16)
        self.tables = tables
        self.lanes = lanes
        head = self.words[: 2 * lanes].astype(np.uint64)
        self.states = head[0::2] | (head[1::2] << 16)
        self.offset = 2 * lanes
        self.esc_ptr = len(self.words) if esc_start is None else int(esc_start)
        self.esc_start = self.esc_ptr
        self.inv = tables.inverse()

    def decode_stage(self, indexes: np.ndarray, keep: np.ndarray) -> np.ndarray:
        n = len(indexes)
        lanes = self.lanes
        p = _stage_grid(n, lanes)
        pad = p * lanes - n
        idx = np.asarray(indexes, dtype=np.int64)
        kp = np.asarray(keep, dtype=bool)
        if pad:
            idx = np.concatenate([idx, np.zeros(pad, np.int64)])
            kp = np.concatenate([kp, np.zeros(pad, bool)])
        idx = idx.reshape(p, lanes)
        kp = kp.reshape(p, lanes)
        out = np.zeros((p, lanes), dtype=np.int32)
        cdf = self.tables.cdf
        for step in range(p):
            ii, ki = idx[step], kp[step]
            cum = (self.states & _MASK16).astype(np.int64)
            sym = self.inv[ii, cum]
            start = cdf[ii, sym].astype(np.uint64)
            freq = (cdf[ii, sym + 1] - cdf[ii, sym]).astype(np.uint64)
            adv = freq * (self.states >> 16) + cum.astype(np.uint64) - start
            flag = ki & (adv < RANS_L)
            nread = int(flag.sum())
            if nread:
                pos = self.offset + np.cumsum(flag) - 1
                safe = np.where(flag, pos, 0).clip(0, len(self.words) - 1)
                w = self.words[safe].astype(np.uint64)
                adv = np.where(flag, (adv << 16) | w, adv)
                self.offset += nread
            self.states = np.where(ki, adv, self.states)
            out[step] = np.where(ki, sym + self.tables.offset[ii], 0)
        vals = out.reshape(-1)[:n]
        # escape substitution: a decoded sentinel value means "exact raw
        # int32 follows in the escape segment" (same order as decode)
        idx_f = np.asarray(indexes, np.int64)
        kp_f = np.asarray(keep, bool)
        sentinel = self.tables.offset[idx_f] + self.tables.max_symbol[idx_f] + 1
        esc = kp_f & (vals == sentinel)
        n_esc = int(esc.sum())
        if n_esc:
            j = self.esc_ptr + 2 * (np.cumsum(esc) - 1)
            lo = self.words[np.where(esc, j, 0)].astype(np.uint32)
            hi = self.words[np.where(esc, j + 1, 0)].astype(np.uint32)
            raw = (lo | (hi << 16)).astype(np.int32)
            vals = np.where(esc, raw, vals)
            self.esc_ptr += 2 * n_esc
        return vals

    @property
    def stream_ok(self) -> bool:
        """All lane states returned to L, the payload consumed exactly to
        the escape boundary, and the escape segment fully consumed."""
        return bool(
            (self.states == RANS_L).all()
            and self.offset == self.esc_start
            and self.esc_ptr == len(self.words)
        )


def decode_stages(stream, tables, stage_meta, lanes: int = DEFAULT_LANES,
                  esc_start: int | None = None):
    """stage_meta: list of (indexes, keep) — convenience full decode."""
    dec = StreamDecoder(stream, tables, lanes, esc_start)
    outs = [dec.decode_stage(ix, kp) for ix, kp in stage_meta]
    return outs, dec.stream_ok


# ---------------------------------------------------------------------------
# Grouped (shardable) format: G independent PCT1 sub-streams
# ---------------------------------------------------------------------------
#
# PCT1-G partitions the K lanes into G equal groups; group g independently
# codes the symbols whose global lane (i mod K) falls in its block, as a
# standalone PCT1 stream with K/G lanes.  The format is TOPOLOGY-
# INDEPENDENT: one chip or an n-device mesh produce byte-identical
# sub-streams, and a mesh runs the G scans concurrently (one per device) —
# sharding the coder phase (SURVEY.md §7.7).


def _group_slice(arr, lanes: int, groups: int, g: int):
    """Symbols of one stage that belong to lane-group g, in the group's
    own (position, local-lane) order."""
    kt = lanes // groups
    n = len(arr)
    p = _stage_grid(n, lanes)
    pad = p * lanes - n
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, arr.dtype)])
    return arr.reshape(p, lanes)[:, g * kt : (g + 1) * kt].reshape(-1)


def encode_stages_grouped(stages, tables: CoderTables, lanes: int = DEFAULT_LANES,
                          groups: int = 1):
    """Returns (list of (words, esc_start) per group).  groups must divide
    lanes; group g is the PCT1 encoding (with lanes/groups lanes) of its
    lane-block symbols."""
    assert lanes % groups == 0
    out = []
    for g in range(groups):
        sub = [
            (
                _group_slice(np.asarray(s, np.int32), lanes, groups, g),
                _group_slice(np.asarray(i, np.int64), lanes, groups, g),
                _group_slice(np.asarray(k, bool), lanes, groups, g),
            )
            for s, i, k in stages
        ]
        out.append(encode_stages(sub, tables, lanes // groups))
    return out


def decode_stages_grouped(streams, tables, stage_meta, lanes: int = DEFAULT_LANES,
                          groups: int = 1):
    """streams: list of (words, esc_start) per group.  Reassembles each
    stage's values into the global symbol order.  Returns (outs, ok)."""
    assert lanes % groups == 0 and len(streams) == groups
    kt = lanes // groups
    decs = [
        StreamDecoder(words, tables, kt, esc_start)
        for words, esc_start in streams
    ]
    outs = []
    for indexes, keep in stage_meta:
        n = len(indexes)
        p = _stage_grid(n, lanes)
        grid = np.zeros((p, lanes), np.int32)
        for g in range(groups):
            vals = decs[g].decode_stage(
                _group_slice(np.asarray(indexes, np.int64), lanes, groups, g),
                _group_slice(np.asarray(keep, bool), lanes, groups, g),
            )
            grid[:, g * kt : (g + 1) * kt] = vals.reshape(p, kt)
        outs.append(grid.reshape(-1)[:n])
    return outs, all(d.stream_ok for d in decs)
