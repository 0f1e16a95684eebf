"""Golden host implementation of the PCT1 interleaved rANS format.

Vectorized numpy, bit-for-bit identical to the device coder — used as the
test oracle and the slow-but-sure host fallback.  See tables.py for the
format spec.
"""

from __future__ import annotations

import numpy as np

from progressivecodec_tpu.coder.tables import CoderTables, PRECISION, RANS_L, DEFAULT_LANES

_MASK16 = (1 << 16) - 1


def _stage_grid(n: int, lanes: int):
    """Positions P for n symbols across `lanes` lanes."""
    return (n + lanes - 1) // lanes


def clamp_symbols(symbols: np.ndarray, indexes: np.ndarray, tables: CoderTables):
    """Symbol values -> clamped in-range coded indices v in [0, max_symbol]."""
    v = symbols.astype(np.int64) - tables.offset[indexes]
    return np.clip(v, 0, tables.max_symbol[indexes]).astype(np.int32)


def encode_stages(stages, tables: CoderTables, lanes: int = DEFAULT_LANES) -> np.ndarray:
    """stages: list of (symbols int32[n], indexes int32[n], keep bool[n]).

    Returns the full stream as uint16 words:
    [2*lanes state words][payload words].
    """
    states = np.full(lanes, RANS_L, dtype=np.uint64)
    cdf = tables.cdf
    payload_rev: list[np.ndarray] = []  # chunks in reverse global order

    for symbols, indexes, keep in reversed(stages):
        n = len(symbols)
        p = _stage_grid(n, lanes)
        pad = p * lanes - n
        v = clamp_symbols(symbols, indexes, tables)
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
    return np.concatenate([head, payload])


class StreamDecoder:
    """Stage-by-stage decoder carrying (states, word offset)."""

    def __init__(self, stream: np.ndarray, tables: CoderTables, lanes: int = DEFAULT_LANES):
        self.words = np.asarray(stream, dtype=np.uint16)
        self.tables = tables
        self.lanes = lanes
        head = self.words[: 2 * lanes].astype(np.uint64)
        self.states = head[0::2] | (head[1::2] << 16)
        self.offset = 2 * lanes
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
        return out.reshape(-1)[:n]

    @property
    def stream_ok(self) -> bool:
        """All lane states returned to L -> the stream was fully consistent."""
        return bool((self.states == RANS_L).all())


def decode_stages(stream, tables, stage_meta, lanes: int = DEFAULT_LANES):
    """stage_meta: list of (indexes, keep) — convenience full decode."""
    dec = StreamDecoder(stream, tables, lanes)
    outs = [dec.decode_stage(ix, kp) for ix, kp in stage_meta]
    return outs, dec.stream_ok
