"""ctypes binding to the native PCT1 coder (coder/native/rans.cpp).

Compiled lazily with g++ on first use (no pybind11 in this environment);
falls back to coder/rans_numpy.py if no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from progressivecodec_tpu.coder.tables import CoderTables, DEFAULT_LANES

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librans_pct1.so")
_LOCK = threading.Lock()
_LIB = None


def _build() -> str:
    src = os.path.join(_NATIVE_DIR, "rans.cpp")
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", src, "-o", _SO_PATH]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO_PATH


def get_lib():
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        if not os.path.exists(_SO_PATH) or os.path.getmtime(_SO_PATH) < os.path.getmtime(
            os.path.join(_NATIVE_DIR, "rans.cpp")
        ):
            _build()
        lib = ctypes.CDLL(_SO_PATH)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        lib.pct1_encode.restype = ctypes.c_int64
        lib.pct1_encode.argtypes = [
            i32p, i32p, u8p, i64p, ctypes.c_int32,
            i32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p,
            ctypes.c_int32, u16p, ctypes.c_int64, i64p,
        ]
        lib.pct1_decode.restype = ctypes.c_int32
        lib.pct1_decode.argtypes = [
            u16p, ctypes.c_int64, ctypes.c_int64, i32p, u8p, i64p,
            ctypes.c_int32, i32p, ctypes.c_int32, ctypes.c_int32, i32p, i32p,
            ctypes.c_int32, i32p,
        ]
        _LIB = lib
        return lib


def _as_i32(x):
    return np.ascontiguousarray(x, dtype=np.int32)


def encode_stages(stages, tables: CoderTables, lanes: int = DEFAULT_LANES):
    """Native encode — same (words, esc_start) result as
    rans_numpy.encode_stages."""
    lib = get_lib()
    symbols = np.concatenate([_as_i32(s) for s, _, _ in stages])
    indexes = np.concatenate([_as_i32(i) for _, i, _ in stages])
    keep = np.concatenate([np.ascontiguousarray(k, dtype=np.uint8) for _, _, k in stages])
    sizes = np.asarray([len(s) for s, _, _ in stages], dtype=np.int64)
    cdf = _as_i32(tables.cdf)
    # <=1 payload word/symbol + <=2 escape words/symbol + slack
    cap = 2 * lanes + 3 * len(symbols) + lanes
    out = np.empty(cap, dtype=np.uint16)
    esc_start = ctypes.c_int64(0)
    n = lib.pct1_encode(
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(stages),
        cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cdf.shape[0],
        cdf.shape[1],
        _as_i32(tables.cdf_length).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _as_i32(tables.offset).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lanes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        cap,
        ctypes.byref(esc_start),
    )
    if n < 0:
        raise RuntimeError("pct1_encode: output capacity too small")
    return out[:n].copy(), int(esc_start.value)


def decode_stages(stream, tables: CoderTables, stage_meta,
                  lanes: int = DEFAULT_LANES, esc_start: int | None = None):
    """Native decode — same result as rans_numpy.decode_stages."""
    lib = get_lib()
    stream = np.ascontiguousarray(stream, dtype=np.uint16)
    indexes = np.concatenate([_as_i32(i) for i, _ in stage_meta])
    keep = np.concatenate([np.ascontiguousarray(k, dtype=np.uint8) for _, k in stage_meta])
    sizes = np.asarray([len(i) for i, _ in stage_meta], dtype=np.int64)
    cdf = _as_i32(tables.cdf)
    out = np.empty(len(indexes), dtype=np.int32)
    ok = lib.pct1_decode(
        stream.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        len(stream),
        -1 if esc_start is None else int(esc_start),
        indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(stage_meta),
        cdf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cdf.shape[0],
        cdf.shape[1],
        _as_i32(tables.cdf_length).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        _as_i32(tables.offset).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lanes,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if ok < 0:
        raise RuntimeError("pct1_decode: stream underrun")
    outs = []
    off = 0
    for i, _ in stage_meta:
        outs.append(out[off : off + len(i)].copy())
        off += len(i)
    return outs, bool(ok)
