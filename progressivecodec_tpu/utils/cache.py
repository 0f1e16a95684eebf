"""Persistent XLA compilation cache.

The big codec graphs (20 unrolled ChARM slices + coder scans) compile
slowly through remote-compile TPU services; the persistent cache makes
that a one-time cost per (shape, quality) specialization.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.environ.get(
    "PCT_COMPILE_CACHE", os.path.expanduser("~/.cache/pct_jax_cache")
)

_enabled = False


def enable_compilation_cache(path: str | None = None) -> str:
    global _enabled
    path = path or DEFAULT_DIR
    if not _enabled:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
    return path
