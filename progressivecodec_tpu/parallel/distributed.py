"""Multi-host initialization + cross-host eval reductions.

The reference is single-process (SURVEY.md §2.9).  Pod runs here start
with jax.distributed.initialize (coordinator from env), shard data by
process (data/datasets.py host striping), and reduce eval metrics with a
psum over a trivial mesh.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def initialize_from_env() -> tuple[int, int]:
    """Initialize jax.distributed from standard env vars if present.

    Uses COORDINATOR_ADDRESS / PROCESS_COUNT / PROCESS_ID when set (no-op
    single-process otherwise).  Returns (process_index, process_count).
    """
    addr = os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        # must run before ANYTHING initializes the XLA backend — even
        # jax.process_count() counts as backend-touching, so the guard is
        # purely env-var based
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(os.environ["PROCESS_COUNT"]),
            process_id=int(os.environ["PROCESS_ID"]),
        )
    return jax.process_index(), jax.process_count()


def allreduce_metrics(metrics: dict) -> dict:
    """Mean-reduce scalar metrics across processes (single-process no-op)."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental.multihost_utils import process_allgather

    out = {}
    for k, v in metrics.items():
        gathered = process_allgather(jnp.asarray(v))
        out[k] = np.mean(np.asarray(gathered), axis=0)
    return out
