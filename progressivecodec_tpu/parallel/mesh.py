"""Device mesh + sharding rules.

The reference has no distributed machinery at all (SURVEY.md §2.9 — a
single-process nn.DataParallel wrapper, train.py:114-121).  Here the
scaling design is jax.sharding-native:

  mesh axes: ("data", "model")
    * data  — batch (data parallel); gradient psum inserted by XLA
    * model — tensor parallel over wide channel dims of the parameter-
      prediction stacks and hyper transforms (their output channels are
      independent per-slice, SURVEY.md §2.9 TP row)

Spatial tiling with halo exchange for large images lives in
parallel/tiling.py.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def shard_params_rule(mesh: Mesh, min_dim: int = 64):
    """Param pytree -> NamedSharding tree: kernels whose output-channel dim
    divides the model axis get sharded over it; everything else replicated.

    Conv kernels are HWIO — shard O (last). 1D biases likewise when wide
    enough.  This is real tensor parallelism for the ConvStack5 banks and
    hyper transforms; XLA inserts the all-reduces on the following layer.
    """
    m = mesh.shape["model"]

    def rule(x):
        if m > 1 and hasattr(x, "ndim") and x.ndim >= 1:
            last = x.shape[-1]
            if last >= min_dim and last % m == 0:
                spec = [None] * (x.ndim - 1) + ["model"]
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return rule


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
