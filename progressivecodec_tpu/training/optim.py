"""Optimizers: main Adam + separate aux Adam on bottleneck quantiles,
plateau LR schedule.

Behavioral spec: /root/reference/src/train.py:124-155 (parameter split),
step.py:64-73 (dual step + clip 1.0), train.py:276 (ReduceLROnPlateau
factor 0.3 patience 8).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


def _param_labels(params) -> Any:
    """Label pytree: 'aux' for the bottleneck quantile params, 'main' else."""

    def label(path, _):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return "aux" if "quantiles" in names else "main"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    lr: float = 1e-4, aux_lr: float = 1e-3, clip_max_norm: float = 1.0
) -> optax.GradientTransformation:
    """Main: clip(global 1.0) -> Adam(lr); aux (quantiles): Adam(aux_lr)."""
    main = optax.chain(optax.clip_by_global_norm(clip_max_norm), optax.adam(lr))
    aux = optax.adam(aux_lr)
    return optax.multi_transform(
        {"main": main, "aux": aux}, param_labels=_param_labels
    )


class PlateauState(NamedTuple):
    """Host-side ReduceLROnPlateau: scale *= factor after `patience`
    non-improving epochs.  The scale multiplies the base lr via
    optax.scale_by_learning_rate injection at step time."""

    best: float
    bad_epochs: int
    scale: float


def plateau_init() -> PlateauState:
    return PlateauState(best=float("inf"), bad_epochs=0, scale=1.0)


def plateau_update(
    state: PlateauState, metric: float, factor: float = 0.3, patience: int = 8
) -> PlateauState:
    if metric < state.best - 1e-8:
        return PlateauState(best=metric, bad_epochs=0, scale=state.scale)
    bad = state.bad_epochs + 1
    if bad > patience:
        return PlateauState(best=state.best, bad_epochs=0, scale=state.scale * factor)
    return PlateauState(best=state.best, bad_epochs=bad, scale=state.scale)


def make_optimizer_scheduled(
    lr: float = 1e-4, aux_lr: float = 1e-3, clip_max_norm: float = 1.0
):
    """Variant whose lr is multiplied by a runtime `scale` passed through
    optax.inject_hyperparams — lets the host-side plateau scheduler adjust
    lr without rebuilding optimizer state."""

    @optax.inject_hyperparams
    def main(scale):
        return optax.chain(
            optax.clip_by_global_norm(clip_max_norm),
            optax.adam(lr),
            optax.scale(scale),
        )

    aux = optax.adam(aux_lr)
    return optax.multi_transform({"main": main(scale=1.0), "aux": aux}, param_labels=_param_labels)
