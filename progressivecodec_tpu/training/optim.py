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


def set_lr_scale(opt_state, scale: float):
    """Write the plateau `scale` into a make_optimizer_scheduled state.

    The scale lives in the inject_hyperparams state of the 'main' branch;
    this walks the opt_state pytree and replaces every hyperparams['scale']
    leaf (there is exactly one).  Pure host-side surgery — the jitted train
    step picks the new value up on its next call because the pytree
    structure is unchanged.
    """
    import jax.numpy as jnp

    found = 0

    def visit(node):
        nonlocal found
        if hasattr(node, "hyperparams") and isinstance(getattr(node, "hyperparams"), dict):
            hp = dict(node.hyperparams)
            if "scale" in hp:
                found += 1
                hp["scale"] = jnp.asarray(scale, dtype=jnp.asarray(hp["scale"]).dtype)
                return node._replace(hyperparams=hp)
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
            return type(node)(*[visit(v) for v in node])
        if isinstance(node, tuple):
            return tuple(visit(v) for v in node)
        if isinstance(node, list):
            return [visit(v) for v in node]
        if isinstance(node, dict):
            return {k: visit(v) for k, v in node.items()}
        return node

    new_state = visit(opt_state)
    if found == 0:
        raise ValueError("no hyperparams['scale'] found — was the optimizer built by make_optimizer_scheduled?")
    return new_state
