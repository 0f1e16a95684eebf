"""Sharded train/eval steps over a (data, model) mesh.

Data-parallel gradients and tensor-parallel matmuls fall out of
jax.sharding annotations + XLA propagation (psum / all-gather over ICI),
replacing any notion of NCCL/MPI process groups (none exist in the
reference, SURVEY.md §2.9).
"""

from __future__ import annotations

import jax

from progressivecodec_tpu.parallel.mesh import (
    batch_sharding,
    replicated,
    shard_params_rule,
)


def shard_train_state(state, mesh):
    """Place params/opt_state per the model-parallel rule."""
    rule = shard_params_rule(mesh)
    pshard = jax.tree.map(rule, state.params)
    params = jax.device_put(state.params, pshard)
    # opt_state mirrors params structure where it holds per-param moments
    def opt_put(x):
        if hasattr(x, "shape") and x.ndim >= 1:
            return jax.device_put(x, rule(x))
        return jax.device_put(x, replicated(mesh))

    opt_state = jax.tree.map(opt_put, state.opt_state)
    step = jax.device_put(state.step, replicated(mesh))
    return type(state)(params, opt_state, step)


def make_sharded_train_step(model, tx, mesh, quality=(0, 10), mask_pol=None):
    """jit the functional train step with explicit input shardings:
    batch over "data", params per the tensor-parallel rule."""
    from progressivecodec_tpu.training.step import make_train_step

    step = make_train_step(model, tx, quality, mask_pol)
    bshard = batch_sharding(mesh)
    rep = replicated(mesh)

    jitted = jax.jit(
        step,
        in_shardings=(None, bshard, rep),
        donate_argnums=(0,),
    )

    def run(state, batch, rng):
        return jitted(state, batch, rng)

    return run
