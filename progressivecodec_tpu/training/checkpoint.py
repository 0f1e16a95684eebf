"""Orbax checkpointing: params + opt state + config JSON.

Behavioral spec (what to persist): /root/reference/src/train.py:162-171,
408-429 — {epoch, weights, optimizer, scheduler state, config}.  Unlike
the reference, entropy-model CDF tables are NEVER stored (SURVEY.md §5):
they are deterministic functions of the params and are rebuilt by
Codec.update() after load, which removes the dynamic-buffer-resize
machinery (models/utils.py:146-183) entirely.
"""

from __future__ import annotations

import json
import os
import jax
import numpy as np
import orbax.checkpoint as ocp

from progressivecodec_tpu import config as config_lib


def save_checkpoint(path: str, state, model_cfg, train_cfg, extra: dict | None = None):
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    meta = {
        "model": json.loads(config_lib.to_json(model_cfg)),
        "train": json.loads(config_lib.to_json(train_cfg)),
        "extra": extra or {},
    }
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_checkpoint(path: str, state_template):
    """Restore into the shape of `state_template` (from init_train_state)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state_template.params,
        "opt_state": state_template.opt_state,
        "step": state_template.step,
    }
    restored = ckptr.restore(path, payload)
    with open(os.path.join(path, "config.json")) as f:
        meta = json.load(f)
    state = type(state_template)(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return state, meta


def save_params_npz(path: str, params):
    """Flat .npz export — a dependency-free interchange format."""
    flat = {}

    def visit(prefix, tree):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                visit(key, v)
            else:
                flat[key] = np.asarray(v)

    visit("", jax.tree.map(lambda x: x, params))
    np.savez(path, **flat)


def load_params_npz(path: str):
    flat = np.load(path)
    tree: dict = {}
    for key in flat.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = flat[key]
    return tree
