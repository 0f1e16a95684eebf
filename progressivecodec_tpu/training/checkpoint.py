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
import shutil
import os
import jax
import numpy as np
import orbax.checkpoint as ocp

from progressivecodec_tpu import config as config_lib


def save_checkpoint(path: str, state, model_cfg, train_cfg, extra: dict | None = None):
    """ATOMIC w.r.t. process kill: orbax `force=True` deletes the existing
    path BEFORE writing, so a kill mid-save would leave no checkpoint at
    all (this destroyed a run's resume state in round 5 — the babysitter
    then restarted from scratch).  Write to a sibling tmp dir, fsync-free
    rename-swap, and only then drop the old copy."""
    path = os.path.abspath(path)
    tmp = path + ".saving"
    old = path + ".old"
    for stale in (tmp, old):
        if os.path.isdir(stale):
            shutil.rmtree(stale)
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    ckptr.save(tmp, payload, force=True)
    ckptr.wait_until_finished()
    meta = {
        "model": json.loads(config_lib.to_json(model_cfg)),
        "train": json.loads(config_lib.to_json(train_cfg)),
        "extra": extra or {},
    }
    with open(os.path.join(tmp, "config.json"), "w") as f:
        json.dump(meta, f, indent=2)
    # swap: a kill at any point leaves either the old or the new complete
    # checkpoint at `path` or `path`.old — load_checkpoint prefers `path`
    # and falls back to `path`.old
    if os.path.isdir(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.isdir(old):
        shutil.rmtree(old)


def load_checkpoint(path: str, state_template):
    """Restore into the shape of `state_template` (from init_train_state).

    Falls back to `path`.old if `path` is missing — the only state a kill
    inside save_checkpoint's rename-swap can leave behind."""
    path = os.path.abspath(path)
    if not os.path.isdir(path) and os.path.isdir(path + ".old"):
        path = path + ".old"
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
