"""REM doing its job: measured RD improvement between checkpoints.

VERDICT r3 next #6: the LRR banks had forward/codec tests but no
training evidence.  This demo (reference rationale: CHProgREM.py:205-234
— refine (mu, sigma) of enhancement slices *between* discrete
checkpoint qualities, base net frozen):

  1. trains a tiny progressive base on synthetic data,
  2. transplants it into the REM ("rate") model, freezes everything but
     the post_latent banks (training/freeze.rem_freeze_fn),
  3. trains the banks at intermediate qualities,
  4. reports entropy-estimate RD at the interval midpoints for
     base-alone vs REM-after-training.

Runs on CPU with a TINY config (~minutes).  Writes runs/rem_demo.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__" and os.environ.get("JAX_PLATFORMS", "") == "":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import optax

from progressivecodec_tpu.config import ModelConfig, ScaleTableConfig, TrainConfig
from progressivecodec_tpu.data.datasets import NaturalSyntheticDataset, PatchLoader
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.models.rem import PostRateProcessedNetwork
from progressivecodec_tpu.models.codec_granular import GranularCodec
from progressivecodec_tpu.training.step import init_train_state, make_train_step
from progressivecodec_tpu.training.optim import make_optimizer
from progressivecodec_tpu.training.freeze import masked_optimizer, rem_freeze_fn
from progressivecodec_tpu.training.evaluate import entropy_estimate_eval

BASE_STEPS = int(os.environ.get("REM_DEMO_BASE_STEPS", 300))
BANK_STEPS = int(os.environ.get("REM_DEMO_BANK_STEPS", 200))
# interval midpoints of check_levels (0.01, 0.25, 1.75): the qualities
# where the banks act (find_check_quality maps them into each interval)
MID_QS = (0.1, 1.0, 5.0)

# stack_prog=False: the REM variant indexes slices individually
# (rem.py:_use_stacked_prog), so the base must be trained with the same
# unrolled per-slice module layout for the transplant to line up
TINY = dict(
    N=32, M=64, dim_chunk=8, division_dimension=(32, 64),
    scale_table=ScaleTableConfig(levels=32), check_levels=(0.01, 0.25, 1.75),
    stack_prog=False,
)


def train(model, state, step_fn, loader, n_steps, seed):
    rng = jax.random.PRNGKey(seed)
    losses = []
    it = 0
    epoch = 0
    while it < n_steps:
        for batch in loader.epoch(epoch):
            if it >= n_steps:
                break
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, jnp.asarray(batch), sub)
            losses.append(float(metrics["loss_total"]))
            it += 1
        epoch += 1
    return state, losses


def main():
    t_start = time.time()
    tcfg = TrainConfig(batch_size=8, patch_size=64)
    ds = NaturalSyntheticDataset(n=256, size=96)
    loader = PatchLoader(ds, tcfg.batch_size, tcfg.patch_size, seed=0, workers=2)
    valid = [NaturalSyntheticDataset(n=2, size=128, seed=1)[i] for i in range(2)]

    # --- 1. train the tiny progressive base
    base_cfg = ModelConfig(name="channel", **TINY)
    base_model = ChannelProgressiveWACNN(cfg=base_cfg)
    state, tx = init_train_state(
        base_model, jax.random.PRNGKey(0), tcfg, sample_shape=(1, 64, 64, 3)
    )
    step_fn = jax.jit(make_train_step(base_model, tx, quality=(0, 10)))
    state, base_losses = train(base_model, state, step_fn, loader, BASE_STEPS, 10)
    print(f"base trained {BASE_STEPS} steps: loss {base_losses[0]:.1f} -> "
          f"{np.mean(base_losses[-20:]):.1f}", flush=True)

    base_codec = GranularCodec(base_model, {"params": state.params}, lanes=64)
    # same lmbda weighting as the REM evals so the losses are comparable
    EVAL_LMBDAS = (0.0055, 0.02, 0.075)
    base_eval = entropy_estimate_eval(
        base_codec, valid, pr_list=MID_QS, lmbda_list=EVAL_LMBDAS
    )
    print("base RD:", json.dumps(base_eval), flush=True)

    # --- 2. transplant into the REM model; freeze all but the banks
    # one lambda per training quality level (the scalable RD loss pairs
    # lmbda_list with the quality ladder elementwise, loss.py:114-134)
    # forward prepends the base (q=0) level when absent
    # (progressive.py:355-356), so the ladder is 4 levels -> 4 lambdas
    rem_cfg = ModelConfig(
        name="rate", lmbda_list=(0.0055, 0.0075, 0.02, 0.075), **TINY
    )
    rem_model = PostRateProcessedNetwork(cfg=rem_cfg)
    rem_vars = rem_model.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3)),
        PostRateProcessedNetwork.init_qualities(rem_cfg), training=False,
    )
    merged = dict(rem_vars["params"])
    for k, v in state.params.items():
        merged[k] = v  # shared module names: the trained base
    rem_params = type(rem_vars["params"])(merged) if not isinstance(merged, dict) else merged

    bank_tx = masked_optimizer(
        make_optimizer(lr=1e-4), rem_params, rem_freeze_fn()
    )
    opt_state = bank_tx.init(rem_params)
    from progressivecodec_tpu.training.step import TrainState

    rem_state = TrainState(rem_params, opt_state, jnp.int32(0))
    rem_before = entropy_estimate_eval(
        GranularCodec(rem_model, {"params": rem_params}, lanes=64),
        valid, pr_list=MID_QS, lmbda_list=EVAL_LMBDAS,
    )
    print("REM before bank training:", json.dumps(rem_before), flush=True)

    # --- 3. train the banks at the interval midpoints
    rem_step = jax.jit(make_train_step(rem_model, bank_tx, quality=MID_QS))
    rem_state, bank_losses = train(rem_model, rem_state, rem_step, loader,
                                   BANK_STEPS, 20)
    print(f"banks trained {BANK_STEPS} steps: loss {bank_losses[0]:.1f} -> "
          f"{np.mean(bank_losses[-20:]):.1f}", flush=True)

    rem_after = entropy_estimate_eval(
        GranularCodec(rem_model, {"params": rem_state.params}, lanes=64),
        valid, pr_list=MID_QS, lmbda_list=EVAL_LMBDAS,
    )
    print("REM after bank training:", json.dumps(rem_after), flush=True)

    out = {
        "protocol": {
            "base_steps": BASE_STEPS, "bank_steps": BANK_STEPS,
            "mid_qualities": MID_QS, "config": "TINY N=32 M=64",
            "frozen": "everything except post_latent banks (rem_freeze_fn)",
        },
        "base": base_eval,
        "rem_before_bank_training": rem_before,
        "rem_after_bank_training": rem_after,
        "loss_improvement_vs_base": base_eval["loss"] - rem_after["loss"],
        "wall_s": round(time.time() - t_start, 1),
    }
    os.makedirs("runs", exist_ok=True)
    with open("runs/rem_demo.json", "w") as f:
        f.write(json.dumps(out, indent=2))
    print("wrote runs/rem_demo.json; loss improvement vs base:",
          out["loss_improvement_vs_base"], flush=True)


if __name__ == "__main__":
    main()
