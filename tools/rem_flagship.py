"""REM at flagship scale (VERDICT r4 next #7).

Loads the trained flagship checkpoint (stack_prog layout), transplants it
into the REM model (`PostRateProcessedNetwork`, unrolled per-slice banks
— rem.py:_use_stacked_prog), freezes everything except the post_latent
banks (rem_freeze_fn; reference: CHProgREM.py:299-304 trains only the
banks), trains the banks at the checkpoint-interval midpoints on the same
natural-statistics data as the flagship run, and reports REAL-codec RD at
those midpoints for frozen-base vs REM-after-training on synthetic Kodak.

The banks start as an EXACT identity (zero_out init, rem.py:71-78), so
"before" == frozen base bit-for-bit and any measured delta is pure bank
effect.  Reference purpose: CHProgREM.py:205-234.

Usage:
  python tools/rem_flagship.py --checkpoint runs/flagship_r5/ckpt_best \
      [--bank-steps 1500] [--out runs/rem_flagship.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu.utils.cache import enable_compilation_cache
from progressivecodec_tpu import config as config_lib
from progressivecodec_tpu.config import TrainConfig
from progressivecodec_tpu.data.datasets import (
    NaturalSyntheticDataset, PatchLoader, SyntheticKodak,
)
from progressivecodec_tpu.models.progressive import ChannelProgressiveWACNN
from progressivecodec_tpu.models.rem import PostRateProcessedNetwork
from progressivecodec_tpu.models.codec_granular import GranularCodec
from progressivecodec_tpu.models.torch_import import unstack_prog_params
from progressivecodec_tpu.training.checkpoint import load_checkpoint
from progressivecodec_tpu.training.step import (
    TrainState, init_train_state, make_train_step,
)
from progressivecodec_tpu.training.optim import make_optimizer
from progressivecodec_tpu.training.freeze import masked_optimizer, rem_freeze_fn
from progressivecodec_tpu.training.evaluate import evaluate_codec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", type=str, default="runs/flagship_r5/ckpt_best")
    ap.add_argument("--bank-steps", type=int, default=1500)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--patch-size", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--n-images", type=int, default=8, help="eval image count")
    ap.add_argument("--out", type=str, default="runs/rem_flagship.json")
    ap.add_argument("--cpu", action="store_true", help="force CPU (smoke tests)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    enable_compilation_cache()
    t_start = time.time()

    with open(os.path.join(args.checkpoint, "config.json")) as f:
        meta = json.load(f)
    base_cfg = config_lib.model_config_from_json(json.dumps(meta["model"]))
    tcfg = TrainConfig(batch_size=args.batch_size, patch_size=args.patch_size,
                       lr=args.lr)

    # --- 1. load the trained flagship (stacked prog-bank layout)
    base_model = ChannelProgressiveWACNN(cfg=base_cfg)
    state, _ = init_train_state(
        base_model, jax.random.PRNGKey(0), tcfg,
        sample_shape=(1, args.patch_size, args.patch_size, 3),
    )
    state, _meta = load_checkpoint(args.checkpoint, state)
    base_params = jax.device_get(state.params)
    del state
    print(f"loaded flagship from {args.checkpoint}", flush=True)

    # --- 2. transplant into REM (unrolled banks + post_latent)
    rem_cfg = dataclasses.replace(base_cfg, name="rate", stack_prog=False)
    # the scalable RD loss pairs lmbda_list elementwise with the quality
    # ladder (loss.py:114-134); ladder = [0] + interval midpoints (4 pts):
    # log-interpolate the flagship's (low, high) lambda across it
    lo, hi = float(base_cfg.lmbda_list[0]), float(base_cfg.lmbda_list[-1])
    lmb = [float(np.exp(np.log(lo) + (np.log(hi) - np.log(lo)) * t))
           for t in (0.0, 1.0 / 3, 2.0 / 3, 1.0)]
    rem_cfg = dataclasses.replace(rem_cfg, lmbda_list=tuple(lmb))
    rem_model = PostRateProcessedNetwork(cfg=rem_cfg)
    mid_qs = tuple(PostRateProcessedNetwork.init_qualities(rem_cfg)[1:])
    print(f"interval midpoints: {mid_qs}, lmbdas: {lmb}", flush=True)

    rem_vars = jax.jit(
        lambda r, x: rem_model.init(
            {"params": r}, x, PostRateProcessedNetwork.init_qualities(rem_cfg),
            training=False,
        )
    )(jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 3)))
    rem_params = dict(jax.device_get(rem_vars["params"]))
    del rem_vars

    unstacked = unstack_prog_params(base_params)
    for k, v in unstacked.items():
        assert k in rem_params or k.startswith("post_latent"), k
        rem_params[k] = v
    n_bank = sum(
        int(np.prod(np.shape(leaf)))
        for k, sub in rem_params.items() if k.startswith("post_latent")
        for leaf in jax.tree.leaves(sub)
    )
    print(f"REM params merged; bank params: {n_bank/1e6:.1f}M", flush=True)

    # --- 3. frozen-base real-codec RD at the midpoints (== REM at init)
    kodak = SyntheticKodak()
    imgs = [kodak[i] for i in range(min(args.n_images, len(kodak)))]
    rem_params = jax.device_put(rem_params)
    host_params = jax.device_get(rem_params)

    def real_eval(params, host):
        codec = GranularCodec(
            rem_model, {"params": params}, lanes=512, lane_policy="auto",
            host_params={"params": host},
        )
        codec.update()
        return evaluate_codec(codec, imgs, pr_list=mid_qs)

    before = real_eval(rem_params, host_params)
    print("frozen base @ midpoints:", json.dumps(before), flush=True)

    # --- 4. train only the banks
    bank_tx = masked_optimizer(make_optimizer(lr=args.lr), host_params,
                               rem_freeze_fn())
    opt_state = bank_tx.init(rem_params)
    rem_state = TrainState(rem_params, opt_state, jnp.int32(0))
    step_fn = jax.jit(make_train_step(rem_model, bank_tx, quality=mid_qs))

    ds = NaturalSyntheticDataset(n=4000, size=max(384, args.patch_size))
    loader = PatchLoader(ds, args.batch_size, args.patch_size, seed=7, workers=8)
    rng = jax.random.PRNGKey(11)
    it, epoch = 0, 0
    losses = []
    t0 = time.time()
    while it < args.bank_steps:
        for batch in loader.epoch(epoch):
            if it >= args.bank_steps:
                break
            rng, sub = jax.random.split(rng)
            rem_state, metrics = step_fn(rem_state, jnp.asarray(batch), sub)
            losses.append(metrics["loss_total"])
            it += 1
            if it % 100 == 0:
                print(f"bank step {it}/{args.bank_steps} "
                      f"({(time.time()-t0)/it:.2f} s/step)", flush=True)
        epoch += 1
    loss_head = float(np.mean([float(x) for x in jax.device_get(losses[:50])]))
    loss_tail = float(np.mean([float(x) for x in jax.device_get(losses[-50:])]))
    print(f"bank loss {loss_head:.2f} -> {loss_tail:.2f}", flush=True)

    # --- 5. after: real-codec RD with trained banks
    trained_host = jax.device_get(rem_state.params)
    after = real_eval(rem_state.params, trained_host)
    print("REM after bank training:", json.dumps(after), flush=True)

    deltas = {
        "psnr_db": [round(a - b, 4) for a, b in zip(after["psnr"], before["psnr"])],
        "bpp_pct": [
            round(100.0 * (a - b) / max(b, 1e-9), 3)
            for a, b in zip(after["bpp"], before["bpp"])
        ],
    }
    out = {
        "protocol": {
            "checkpoint": args.checkpoint,
            "bank_steps": args.bank_steps,
            "batch": args.batch_size, "patch": args.patch_size,
            "mid_qualities": list(mid_qs), "lmbda_list": lmb,
            "frozen": "everything except post_latent banks (rem_freeze_fn)",
            "eval": f"REAL codec on {len(imgs)} synthetic-Kodak 768x512",
            "identity_at_init": "zero_out => before == frozen base exactly",
        },
        "frozen_base": before,
        "rem_after_bank_training": after,
        "delta": deltas,
        "bank_loss_head_tail": [loss_head, loss_tail],
        "wall_s": round(time.time() - t_start, 1),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        f.write(json.dumps(out, indent=2))
    print("wrote", args.out, flush=True)
    print(json.dumps(deltas), flush=True)


if __name__ == "__main__":
    main()
