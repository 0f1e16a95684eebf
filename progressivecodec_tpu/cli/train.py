"""Training CLI — the experiment driver.

Behavioral spec: /root/reference/src/train.py (args -> data -> model ->
dual optimizers -> epoch loop: train, valid, plateau LR, periodic real-
codec eval + RD plots, checkpointing).  Config is typed JSON, not pickled
argparse; metrics go to structured JSONL + RD plots (the deliberate
replacement for the reference's wandb logging, SURVEY.md §5).

Usage:
  python -m progressivecodec_tpu.cli.train --train-dir DIR --test-dir DIR \
      [--config cfg.json] [--epochs N] [--out runs/exp1] [--synthetic]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu import config as config_lib
from progressivecodec_tpu.config import ModelConfig, TrainConfig
from progressivecodec_tpu.data.datasets import (
    ImageFolderDataset,
    KodakDataset,
    PatchLoader,
    SyntheticDataset,
)
from progressivecodec_tpu.models.registry import get_model
from progressivecodec_tpu.models.codec_granular import make_codec
from progressivecodec_tpu.training.checkpoint import save_checkpoint, load_checkpoint
from progressivecodec_tpu.training.evaluate import evaluate_codec, entropy_estimate_eval
from progressivecodec_tpu.training.optim import plateau_init, plateau_update, set_lr_scale
from progressivecodec_tpu.training.step import init_train_state, make_train_step
from progressivecodec_tpu.utils.rd import plot_rd, rd_curve_dict, BASE_ANCHOR_BPP, BASE_ANCHOR_PSNR


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train the progressive TPU codec")
    p.add_argument("--config", type=str, default=None, help="ModelConfig JSON file")
    p.add_argument("--train-dir", type=str, default=None)
    p.add_argument("--test-dir", type=str, default=None)
    p.add_argument("--out", type=str, default="runs/default")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--lr-patience", type=int, default=None, dest="lr_patience")
    p.add_argument("--checkpoint", type=str, default=None, help="resume path")
    p.add_argument("--synthetic", action="store_true", help="synthetic data (smoke)")
    p.add_argument(
        "--natural", action="store_true",
        help="natural-statistics synthetic training data (1/f fields + edges) "
        "with the fixed synthetic-Kodak test set — the in-sandbox stand-in "
        "for the reference's OpenImages/Kodak protocol",
    )
    p.add_argument("--natural-n", type=int, default=4000, help="train set size for --natural")
    p.add_argument("--eval-every", type=int, default=5)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument(
        "--sampled", action="store_true",
        help="sampled single-quality training (step.py:55-62) instead of the joint ladder",
    )
    return p.parse_args(argv)


def _log(out_dir, record):
    with open(os.path.join(out_dir, "metrics.jsonl"), "a") as f:
        f.write(json.dumps(record) + "\n")
    print(json.dumps(record), flush=True)


def _try_eval(out_dir, epoch, what, fn, retries: int = 2):
    """Failure containment for the periodic evals: a transient backend
    error (e.g. a dropped remote-compile connection) must not kill a
    multi-hour training run — log it, retry, and move on.  (The reference
    has no failure handling at all; crash = rerun from checkpoint.)"""
    for attempt in range(retries + 1):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - deliberate containment
            _log(out_dir, {
                "epoch": epoch, "eval_error": what,
                "attempt": attempt, "error": f"{type(e).__name__}: {e}"[:500],
            })
            time.sleep(5.0 * (attempt + 1))
    return None


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.out, exist_ok=True)
    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    mcfg = ModelConfig()
    if args.config:
        mcfg = config_lib.model_config_from_json(open(args.config).read())
    tcfg = TrainConfig()
    overrides = {}
    for field in ("epochs", "batch_size", "lr", "seed", "lr_patience"):
        v = getattr(args, field)
        if v is not None:
            overrides[field] = v
    tcfg = dataclasses.replace(tcfg, **overrides)

    valid_imgs = None
    if args.natural:
        from progressivecodec_tpu.data.datasets import NaturalSyntheticDataset, SyntheticKodak

        train_ds = NaturalSyntheticDataset(n=args.natural_n, size=max(384, tcfg.patch_size))
        kodak = SyntheticKodak()
        test_imgs = [kodak[i] for i in range(len(kodak))]
        # held-out validation images (seed 1 != train seed 0): the plateau
        # scheduler must see VALIDATION loss, never train loss
        valid_ds = NaturalSyntheticDataset(n=4, size=256, seed=1)
        valid_imgs = [valid_ds[i] for i in range(len(valid_ds))]
    elif args.synthetic:
        train_ds = SyntheticDataset(n=max(64, tcfg.batch_size * 4), size=tcfg.patch_size)
        test_imgs = [SyntheticDataset(n=2, size=256)[i] for i in range(2)]
    else:
        host = jax.process_index()
        hosts = jax.process_count()
        train_ds = ImageFolderDataset(
            args.train_dir, "train", tcfg.num_images, host_index=host, host_count=hosts
        )
        test_imgs = [KodakDataset(args.test_dir)[i] for i in range(len(KodakDataset(args.test_dir)))]

    model = get_model(mcfg)
    state, tx = init_train_state(
        model,
        jax.random.PRNGKey(tcfg.seed),
        tcfg,
        sample_shape=(1, tcfg.patch_size, tcfg.patch_size, 3),
    )
    start_epoch = 0
    resumed_extra: dict = {}
    if args.checkpoint:
        state, meta = load_checkpoint(args.checkpoint, state)
        resumed_extra = meta.get("extra", {}) or {}
        # global epoch numbering across babysit restarts: a resumed run
        # continues the SAME monotone epoch series in metrics.jsonl instead
        # of restarting at 0 (each restart previously emitted its own
        # overlapping "epoch 0..N" series, making train_loss unreadable)
        start_epoch = int(resumed_extra.get("epoch", -1)) + 1
        print(
            f"resumed from {args.checkpoint} at step {int(state.step)}"
            f" epoch {start_epoch}"
        )

    if args.sampled:
        from progressivecodec_tpu.training.step import make_sampled_train_step

        step_fn = make_sampled_train_step(model, tx)
    else:
        step_fn = jax.jit(make_train_step(model, tx, quality=(0, 10)))
    loader = PatchLoader(
        train_ds, tcfg.batch_size, tcfg.patch_size, seed=tcfg.seed,
        workers=8 if args.natural else 2,
    )
    plateau = plateau_init()
    best_loss = float("inf")
    # restore scheduler + best-checkpoint state across restarts so a resumed
    # run neither re-saves a worse "best" nor forgets accumulated plateau
    # patience (reference train.py:162-171 persists the scheduler state dict)
    if resumed_extra:
        best_loss = float(resumed_extra.get("best_loss", best_loss))
        p = resumed_extra.get("plateau")
        if p:
            plateau = plateau._replace(
                best=float(p["best"]), bad_epochs=int(p["bad_epochs"]),
                scale=float(p["scale"]),
            )
            if plateau.scale != 1.0:
                state = state._replace(
                    opt_state=set_lr_scale(state.opt_state, plateau.scale)
                )

    for epoch in range(start_epoch, tcfg.epochs):
        t0 = time.time()
        losses = []
        rng = jax.random.PRNGKey(tcfg.seed * 1000 + epoch)
        for bi, batch in enumerate(loader.epoch(epoch)):
            if args.steps_per_epoch and bi >= args.steps_per_epoch:
                break
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, jnp.asarray(batch), sub)
            # keep the loss on device: a per-step float() would d2h every
            # step, and on the tunneled backend a d2h costs ~12 ms AND
            # degrades subsequent dispatch latency (models/codec.py)
            losses.append(metrics["loss_total"])
        train_loss = (
            float(np.mean([float(l) for l in jax.device_get(losses)]))
            if losses else float("nan")
        )
        _log(args.out, {"epoch": epoch, "step": int(state.step),
                        "train_loss": train_loss, "time_s": time.time() - t0})

        # validation at pr_list=[0,10] (reference train.py:327-330) — the
        # loss that drives the plateau scheduler and best-checkpoint choice
        codec = make_codec(model, {"params": state.params})
        vimgs = valid_imgs if valid_imgs is not None else test_imgs[:4]
        val = _try_eval(
            args.out, epoch, "valid",
            lambda: entropy_estimate_eval(
                codec, vimgs, pr_list=(0.0, 10.0), lmbda_list=mcfg.lmbda_list
            ),
        )
        if val is not None:
            _log(args.out, {"epoch": epoch, "valid": val})
        # ReduceLROnPlateau analog (train.py:333 steps on VALIDATION loss;
        # factor/patience train.py:276): scale lr by lr_factor after
        # lr_patience non-improving epochs — applied via opt-state
        # hyperparam surgery, so the compiled step is reused.  Falls back
        # to train loss only if every valid-eval retry failed.
        plateau_metric = val["loss"] if val is not None else train_loss
        new_plateau = plateau_update(
            plateau, plateau_metric, tcfg.lr_factor, tcfg.lr_patience
        )
        if new_plateau.scale != plateau.scale:
            state = state._replace(
                opt_state=set_lr_scale(state.opt_state, new_plateau.scale)
            )
            _log(args.out, {"epoch": epoch, "lr_scale": new_plateau.scale,
                            "lr": tcfg.lr * new_plateau.scale})
        plateau = new_plateau

        # best = lowest VALIDATION loss (reference train.py:345: is_best on
        # the valid criterion, not train loss)
        if plateau_metric < best_loss:
            best_loss = plateau_metric
        extra = {
            "epoch": epoch,
            "best_loss": best_loss,
            "plateau": {"best": plateau.best, "bad_epochs": plateau.bad_epochs,
                        "scale": plateau.scale},
        }
        # CHECKPOINT BEFORE the periodic heavy evals: each static-quality
        # point of the sweep is a fresh full-model XLA compile, and on this
        # backend the compile path can spike host RSS enough for a global
        # OOM kill (measured: 130 GB into the 14-point sweep).  With the
        # checkpoint already on disk a kill costs the evals, not the epoch
        # — the babysitter resumes at the NEXT epoch, and each attempt's
        # completed compiles land in the persistent cache so a later sweep
        # finishes where the last one died.
        save_checkpoint(
            os.path.join(args.out, "ckpt_last"), state, mcfg, tcfg, extra=extra
        )
        if plateau_metric <= best_loss:
            save_checkpoint(
                os.path.join(args.out, "ckpt_best"), state, mcfg, tcfg, extra=extra
            )

        # entropy-estimate test sweep at the reference's 14-point quality
        # ladder (train.py:337: [0,0.01,0.05,0.1,0.25,0.5,1,1.5,2,2.5,3,4,5,10])
        if (epoch + 1) % args.eval_every == 0:
            test = _try_eval(
                args.out, epoch, "test",
                lambda: entropy_estimate_eval(
                    codec, test_imgs[:4],
                    pr_list=(0.0, 0.01, 0.05, 0.1, 0.25, 0.5, 1.0, 1.5,
                             2.0, 2.5, 3.0, 4.0, 5.0, 10.0),
                ),
            )
            if test is not None:
                _log(args.out, {"epoch": epoch, "test": test})

            def _real_eval():
                codec.update()
                return evaluate_codec(codec, test_imgs[:4], pr_list=(0.0, 1.0, 10.0))

            real = _try_eval(args.out, epoch, "real_codec", _real_eval)
            if real is not None:
                _log(args.out, {"epoch": epoch, "real_codec": real})
                curves = [
                    rd_curve_dict(BASE_ANCHOR_BPP, BASE_ANCHOR_PSNR, "reference base anchor"),
                    rd_curve_dict(real["bpp"], real["psnr"], "ours"),
                ]
                plot_rd(curves, os.path.join(args.out, f"rd_epoch{epoch}.png"))


if __name__ == "__main__":
    main()
