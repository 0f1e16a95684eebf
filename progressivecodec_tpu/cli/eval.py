"""Eval CLI: real-codec metrics over a dataset at a quality ladder.

Replaces the reference's (broken-as-shipped) eval entry point
(/root/reference/src/compress/utils/eval_model/__main__.py — imports a
nonexistent model, zoo/__init__.py:16).

Usage:
  python -m progressivecodec_tpu.cli.eval --checkpoint runs/exp1/ckpt_best \
      --dataset /path/to/kodak [--qualities 0,1,2,...,10] [--out results.json]
"""

from __future__ import annotations

import argparse
import json

import jax

from progressivecodec_tpu import config as config_lib
from progressivecodec_tpu.config import ModelConfig, TrainConfig
from progressivecodec_tpu.data.datasets import KodakDataset, SyntheticDataset
from progressivecodec_tpu.models.registry import get_model
from progressivecodec_tpu.models.codec_granular import make_codec
from progressivecodec_tpu.training.checkpoint import load_checkpoint
from progressivecodec_tpu.training.evaluate import evaluate_codec, entropy_estimate_eval
from progressivecodec_tpu.training.step import init_train_state


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--qualities", type=str, default="0,1,2,4,6,8,10")
    p.add_argument("--mask-pol", type=str, default=None)
    p.add_argument("--out", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--max-images", type=int, default=None)
    args = p.parse_args(argv)

    pr_list = [float(q) for q in args.qualities.split(",")]

    if args.checkpoint:
        import os

        meta = json.load(open(os.path.join(args.checkpoint, "config.json")))
        mcfg = config_lib._from_dict(ModelConfig, meta["model"])
        model = get_model(mcfg)
        state, _ = init_train_state(
            model, jax.random.PRNGKey(0), TrainConfig(), sample_shape=(1, 64, 64, 3)
        )
        state, _ = load_checkpoint(args.checkpoint, state)
        variables = {"params": state.params}
    else:
        mcfg = ModelConfig()
        model = get_model(mcfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jax.numpy.zeros((1, 64, 64, 3)),
            training=False,
        )

    if args.synthetic:
        ds = SyntheticDataset(n=4, size=256)
        images = [ds[i] for i in range(len(ds))]
    else:
        ds = KodakDataset(args.dataset)
        images = [ds[i] for i in range(len(ds))]
    if args.max_images:
        images = images[: args.max_images]

    codec = make_codec(model, variables)
    codec.update()
    real = evaluate_codec(codec, images, pr_list=pr_list, mask_pol=args.mask_pol)
    est = entropy_estimate_eval(codec, images, pr_list=pr_list, mask_pol=args.mask_pol)
    result = {"qualities": pr_list, "real_codec": real, "entropy_estimate": est}
    text = json.dumps(result, indent=2)
    print(text)
    if args.out:
        open(args.out, "w").write(text)


if __name__ == "__main__":
    main()
