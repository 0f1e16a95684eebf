"""Fine-grained RD sweep over the reference's 62-level quality grid.

BASELINE config 3: "variance-aware mask ordering sweep: fine-grained rate
points on a single image, RD curve vs reference".  Produces bpp/PSNR per
quality, BD-rate vs the reference's fixed_pret anchor, a plot, and JSON.

Usage:
  python -m progressivecodec_tpu.cli.rd_sweep --dataset /data/kodak \
      [--checkpoint CKPT] [--image 0] [--grid coarse|full] [--out rd.json]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from progressivecodec_tpu import config as config_lib
from progressivecodec_tpu.config import ModelConfig, TrainConfig
from progressivecodec_tpu.data.datasets import KodakDataset, SyntheticDataset
from progressivecodec_tpu.models.registry import get_model
from progressivecodec_tpu.models.codec_granular import make_codec
from progressivecodec_tpu.training.evaluate import evaluate_codec
from progressivecodec_tpu.utils.rd import (
    QUALITY_GRID,
    PROGRESSIVE_ANCHOR_BPP,
    PROGRESSIVE_ANCHOR_PSNR,
    TRI_PLANET_22_BPP,
    TRI_PLANET_22_PSNR,
    TRI_PLANET_23_BPP,
    TRI_PLANET_23_PSNR,
    bd_rate,
    plot_rd,
    rd_curve_dict,
)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, default=None)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--image", type=int, default=None, help="single image index")
    p.add_argument("--grid", choices=["coarse", "full"], default="coarse")
    p.add_argument("--out", type=str, default="rd_sweep.json")
    p.add_argument("--plot", type=str, default=None)
    p.add_argument("--synthetic", action="store_true")
    p.add_argument(
        "--synthetic-kodak", action="store_true",
        help="the fixed 24-image synthetic Kodak-geometry test set "
        "(data/datasets.SyntheticKodak) — the in-sandbox eval protocol",
    )
    p.add_argument("--max-images", type=int, default=None)
    args = p.parse_args(argv)

    if args.checkpoint:
        import os

        from progressivecodec_tpu.training.checkpoint import load_checkpoint
        from progressivecodec_tpu.training.step import init_train_state

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
        variables = jax.jit(
            lambda r, x: model.init({"params": r}, x, training=False)
        )(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))

    if args.synthetic_kodak:
        from progressivecodec_tpu.data.datasets import SyntheticKodak

        ds = SyntheticKodak()
        images = [ds[args.image]] if args.image is not None else [ds[i] for i in range(len(ds))]
    elif args.synthetic:
        ds = SyntheticDataset(n=1, size=512)
        images = [ds[0]]
    else:
        ds = KodakDataset(args.dataset)
        images = [ds[args.image]] if args.image is not None else [ds[i] for i in range(len(ds))]
    if args.max_images:
        images = images[: args.max_images]

    grid = list(QUALITY_GRID) if args.grid == "full" else [
        0.0, 0.25, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 5.0, 6.0, 8.0, 10.0
    ]

    codec = make_codec(model, variables)
    codec.update()
    res = evaluate_codec(codec, images, pr_list=grid)

    result = {
        "qualities": grid,
        "bpp": res["bpp"],
        "psnr": res["psnr"],
        "ms_ssim_db": res["ms_ssim_db"],
    }
    # BD-rate vs the reference progressive anchor over the overlapping range
    try:
        result["bd_rate_vs_fixed_pret"] = bd_rate(
            PROGRESSIVE_ANCHOR_BPP, PROGRESSIVE_ANCHOR_PSNR, res["bpp"][1:], res["psnr"][1:]
        )
    except Exception as e:  # non-overlapping quality ranges (untrained model)
        result["bd_rate_vs_fixed_pret"] = f"n/a ({e})"

    text = json.dumps(result, indent=2)
    print(text)
    open(args.out, "w").write(text)
    if args.plot:
        plot_rd(
            [
                rd_curve_dict(PROGRESSIVE_ANCHOR_BPP, PROGRESSIVE_ANCHOR_PSNR, "reference fixed_pret"),
                rd_curve_dict(TRI_PLANET_23_BPP, TRI_PLANET_23_PSNR, "tri_planet_23"),
                rd_curve_dict(TRI_PLANET_22_BPP, TRI_PLANET_22_PSNR, "tri_planet_22"),
                rd_curve_dict(res["bpp"], res["psnr"], "ours"),
            ],
            args.plot,
            title="Progressive RD sweep",
        )


if __name__ == "__main__":
    main()
