"""Close-out RD ladder: real-codec sweep with INCREMENTAL evidence.

VERDICT r3 next #1: a timeout must leave partial evidence, not nothing.
Each quality point is appended to --out-jsonl the moment it completes
(one warm codec reused across all points); the final --out JSON with
BD-rate vs the reference fixed_pret anchor
(/root/reference/src/compress/utils/result_list.py:168-204) is rebuilt
from the JSONL at the end — and can be rebuilt by hand from a partial
JSONL if the run is killed.

Usage:
  python tools/rd_ladder.py --checkpoint runs/flagship_r4/ckpt_last \
      [--grid full|coarse] [--n-images 24] \
      [--out-jsonl runs/rd_r4_points.jsonl] [--out runs/rd_r4.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", type=str, required=True)
    p.add_argument("--grid", choices=["coarse", "full"], default="full")
    p.add_argument("--n-images", type=int, default=24)
    p.add_argument("--out-jsonl", type=str, default="runs/rd_r4_points.jsonl")
    p.add_argument("--out", type=str, default="runs/rd_r4.json")
    p.add_argument("--lanes", type=int, default=512)
    p.add_argument(
        "--lane-policy", choices=["fixed", "auto"], default="auto",
        help="auto: per-stream lane counts from container metadata — "
        "low-rate points stop paying the full 2*K*2-byte lane-state header",
    )
    args = p.parse_args(argv)

    from progressivecodec_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from progressivecodec_tpu import config as config_lib
    from progressivecodec_tpu.config import ModelConfig, TrainConfig
    from progressivecodec_tpu.models.registry import get_model
    from progressivecodec_tpu.models.codec_granular import GranularCodec
    from progressivecodec_tpu.training.checkpoint import load_checkpoint
    from progressivecodec_tpu.training.step import init_train_state
    from progressivecodec_tpu.training.evaluate import evaluate_codec
    from progressivecodec_tpu.data.datasets import SyntheticKodak
    from progressivecodec_tpu.utils.rd import (
        QUALITY_GRID,
        PROGRESSIVE_ANCHOR_BPP,
        PROGRESSIVE_ANCHOR_PSNR,
        bd_rate,
    )

    meta = json.load(open(os.path.join(args.checkpoint, "config.json")))
    mcfg = config_lib._from_dict(ModelConfig, meta["model"])
    model = get_model(mcfg)
    state, _ = init_train_state(
        model, jax.random.PRNGKey(0), TrainConfig(), sample_shape=(1, 64, 64, 3)
    )
    state, _ = load_checkpoint(args.checkpoint, state)
    variables = {"params": state.params}
    codec = GranularCodec(
        model, variables, lanes=args.lanes, lane_policy=args.lane_policy
    )
    codec.update()

    ds = SyntheticKodak()
    images = [ds[i] for i in range(min(args.n_images, len(ds)))]

    grid = list(QUALITY_GRID) if args.grid == "full" else [
        0.0, 0.25, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 5.0, 6.0, 8.0, 10.0
    ]

    os.makedirs(os.path.dirname(args.out_jsonl) or ".", exist_ok=True)
    done_q = set()
    if os.path.exists(args.out_jsonl):
        for line in open(args.out_jsonl):
            try:
                done_q.add(float(json.loads(line)["quality"]))
            except Exception:
                pass
        print(f"resuming: {len(done_q)} points already on disk", flush=True)

    for q in grid:
        if q in done_q:
            continue
        t0 = time.perf_counter()
        res = evaluate_codec(codec, images, pr_list=[q])
        rec = {
            "quality": q,
            "bpp": res["bpp"][0],
            "psnr": res["psnr"][0],
            "ms_ssim_db": res["ms_ssim_db"][0],
            "enc_time": res["enc_time"][0],
            "dec_time": res["dec_time"][0],
            "n_images": res["n_images"],
            "wall_s": round(time.perf_counter() - t0, 2),
        }
        with open(args.out_jsonl, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    # rebuild the final artifact from the JSONL (works on partial runs too)
    points = [json.loads(line) for line in open(args.out_jsonl)]
    points.sort(key=lambda r: r["quality"])
    result = {
        "checkpoint": args.checkpoint,
        "step": int(state.step),
        "dataset": f"SyntheticKodak[{len(images)}]",
        "qualities": [r["quality"] for r in points],
        "bpp": [r["bpp"] for r in points],
        "psnr": [r["psnr"] for r in points],
        "ms_ssim_db": [r["ms_ssim_db"] for r in points],
    }
    # MS-SSIM sanity (VERDICT r4 weak #2): on the same images a real
    # metric moves smoothly with quality — record the worst adjacent jump
    # so a precision regression is visible in the artifact itself.
    ms = result["ms_ssim_db"]
    if len(ms) >= 2:
        jumps = [abs(b - a) for a, b in zip(ms, ms[1:])]
        result["ms_ssim_db_max_adjacent_jump"] = round(max(jumps), 3)
        result["ms_ssim_db_monotone_violations"] = sum(
            1 for a, b in zip(ms, ms[1:]) if b < a - 0.15
        )
    prog = [(b, p) for r, b, p in zip(result["qualities"], result["bpp"], result["psnr"]) if r > 0]
    try:
        result["bd_rate_vs_fixed_pret"] = bd_rate(
            PROGRESSIVE_ANCHOR_BPP, PROGRESSIVE_ANCHOR_PSNR,
            [b for b, _ in prog], [p for _, p in prog],
        )
    except Exception as e:
        result["bd_rate_vs_fixed_pret"] = f"n/a ({e})"
    with open(args.out, "w") as f:
        f.write(json.dumps(result, indent=2))
    print(f"wrote {args.out} with {len(points)} points; "
          f"bd_rate={result['bd_rate_vs_fixed_pret']}", flush=True)


if __name__ == "__main__":
    main()
