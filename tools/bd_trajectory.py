"""BD-rate-vs-epoch trajectory from training metrics (VERDICT r4 next #4).

Parses a run's metrics.jsonl, takes every periodic entropy-estimate test
sweep (the reference's 14-point quality ladder, train.py:337), computes
BD-rate vs the reference fixed_pret progressive anchor
(result_list.py:168-204 — utils/rd.py PROGRESSIVE_ANCHOR_*), and writes a
per-epoch table so the training trajectory toward the anchor is visible.

NOTE: test sweeps are entropy-ESTIMATE bpp on synthetic-Kodak content
(the sandbox has no real Kodak and no egress) — the trajectory's SLOPE is
the signal; absolute BD-rate vs the real-Kodak anchor carries a content
offset.  The committed real-codec ladder (runs/rd_r*.json) is the
absolute-number artifact.

Usage: python tools/bd_trajectory.py [--run runs/flagship_r5] [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# BD math + anchors only — no jax/TPU needed
from progressivecodec_tpu.utils.rd import (
    bd_rate, PROGRESSIVE_ANCHOR_BPP, PROGRESSIVE_ANCHOR_PSNR,
)


def trajectory(metrics_path: str) -> list[dict]:
    rows = []
    with open(metrics_path) as f:
        for line in f:
            rec = json.loads(line)
            if "test" not in rec:
                continue
            t = rec["test"]
            bpp, psnr = list(t["bpp"]), list(t["psnr"])
            # BD integration needs monotone rate; drop collapsed tail points
            pts = sorted(set(zip(bpp, psnr)))
            bpp = [p[0] for p in pts]
            psnr = [p[1] for p in pts]
            if len(bpp) < 4:
                continue
            rows.append({
                "epoch": rec["epoch"],
                # same convention as tools/rd_ladder.py: anchor is curve 1,
                # ours is curve 2 — positive = we need more bits
                "bd_rate_pct_vs_anchor": round(
                    bd_rate(list(PROGRESSIVE_ANCHOR_BPP),
                            list(PROGRESSIVE_ANCHOR_PSNR),
                            bpp, psnr), 2),
                "max_bpp": round(max(bpp), 4),
                "max_psnr": round(max(psnr), 2),
                "n_points": len(bpp),
            })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=str, default="runs/flagship_r5")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    rows = trajectory(os.path.join(args.run, "metrics.jsonl"))
    out_path = args.out or os.path.join(args.run, "bd_trajectory.json")
    with open(out_path, "w") as f:
        f.write(json.dumps({
            "anchor": "reference fixed_pret progressive (result_list.py:168-204)",
            "note": "entropy-estimate sweeps on synthetic-Kodak; slope is the "
                    "signal, absolute value carries a content offset",
            "rows": rows,
        }, indent=2))
    print(f"{'epoch':>6} {'BD-rate%':>9} {'max_bpp':>8} {'max_psnr':>9}")
    for r in rows:
        print(f"{r['epoch']:>6} {r['bd_rate_pct_vs_anchor']:>9} "
              f"{r['max_bpp']:>8} {r['max_psnr']:>9}")
    print("wrote", out_path)


if __name__ == "__main__":
    main()
