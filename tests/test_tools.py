"""Close-out tool logic that must not break at measurement time.

The chip-facing tools (rd_ladder, rem_flagship, bench_2k) are exercised
on hardware at close-out; the pure-host pieces they share are covered
here so a tooling regression is caught by the CPU suite, not mid-window.
"""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bd_trajectory_parses_metrics(tmp_path):
    bd = _load_tool("bd_trajectory")
    # two test sweeps around the anchor's rate range: one clearly worse
    # (lower PSNR at equal rate) and one matching the anchor exactly
    from progressivecodec_tpu.utils.rd import (
        PROGRESSIVE_ANCHOR_BPP, PROGRESSIVE_ANCHOR_PSNR,
    )
    bpp = list(PROGRESSIVE_ANCHOR_BPP[::8])
    psnr = list(PROGRESSIVE_ANCHOR_PSNR[::8])
    lines = [
        {"epoch": 0, "train_loss": 1.0},
        {"epoch": 0, "test": {"bpp": bpp, "psnr": [p - 2.0 for p in psnr]}},
        {"epoch": 5, "test": {"bpp": bpp, "psnr": psnr}},
    ]
    path = tmp_path / "metrics.jsonl"
    path.write_text("\n".join(json.dumps(x) for x in lines) + "\n")

    rows = bd.trajectory(str(path))
    assert [r["epoch"] for r in rows] == [0, 5]
    # 2 dB down needs materially more rate; (sub-sampled) equal curves
    # need only the interpolation residual
    assert rows[0]["bd_rate_pct_vs_anchor"] > 10.0
    assert abs(rows[1]["bd_rate_pct_vs_anchor"]) < 3.0
    # non-test lines are ignored, sweeps keep their point count
    assert rows[0]["n_points"] == len(bpp)


def test_bd_trajectory_drops_collapsed_tail(tmp_path):
    bd = _load_tool("bd_trajectory")
    # saturated ladder: duplicate top points must be deduped before BD
    lines = [{"epoch": 1, "test": {
        "bpp": [0.1, 0.2, 0.3, 0.4, 0.4, 0.4],
        "psnr": [29.0, 30.0, 31.0, 32.0, 32.0, 32.0],
    }}]
    path = tmp_path / "m.jsonl"
    path.write_text("\n".join(json.dumps(x) for x in lines) + "\n")
    rows = bd.trajectory(str(path))
    assert rows[0]["n_points"] == 4
