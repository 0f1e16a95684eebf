"""Rate-distortion anchors and RD-curve utilities.

Anchor DATA reproduced from the reference's hard-coded benchmark constants
(/root/reference/src/train.py:379-380 and
/root/reference/src/compress/utils/result_list.py:168-214) — these are the
numbers our curves are judged against (BASELINE.md).  Code is fresh.
"""

from __future__ import annotations

import numpy as np

# Non-progressive base anchor on Kodak (train.py:379-380)
BASE_ANCHOR_BPP = (0.127, 0.199, 0.309, 0.449, 0.649, 0.895)
BASE_ANCHOR_PSNR = (29.20, 30.59, 32.26, 34.15, 35.91, 37.72)

# The reference's progressive curve endpoints and sample interior points
# ("fixed_pret", result_list.py:168-204; full 62-point grid at 206-214).
PROGRESSIVE_ANCHOR_SAMPLES = (
    # (bpp, psnr_db)
    (0.193, 30.50),
    (0.394, 33.82),
    (0.549, 35.09),
    (0.694, 35.41),
)

# quality grid used for the reference's fine-grained progressive sweep
QUALITY_GRID = tuple(round(q * 0.1, 1) for q in range(0, 51)) + tuple(
    round(5.5 + 0.5 * i, 1) for i in range(0, 10)
)


def bd_rate(r1, d1, r2, d2) -> float:
    """Bjontegaard delta-rate of curve 2 vs curve 1 (negative = curve 2
    needs fewer bits at equal quality).  Standard cubic-fit in log-rate."""
    r1, d1 = np.asarray(r1, float), np.asarray(d1, float)
    r2, d2 = np.asarray(r2, float), np.asarray(d2, float)
    lr1, lr2 = np.log(r1), np.log(r2)
    p1 = np.polyfit(d1, lr1, 3)
    p2 = np.polyfit(d2, lr2, 3)
    lo = max(d1.min(), d2.min())
    hi = min(d1.max(), d2.max())
    if hi <= lo:
        raise ValueError("quality ranges do not overlap")
    P1 = np.polyint(p1)
    P2 = np.polyint(p2)
    int1 = np.polyval(P1, hi) - np.polyval(P1, lo)
    int2 = np.polyval(P2, hi) - np.polyval(P2, lo)
    avg_diff = (int2 - int1) / (hi - lo)
    return float((np.exp(avg_diff) - 1) * 100.0)


def rd_curve_dict(bpp, psnr, label: str) -> dict:
    return {"label": label, "bpp": list(map(float, bpp)), "psnr": list(map(float, psnr))}


def plot_rd(curves: list[dict], path: str, title: str = "RD curve (Kodak)"):
    """Write an RD plot PNG (matplotlib optional; silently skips if absent).

    Replaces the reference's wandb plotting (utils/plot.py:13-95)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    fig, ax = plt.subplots(figsize=(7, 5))
    for c in curves:
        ax.plot(c["bpp"], c["psnr"], marker="o", ms=3, label=c["label"])
    ax.set_xlabel("bpp")
    ax.set_ylabel("PSNR (dB)")
    ax.set_title(title)
    ax.grid(True, alpha=0.3)
    ax.legend()
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return path
