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

# The reference's full 62-point progressive curve on Kodak
# ("fixed_pret", result_list.py:168-204) — the curve our RD sweeps are
# judged against at every progressive rate point.
PROGRESSIVE_ANCHOR_BPP = (
    0.19309, 0.22198, 0.24570, 0.26795, 0.28907, 0.30917, 0.32830, 0.34643,
    0.36367, 0.37986, 0.39477, 0.40902, 0.42282, 0.43603, 0.44874, 0.46098,
    0.47264, 0.48381, 0.49439, 0.50467, 0.51447, 0.52367, 0.53262, 0.54105,
    0.54896, 0.55659, 0.56389, 0.57070, 0.57728, 0.58349, 0.58937, 0.59495,
    0.60026, 0.60525, 0.61003, 0.61460, 0.61891, 0.62285, 0.62656, 0.63010,
    0.63344, 0.63661, 0.63962, 0.64253, 0.64536, 0.64800, 0.65052, 0.65286,
    0.65519, 0.65727, 0.65935, 0.65935, 0.66815, 0.67504, 0.68065, 0.68490,
    0.68815, 0.69048, 0.69217, 0.69321, 0.69377, 0.69395,
)
PROGRESSIVE_ANCHOR_PSNR = (
    30.505, 30.178, 30.489, 30.762, 31.017, 31.257, 31.482, 31.693, 31.894,
    32.082, 32.259, 32.427, 32.589, 32.744, 32.893, 33.034, 33.164, 33.289,
    33.407, 33.519, 33.625, 33.725, 33.820, 33.910, 33.995, 34.075, 34.153,
    34.225, 34.294, 34.359, 34.421, 34.477, 34.533, 34.584, 34.633, 34.680,
    34.724, 34.765, 34.804, 34.840, 34.876, 34.908, 34.939, 34.967, 34.995,
    35.021, 35.046, 35.068, 35.090, 35.111, 35.130, 35.130, 35.211, 35.271,
    35.319, 35.352, 35.376, 35.391, 35.402, 35.408, 35.411, 35.412,
)
PROGRESSIVE_ANCHOR_SAMPLES = tuple(
    zip(PROGRESSIVE_ANCHOR_BPP[::15], PROGRESSIVE_ANCHOR_PSNR[::15])
)

# decode-time anchor (tri_planet_23, result_list.py:107-127): 2.30-9.18 s/img
DECODE_TIME_ANCHOR_RANGE_S = (2.30, 9.18)

# quality grid used for the reference's fine-grained progressive sweep
# (result_list.py:206-214)
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
