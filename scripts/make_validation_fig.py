"""Regenerate docs/assets/validation.png from the checked-in measurements.

Panel A: 3D Taylor-Green Re=1600 dissipation curves (docs/assets/tgv3d_*.npz,
produced by scripts/tgv3d_dissipation.py on the real TPU) against the
published 512^3-spectral DNS peak window.  Panel B: the Re=100 sphere-drag
resolution ladder (scripts/cd_convergence.py) with the first-order
Richardson extrapolation through the last three rungs.

Run: python scripts/make_validation_fig.py
"""
import os
import sys

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

ASSETS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "assets")

SURF, INK, INK2 = "#fcfcfb", "#0b0b0b", "#52514e"
COLORS = {64: "#2a78d6", 128: "#eb6834", 256: "#1baf7a"}

# scripts/cd_convergence.py (TPU, round 4)
CD_RADII = np.array([6, 8, 12, 16, 24, 32])
CD_VALS = np.array([0.8672, 0.8798, 0.9057, 0.9234, 0.9418, 0.9513])
# scripts/cd_estimators.py surface-extrapolated sampling (TPU, round 4),
# same flows/box: the O(h) deficit left is the flow's, not the estimator's
CDX_RADII = np.array([6, 8, 12, 16, 24])
CDX_VALS = np.array([0.9808, 1.0189, 1.0681, 1.0935, 1.1139])


def main():
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10.6, 4.0), dpi=150)
    fig.patch.set_facecolor(SURF)

    ax1.set_facecolor(SURF)
    ax1.axhspan(0.0117, 0.0122, color="#e4e3df", zorder=0)
    ax1.axvspan(8.2, 9.0, color="#e4e3df", zorder=0)
    ax1.text(8.6, 0.0008, "DNS peak window\n(512$^3$ spectral)", fontsize=8,
             color=INK2, ha="center", va="bottom")
    for L in (64, 128, 256):
        f = os.path.join(ASSETS, f"tgv3d_{L}.npz")
        if not os.path.exists(f):  # curves are regenerated per-resolution
            print(f"skip {f} (not regenerated yet)")
            continue
        d = np.load(f)
        ax1.plot(d["tstar"], d["eps"], color=COLORS[L], lw=2, label=f"{L}$^3$")
    ax1.set_xlabel("t*  (convective units)", color=INK)
    ax1.set_ylabel(r"dissipation  $\varepsilon=-\,dKE/dt^*$", color=INK)
    ax1.set_title("3D Taylor–Green, Re=1600: dissipation vs DNS",
                  fontsize=10, color=INK)
    ax1.legend(frameon=False, fontsize=9, loc="upper left")
    ax1.set_xlim(0, 12)
    ax1.set_ylim(0, 0.014)

    ax2.set_facecolor(SURF)
    ax2.axhline(1.09, color=INK2, lw=1.2, ls="--")
    ax2.text(6.2, 1.095, "literature Cd = 1.09 (unbounded, Johnson & Patel)",
             fontsize=8, color=INK2, va="bottom")
    h = 1.0 / CD_RADII
    p = np.polyfit(h[-3:], CD_VALS[-3:], 1)
    rr = np.linspace(10, 40, 50)
    ax2.plot(rr, np.polyval(p, 1 / rr), color="#9ec5f4", lw=1.2, zorder=1)
    ax2.plot(CD_RADII, CD_VALS, "o-", color="#2a78d6", lw=2, ms=6, zorder=2,
             label="band-center estimator (reference semantics)")
    ax2.annotate(f"O(h) → {np.polyval(p, 0):.2f}", (33, 0.965),
                 fontsize=8, color=INK2)
    px = np.polyfit(1.0 / CDX_RADII[-3:], CDX_VALS[-3:], 1)
    ax2.plot(rr, np.polyval(px, 1 / rr), color="#f2b29a", lw=1.2, zorder=1)
    ax2.plot(CDX_RADII, CDX_VALS, "s-", color="#eb6834", lw=2, ms=5, zorder=2,
             label="surface-extrapolated estimator")
    ax2.annotate(f"O(h) → {np.polyval(px, 0):.2f} = lit × measured\n"
                 "blockage (+6% in this 4-diam box)", (20.5, 1.125),
                 fontsize=8, color=INK2)
    ax2.set_xlabel("sphere radius  (cells)", color=INK)
    ax2.set_ylabel("mean drag coefficient  Cd", color=INK)
    ax2.set_title("Laminar sphere, Re=100: drag vs BDIM resolution",
                  fontsize=10, color=INK)
    ax2.legend(frameon=False, fontsize=8, loc="lower right")
    ax2.set_xlim(4, 40)
    ax2.set_ylim(0.84, 1.2)

    for ax in (ax1, ax2):
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color("#c3c2b7")
        ax.tick_params(colors=INK2, labelsize=8)
        ax.grid(True, color="#eceae6", lw=0.6, zorder=0)
        ax.set_axisbelow(True)

    fig.tight_layout()
    out = os.path.join(ASSETS, "validation.png")
    fig.savefig(out, facecolor=SURF, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
