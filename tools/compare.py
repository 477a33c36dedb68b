"""Overlay PCK curves from multiple saved evaluation runs.

Equivalent of reference tools/compare.py:13-60: read ``PCK2d.txt`` artifacts
from eval2D_results_* directories and plot/compare them.

    python tools/compare.py eval2D_results_expA eval2D_results_expB --out cmp.png
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("dirs", nargs="+", help="eval2D_results_* directories")
    p.add_argument("--out", default="compare_pck.png")
    p.add_argument("--curve", default="PCK2d.txt")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    fig, ax = plt.subplots(figsize=(7, 5))
    for d in args.dirs:
        path = os.path.join(d, args.curve)
        th, pck = np.loadtxt(path)
        # reference AUC formula over the plotted slice (misc.py:281-288)
        s = slice(0, 30)
        area = ((pck[s][0] + 2 * pck[s][1:-1].sum() + pck[s][-1])
                * (th[s][1] - th[s][0]) / 2 / (th[s][-1] - th[s][0]))
        label = f"{os.path.basename(d.rstrip('/'))} (AUC {area:.4f})"
        ax.plot(th, pck, marker=".", label=label)
        print(label)
    ax.set_xlabel("threshold [px]")
    ax.set_ylabel("PCK")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(args.out, dpi=120)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
