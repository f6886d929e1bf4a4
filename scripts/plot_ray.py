#!/usr/bin/env python
"""Plot ray-trajectory CSVs (i,t,tau,x,y,z) exported by render-ray /
render-ray-at — the analog of the reference's plotting scripts
(scripts/Readme.md).

Usage: python scripts/plot_ray.py ray1.csv [ray2.csv ...] [--out plot.png]
       [--plane xy|xz|3d] [--rs 1.0]
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("csvs", nargs="+")
    ap.add_argument("--out", default="ray-plot.png")
    ap.add_argument("--plane", choices=["xy", "xz", "3d"], default="xy")
    ap.add_argument("--rs", type=float, default=1.0, help="horizon radius to draw")
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(7, 7))
    if args.plane == "3d":
        ax = fig.add_subplot(projection="3d")
    else:
        ax = fig.add_subplot()
        ax.set_aspect("equal")

    for path in args.csvs:
        data = np.genfromtxt(path, delimiter=",", names=True)
        x, y, z = data["x"], data["y"], data["z"]
        if args.plane == "xy":
            ax.plot(x, y, lw=1, label=path)
        elif args.plane == "xz":
            ax.plot(x, z, lw=1, label=path)
        else:
            ax.plot(x, y, z, lw=1, label=path)

    if args.plane != "3d":
        theta = np.linspace(0, 2 * np.pi, 200)
        ax.plot(args.rs * np.cos(theta), args.rs * np.sin(theta), "k-", lw=2)
        ax.legend(fontsize=7)
    fig.savefig(args.out, dpi=150, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
