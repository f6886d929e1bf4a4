#!/usr/bin/env python
"""Animate ray-trajectory CSVs — the matplotlib port of the reference's
Manim scene (scripts/animate-rays/main.py `AnimateRays`; Manim is not in
this image, so the same animation semantics are rendered with
matplotlib.animation instead).

Reference behavior reproduced:
  * reads `rays/*.csv` (the `i,t,tau,x,y,z` schema written by the
    render-ray / render-ray-at subcommands, ray.rs:35-54), sorted by name;
  * plots the (z, x) plane (X_AXIS_IN_CSV="z", Y_AXIS_IN_CSV="x") over a
    polar grid out to r = 10 with a filled horizon disc of radius 1;
  * colors rays on a blue -> red ramp by file order;
  * animates every ray against a SHARED coordinate-time grid: each dot
    linearly interpolates its own (t -> position) samples on a global
    linspace over [min t, max t] across all rays, holding its final
    position once its own trajectory ends — so causally-ordered arrival
    (photons that plunge early freeze at the horizon while others still
    travel) reads directly off the animation;
  * leaves a traced path behind each dot.

Usage:
  python scripts/animate_rays.py rays/*.csv --save rays.gif
  python scripts/animate_rays.py --rays-dir rays --steps 200 --fps 30
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

import matplotlib.animation as manim
import matplotlib.pyplot as plt
import numpy as np

NUM_STEPS = 200  # frames (reference NUM_STEPS)
X_COL, Y_COL = "z", "x"  # default plotted plane (reference X/Y_AXIS_IN_CSV)


def read_trajectory(path):
    data = np.genfromtxt(path, delimiter=",", names=True)
    if data.ndim == 0:  # single-row CSV
        data = data.reshape(1)
    return data


def ramp_color(index, total):
    """Blue -> red linear ramp by file order (reference get_color_linear)."""
    ratio = index / (total - 1) if total > 1 else 0.0
    blue = np.array([0.23, 0.51, 0.96])
    red = np.array([0.99, 0.23, 0.19])
    return tuple((1 - ratio) * blue + ratio * red)


def build_interpolators(trajectories, steps, cols=(X_COL, Y_COL)):
    """Global coordinate-time grid + per-ray held-end linear interpolation."""
    t0 = min(tr["t"].min() for tr in trajectories)
    t1 = max(tr["t"].max() for tr in trajectories)
    grid = np.linspace(t0, t1, steps)
    xs, ys = [], []
    for tr in trajectories:
        t = tr["t"]
        # np.interp clamps to the end values outside [t[0], t[-1]] — exactly
        # the reference's fill_value=last-sample hold.
        xs.append(np.interp(grid, t, tr[cols[0]]))
        ys.append(np.interp(grid, t, tr[cols[1]]))
    print(f"Global time range: {t0:.2f} to {t1:.2f} (duration {t1 - t0:.2f})")
    return grid, np.stack(xs), np.stack(ys)


def make_figure(radius_max, horizon_radius):
    fig, ax = plt.subplots(figsize=(7, 7), facecolor="#222222")
    ax.set_facecolor("#222222")
    ax.set_aspect("equal")
    ax.set_xlim(-radius_max, radius_max)
    ax.set_ylim(-radius_max, radius_max)
    ax.set_xticks([])
    ax.set_yticks([])
    for spine in ax.spines.values():
        spine.set_visible(False)
    # Polar backdrop: radius circles every 2 units + 12 azimuth spokes.
    theta = np.linspace(0, 2 * np.pi, 256)
    for r in np.arange(2.0, radius_max + 1e-9, 2.0):
        ax.plot(r * np.cos(theta), r * np.sin(theta), color="w", alpha=0.25, lw=0.6)
    for phi in np.arange(0, 2 * np.pi, np.pi / 6):
        ax.plot(
            [0, radius_max * np.cos(phi)],
            [0, radius_max * np.sin(phi)],
            color="w",
            alpha=0.25,
            lw=0.6,
        )
    ax.add_patch(plt.Circle((0, 0), horizon_radius, color="#c23030", alpha=0.8, zorder=3))
    return fig, ax


def animate(csv_paths, save, steps, fps, radius_max, horizon_radius, cols=(X_COL, Y_COL)):
    trajectories = []
    for p in sorted(csv_paths):
        print(f"Reading {p}...")
        trajectories.append(read_trajectory(p))
    if not trajectories:
        sys.exit("no ray CSVs found")

    _, xs, ys = build_interpolators(trajectories, steps, cols)
    fig, ax = make_figure(radius_max, horizon_radius)

    dots, trails = [], []
    n = len(trajectories)
    for i in range(n):
        color = ramp_color(i, n)
        (trail,) = ax.plot([], [], color=color, lw=1.2, alpha=0.9, zorder=4)
        (dot,) = ax.plot([], [], "o", color=color, ms=3, zorder=5)
        trails.append(trail)
        dots.append(dot)

    def update(frame):
        for i in range(n):
            trails[i].set_data(xs[i, : frame + 1], ys[i, : frame + 1])
            dots[i].set_data([xs[i, frame]], [ys[i, frame]])
        return trails + dots

    anim = manim.FuncAnimation(fig, update, frames=steps, blit=False)
    writer = (
        manim.FFMpegWriter(fps=fps)
        if save.endswith(".mp4") and manim.FFMpegWriter.isAvailable()
        else manim.PillowWriter(fps=fps)
    )
    if save.endswith(".mp4") and not manim.FFMpegWriter.isAvailable():
        save = os.path.splitext(save)[0] + ".gif"
        print("ffmpeg unavailable; writing GIF instead:", save)
    anim.save(save, writer=writer, dpi=100)
    print("saved", save)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("csvs", nargs="*", help="ray CSV files (i,t,tau,x,y,z)")
    ap.add_argument("--rays-dir", default="rays", help="directory glob fallback (<dir>/*.csv)")
    ap.add_argument("--save", default="rays.gif", help="output .gif or .mp4")
    ap.add_argument("--steps", type=int, default=NUM_STEPS, help="animation frames")
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--radius-max", type=float, default=10.0, help="polar grid extent")
    ap.add_argument("--horizon-radius", type=float, default=1.0, help="central disc radius")
    ap.add_argument("--cols", default="z,x", help="CSV columns for the plot plane (default z,x like the reference)")
    args = ap.parse_args()
    paths = args.csvs or glob.glob(os.path.join(args.rays_dir, "*.csv"))
    animate(paths, args.save, args.steps, args.fps, args.radius_max, args.horizon_radius,
            tuple(args.cols.split(",")))


if __name__ == "__main__":
    main()
