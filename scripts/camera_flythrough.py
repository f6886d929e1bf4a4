#!/usr/bin/env python
"""Render a camera fly-through frame sequence (reference:
scripts/camera-flight, frame-level orchestration).

Interpolates the camera position/angles between --start and --end over
--frames renders; resume at the frame level by rerunning (existing frames
are skipped).

Usage:
  python scripts/camera_flythrough.py -c scene.toml \
      --start=-20,0,-1 --end=-8,0,-0.3 --theta 1.52 --psi -1.57 \
      --frames 60 --width 256 --height 256 --outdir flight/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-c", "--config-file", required=True)
    ap.add_argument("--start", required=True)
    ap.add_argument("--end", required=True)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--theta", type=float, default=0.0)
    ap.add_argument("--phi", type=float, default=0.0)
    ap.add_argument("--psi", type=float, default=0.0)
    ap.add_argument("--max-steps", type=int, default=20000)
    ap.add_argument("--step-size", type=float, default=0.01)
    ap.add_argument("--max-radius", type=float, default=15000.0)
    ap.add_argument("--outdir", default="flythrough")
    ap.add_argument("--f64", action="store_true", help="force float64 on CPU")
    args = ap.parse_args()

    import jax

    if args.f64:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    import numpy as np

    from gr_raytracer_tpu import config as cfgmod
    from gr_raytracer_tpu.rendering import raytracer as rt

    start = np.array([float(v) for v in args.start.split(",")])
    end = np.array([float(v) for v in args.end.split(",")])
    os.makedirs(args.outdir, exist_ok=True)
    cfg = cfgmod.load_config(args.config_file)

    for i in range(args.frames):
        out = os.path.join(args.outdir, f"frame-{i:04d}.png")
        if os.path.exists(out):
            print(f"skip {out}")
            continue
        alpha = i / max(args.frames - 1, 1)
        pos = (1 - alpha) * start + alpha * end
        opts = cfgmod.RenderOptions(
            width=args.width,
            height=args.height,
            max_steps=args.max_steps,
            step_size=args.step_size,
            max_radius=args.max_radius,
            camera_position=tuple(pos),
            phi=args.phi,
            theta=args.theta,
            psi=args.psi,
        )
        scene = cfgmod.create_scene(cfg, opts)
        result = rt.render_section(scene, progress=True)
        rt.write_image(out, result.color)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
