#!/usr/bin/env python
"""Kerr spin sweep -> animated GIF (reference: scripts spin-sweep GIF).

Renders the flagship Kerr scene over a range of spins and assembles a GIF.

Usage: python scripts/kerr_spin_sweep.py --spins 0,0.1,...  (or --n 10)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--a-max", type=float, default=0.499)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=128)
    ap.add_argument("--max-steps", type=int, default=3000)
    ap.add_argument("--out", default="kerr-spin-sweep.gif")
    ap.add_argument("--cpu", action="store_true", help="pin the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from gr_raytracer_tpu import presets
    from gr_raytracer_tpu.rendering import camera as cam
    from gr_raytracer_tpu.rendering import scene as scn
    from gr_raytracer_tpu.rendering.color import xyza_buffer_to_srgb8

    rows, cols = args.height, args.width
    params = presets.kerr_flagship_params(jnp.float32)

    @jax.jit
    def render(p, rf, cf):
        scene = presets.build_kerr_flagship(
            p, rows, cols, max_steps=args.max_steps, max_radius=40.0, step_size=0.05
        )
        x, mom = cam.pixel_rays(scene.camera, rf, cf)
        return scn.trace_rays(scene, x, mom).color

    rr, cc = jnp.meshgrid(
        jnp.arange(rows, dtype=jnp.float32), jnp.arange(cols, dtype=jnp.float32), indexing="ij"
    )
    frames = []
    for i in range(args.n):
        a = args.a_max * i / max(args.n - 1, 1)
        p = dict(params)
        p["a"] = jnp.asarray(a, jnp.float32)
        color = jax.device_get(render(p, rr.ravel(), cc.ravel())).reshape(rows, cols, 4)
        img = np.asarray(xyza_buffer_to_srgb8(jnp.asarray(color)))
        frames.append(Image.fromarray(img))
        print(f"a = {a:.3f} done")
    frames[0].save(
        args.out, save_all=True, append_images=frames[1:], duration=200, loop=0
    )
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
