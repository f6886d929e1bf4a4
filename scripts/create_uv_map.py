"""Generate UV checkerboard texture atlases (reference workflow:
scripts/Readme.md `textures/create_uv_map.py`, which emits celestial.png /
sphere.png / disk.png into resources/ — the script itself is not shipped, so
this is an original generator producing equivalent atlases).

Each atlas is an N×N checker of deterministic pastel cells with thin grid
lines and per-cell "u,v" labels, so a rendered image shows at a glance which
part of the texture a surface point sampled (and how it was mirrored/
wrapped). `disk.png` uses a warm ember palette to read well on accretion
discs.

Run: python scripts/create_uv_map.py [outdir]   (default ./resources)
"""

from __future__ import annotations

import os
import sys

import numpy as np
from PIL import Image, ImageDraw

SIZE = 2048
CELLS = 16


def _pastel(rng, warm=False):
    if warm:
        h = rng.uniform(0.0, 0.12)  # reds through oranges
        s = rng.uniform(0.6, 1.0)
        v = rng.uniform(0.75, 1.0)
    else:
        h = rng.uniform(0.0, 1.0)
        s = rng.uniform(0.2, 0.45)
        v = rng.uniform(0.8, 1.0)
    i = int(h * 6.0) % 6
    f = h * 6.0 - int(h * 6.0)
    p, q, t = v * (1 - s), v * (1 - s * f), v * (1 - s * (1 - f))
    rgb = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)][i]
    return tuple(int(255 * c) for c in rgb)


def make_atlas(path, seed, warm=False):
    rng = np.random.default_rng(seed)
    img = Image.new("RGB", (SIZE, SIZE))
    draw = ImageDraw.Draw(img)
    cell = SIZE // CELLS
    for j in range(CELLS):  # v (rows, top = v=0)
        for i in range(CELLS):  # u (cols, left = u=0)
            color = _pastel(rng, warm)
            x0, y0 = i * cell, j * cell
            draw.rectangle([x0, y0, x0 + cell - 1, y0 + cell - 1], fill=color)
            draw.text((x0 + 6, y0 + 4), f"{i},{j}", fill=(30, 30, 30))
    # Grid lines + emphasized u=0.5 / v=0.5 seams.
    for k in range(CELLS + 1):
        w = 3 if k == CELLS // 2 else 1
        draw.line([(k * cell, 0), (k * cell, SIZE)], fill=(40, 40, 40), width=w)
        draw.line([(0, k * cell), (SIZE, k * cell)], fill=(40, 40, 40), width=w)
    img.save(path)
    print(f"wrote {path}")


# 1×1 solid swatches shipped alongside the atlases (the reference's release
# bundle carries the same set; scene files can point any Bitmap texture at
# them for flat-color surfaces).
SOLIDS = {
    "black.png": (0, 0, 0, 255),
    "white.png": (255, 255, 255, 255),
    "cyan.png": (71, 252, 254, 255),
    "dark_blue.png": (0, 0, 31, 255),
    "orange.png": (255, 100, 0, 255),
    "orange_transparent.png": (238, 171, 53, 178),
}


def make_solid(path, rgba):
    mode = "RGBA" if rgba[3] != 255 else "RGB"
    Image.new(mode, (1, 1), rgba if mode == "RGBA" else rgba[:3]).save(path)
    print(f"wrote {path}")


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "resources"
    os.makedirs(outdir, exist_ok=True)
    make_atlas(os.path.join(outdir, "celestial.png"), seed=1)
    make_atlas(os.path.join(outdir, "sphere.png"), seed=2)
    make_atlas(os.path.join(outdir, "disk.png"), seed=3, warm=True)
    for name, rgba in SOLIDS.items():
        make_solid(os.path.join(outdir, name), rgba)


if __name__ == "__main__":
    main()
