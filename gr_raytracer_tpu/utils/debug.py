"""Debug artifacts (reference: src/rendering/debug.rs): dump all camera-ray
momenta plus their null-condition scalars to a CSV for inspection."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu.rendering import camera as cam


def dump_camera_rays(scene, path: str = "rays.csv"):
    """CSV: row,col,p_t,p_1,p_2,p_3,k_dot_k for every pixel
    (debug.rs:9-41)."""
    camera = scene.camera
    x, p = cam.full_grid_rays(camera)
    kk = np.asarray(scene.geometry.inner_product(x, p, p))
    p_np = np.asarray(p)
    rows, cols = camera.rows, camera.columns
    with open(path, "w") as f:
        f.write("row,col,p_t,p_1,p_2,p_3,k_dot_k\n")
        for i in range(rows * cols):
            r, c = divmod(i, cols)
            f.write(
                f"{r},{c},{p_np[i, 0]},{p_np[i, 1]},{p_np[i, 2]},{p_np[i, 3]},{kk[i]}\n"
            )
    return path
