"""On-chip probe: volumetric split path with the kernel geometric pass.

Renders a small crop of the kerr-volumetric-streaky scene through
trace_pixels_chunked (the production driver) and reports the per-chunk rate,
plus the same crop with GR_FAST_PATH=0 to quantify the kernel-geo speedup.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu import config as cfgmod
from gr_raytracer_tpu.rendering import raytracer as rt

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128

from gr_raytracer_tpu.utils import assets

cfg = cfgmod.load_config(assets.scene_path("kerr-volumetric-streaky.toml"))
opts = cfgmod.RenderOptions(
    width=SIZE,
    height=SIZE,
    max_steps=20000,
    camera_position=(-10.0, 0.0, -0.5),
    theta=1.52,
    psi=-1.57,
)
scene = cfgmod.create_scene(cfg, opts, jnp.float32)
rf = (np.arange(SIZE * SIZE) // SIZE).astype(np.float32)
cf = (np.arange(SIZE * SIZE) % SIZE).astype(np.float32)

print("backend:", jax.default_backend(), "fast:", rt._use_fast_path(scene), flush=True)
t0 = time.perf_counter()
colors, klass, ok = rt.trace_pixels_chunked(scene, rf, cf, chunk_size=SIZE * SIZE)
dt = time.perf_counter() - t0
print(f"first (compile+run): {dt:.1f}s", flush=True)
t0 = time.perf_counter()
colors, klass, ok = rt.trace_pixels_chunked(scene, rf + 1e-4, cf, chunk_size=SIZE * SIZE)
dt = time.perf_counter() - t0
print(f"steady: {dt:.2f}s -> {SIZE * SIZE / dt:.0f} rays/s", flush=True)
uniq, cnt = np.unique(klass, return_counts=True)
print("classes:", dict(zip(uniq.tolist(), cnt.tolist())), "color max:", colors[..., :3].max(), flush=True)
