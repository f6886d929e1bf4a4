"""Timing breakdown of the volumetric split path on the current backend:
geometric pass (kernel or lax) vs compacted raymarch vs fold.

Usage: python scripts/vol_breakdown_probe.py [size] [scene.toml]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu import config as cfgmod
from gr_raytracer_tpu.rendering import raytracer as rt
from gr_raytracer_tpu.utils import assets

SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
TOML = (
    sys.argv[2]
    if len(sys.argv) > 2
    else assets.scene_path("kerr-volumetric-streaky.toml")
)

cfg = cfgmod.load_config(TOML)
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
fast = rt._use_fast_path(scene)
print("backend:", jax.default_backend(), "fast:", fast, flush=True)

geo_fn = rt._trace_chunk_geo_fast if fast else rt._trace_chunk_geo

# Warm both stages via one full split call.
t0 = time.perf_counter()
rt._trace_chunk_split(scene, rf, cf)
print(f"full split (compile+run): {time.perf_counter() - t0:.1f}s", flush=True)

t0 = time.perf_counter()
geo = jax.device_get(geo_fn(scene, jnp.asarray(rf + 1e-4), jnp.asarray(cf)))
t_geo = time.perf_counter() - t0
n_ev = int((geo.ev_kind >= 0).sum()) if hasattr(geo, "ev_kind") else -1
vol_lanes = int((np.asarray(geo.ev_kind) == 0).sum())
print(f"geo pass: {t_geo:.2f}s ({SIZE * SIZE / t_geo:.0f} rays/s), vol events: {vol_lanes}", flush=True)

t0 = time.perf_counter()
color, klass, stop, ovf = rt._trace_chunk_split(scene, rf + 1e-4, cf)
t_full = time.perf_counter() - t0
print(
    f"full split steady: {t_full:.2f}s -> {SIZE * SIZE / t_full:.0f} rays/s "
    f"(raymarch+fold ~ {t_full - t_geo:.2f}s)",
    flush=True,
)
uniq, cnt = np.unique(klass, return_counts=True)
print("classes:", dict(zip(uniq.tolist(), cnt.tolist())), flush=True)
