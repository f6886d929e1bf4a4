"""Decompose the bench frame (256² flagship, 2000-step budget) into stages:

  noop      empty jit dispatch + tiny round-trip  -> tunnel/dispatch floor
  march     camera rays + prepare (sort) + kernel, scalar out
  kernel    kernel only (pre-staged sorted state), scalar out
  prep      camera rays + prepare (sort) only, scalar out
  full-     the bench's full fast tracer, scalar out (no [N,4] transfer)
  full      the bench's full fast tracer, full outputs (exactly bench.py)

The ALU ceiling probe (alu_ceiling_probe.py) says the RK4 arithmetic alone
sustains ~1.5 G lane-steps/s; the bench records 35 M useful steps/s. This
probe shows where the rest of the frame goes.
"""

from __future__ import annotations

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
from gr_raytracer_tpu import presets
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import fast_path as fp
from gr_raytracer_tpu.rendering import scene as scn

ROWS = COLS = 256
MAX_STEPS = 2000


def timeit(name, fn, *args, repeats=3):
    t0 = time.perf_counter()
    jax.device_get(fn(*args))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:10s} compile={compile_s:6.1f}s  best={best*1e3:8.2f} ms", flush=True)
    return best


def main():
    cfgmod.enable_host_cpu_platform()
    with jax.default_device(jax.devices("cpu")[0]):
        scene = presets.build_kerr_flagship(
            presets.kerr_flagship_params(jnp.float32),
            ROWS, COLS, max_steps=MAX_STEPS, max_radius=40.0, step_size=0.05,
        )
    scene = jax.device_put(scene, jax.devices()[0])
    spec = fp.scene_kernel_spec(scene)
    rf = jnp.asarray((np.arange(ROWS * COLS) // COLS).astype(np.float32))
    cf = jnp.asarray((np.arange(ROWS * COLS) % COLS).astype(np.float32))

    timeit("noop", jax.jit(lambda a: a + 1.0), jnp.zeros((8,), jnp.float32))

    @jax.jit
    def prep(rf, cf):
        x, p = cam.pixel_rays(scene.camera, rf, cf)
        mg, solver, y0, freq, inverse = fp._prepare_march(scene, x, p)
        return y0.sum() + freq.observer_energy.sum() + inverse.sum()

    timeit("prep", prep, rf, cf)

    @jax.jit
    def march(rf, cf):
        x, p = cam.pixel_rays(scene.camera, rf, cf)
        mg, solver, y0, freq, inverse = fp._prepare_march(scene, x, p)
        state = fp._run_kernel(mg, scene.integration, solver, y0, spec)
        return state[0].sum() + state[2].sum()

    t_march = timeit("march", march, rf, cf)

    # Pre-staged kernel-only: prepare once, time the kernel dispatch alone.
    x, p = cam.pixel_rays(scene.camera, rf, cf)
    mg, solver, y0, freq, inverse = fp._prepare_march(scene, x, p)
    y0 = jax.device_put(y0)

    @jax.jit
    def kernel_only(y0):
        state = fp._run_kernel(mg, scene.integration, solver, y0, spec)
        return state[0].sum(), state[2].astype(jnp.int64).sum()

    t_kernel = timeit("kernel", kernel_only, y0)
    steps_total = int(jax.device_get(kernel_only(y0)[1]))
    print(f"    raw block-steps proxy: useful steps={steps_total}  "
          f"useful steps/s={steps_total/t_kernel/1e6:.1f} M")

    @jax.jit
    def full_scalar2(rf, cf):
        x, p = cam.pixel_rays(scene.camera, rf, cf)
        s = fp.trace_rays_fast(scene, x, p, spec=spec)
        return s.color.sum()

    timeit("full-", full_scalar2, rf, cf)

    tracer = fp.make_fast_tracer(scene)
    timeit("full", tracer, scene, rf, cf)


if __name__ == "__main__":
    main()
