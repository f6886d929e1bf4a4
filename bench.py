"""Benchmark: Kerr (Kerr-Schild) RKF45 render throughput on one chip.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N}

The workload is the flagship Kerr blackbody-disc scene (presets.py) at a
fixed 256x256 grid and integration budget, so the number is comparable
across rounds. The reference publishes no numbers (BASELINE.md), so
vs_baseline is measured against this repo's round-1 recording when present
(BENCH_r1.json), else 1.0.
"""

from __future__ import annotations

import glob
import json
import re
import sys
import time

import jax
import jax.numpy as jnp

ROWS = COLS = 256
MAX_STEPS = 2000
REPEATS = 3


def main():
    from gr_raytracer_tpu import presets
    from gr_raytracer_tpu.rendering import camera as cam
    from gr_raytracer_tpu.rendering import scene as scn

    params = presets.kerr_flagship_params(jnp.float32)
    dtype = params["radius"].dtype

    def forward(p, row_f, col_f):
        scene = presets.build_kerr_flagship(
            p, ROWS, COLS, max_steps=MAX_STEPS, max_radius=40.0, step_size=0.05
        )
        x, mom = cam.pixel_rays(scene.camera, row_f, col_f)
        return scn.trace_rays(scene, x, mom).color

    rr, cc = jnp.meshgrid(
        jnp.arange(ROWS, dtype=dtype), jnp.arange(COLS, dtype=dtype), indexing="ij"
    )
    row_f, col_f = rr.ravel(), cc.ravel()

    fn = jax.jit(forward)
    t0 = time.perf_counter()
    out = jax.device_get(fn(params, row_f, col_f))  # device_get: the tunnel
    # backend's block_until_ready returns before execution completes, so a
    # host transfer is the only reliable fence.
    compile_s = time.perf_counter() - t0
    print(f"[bench] backend={jax.default_backend()} compile+first_run={compile_s:.1f}s", file=sys.stderr)

    times = []
    for i in range(REPEATS):
        # Perturb a traced leaf so the tunnel backend can't serve a cached
        # result for a repeated identical dispatch.
        p_i = dict(params)
        p_i["a"] = params["a"] + jnp.asarray(1e-6 * (i + 1), dtype)
        t0 = time.perf_counter()
        jax.device_get(fn(p_i, row_f, col_f))
        times.append(time.perf_counter() - t0)
    best = min(times)
    rays_per_s = ROWS * COLS / best
    print(f"[bench] times={['%.3f' % t for t in times]} rays/s={rays_per_s:.0f}", file=sys.stderr)

    baseline = None
    for path in sorted(glob.glob("BENCH_r*.json")):
        try:
            rec = json.load(open(path))
            v = rec.get("value")
            if v:
                baseline = float(v)
                break
        except Exception:
            continue
    vs_baseline = rays_per_s / baseline if baseline else 1.0

    print(
        json.dumps(
            {
                "metric": "kerr_rkf45_render_rays_per_s_per_chip",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(vs_baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
