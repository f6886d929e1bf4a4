"""A/B the Kahan-compensated kernel state accumulation on chip (r3 verdict
item 3 — "mitigate (or rigorously bound) deep-march f32 drift").

Runs the 1e6-step hero-camera probe (scripts/fastpath_accuracy.py
probe_ks_hero) and the BL bitmap probe through the production kernels twice
— GR_COMPENSATED=0 (plain `y += delta`) vs 1 (Kahan, the default the driver
now picks at budgets >= fast_path.DEEP_BUDGET_COMPENSATION) — and records:

  * f64-extracted conservation drift of the f32 final states (escaped
    lanes: the ones whose final state actually feeds shading), with the
    reference's 1e-4 warn bar (integrator.rs:184-199) as the yardstick:
    frac>1e-4 per invariant, q50/q99/max;
  * march wall-clock on a 128x256 hero-camera workload (best of 5, warm),
    so the speed cost of the compensation is measured, not asserted.

Writes docs/compensated_drift.json (referenced by BASELINE.md and the
round notes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

import fastpath_accuracy as fa
from gr_raytracer_tpu import config as cfgmod
from gr_raytracer_tpu.rendering import fast_path as fp
from gr_raytracer_tpu.rendering import integrator as integ

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def march(scene, x, p):
    """Kernel march only (no shading): returns final states, stop codes and
    the unsort permutation applied."""
    res, freq, solver, inverse, n = fp._march_scene(scene, x, p, False, None)
    unsort = lambda a: np.asarray(jax.device_get(a))[np.asarray(inverse)][:n]
    return unsort(res.y), unsort(res.stop_code), unsort(res.steps), solver


def time_march(scene, x, p, reps=5):
    fp._march_scene(scene, x, p)[0].y.block_until_ready()  # warm / compile
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fp._march_scene(scene, x, p)[0].y.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    cfgmod.enable_host_cpu_platform()
    assert jax.default_backend() == "tpu", "run with the TPU attached"
    out = {"backend": "tpu", "budget": 1_000_000, "warn_bar": 1e-4}

    scene_h, x_h, p_h = fa.probe_ks_hero()  # 32x64, 1e6-step budget
    scene_t, x_t, p_t = fa.probe_ks_hero(rows=128, cols=256)
    scene_b, x_b, p_b = fa.probe_bl_bitmap(512, 512)

    for mode, env in (("plain", "0"), ("kahan", "1")):
        os.environ["GR_COMPENSATED"] = env
        row = {}

        # --- KS hero drift (escaped lanes = the shading-relevant ones) ----
        y_f, stop, steps, solver = march(scene_h, x_h, p_h)
        y0 = np.asarray(solver.initial_state(jnp.asarray(x_h), jnp.asarray(p_h)))
        esc = np.asarray(stop) == integ.CELESTIAL
        drift, _ = fa.ks_drift(
            scene_h.geometry.radius, scene_h.geometry.a, y0[esc], y_f[esc], stop[esc]
        )
        row["ks_hero_escaped"] = {k: fa.q_stats(v) for k, v in drift.items()}

        # --- BL bitmap residuals (photon-ring = slowest decile) -----------
        y_fb, stop_b, steps_b, _ = march(scene_b, x_b, p_b)
        mg = fp._march_geometry_of(scene_b)
        ms = mg.make_solver(jnp.asarray(x_b), jnp.asarray(p_b))
        e_h = np.asarray(jax.device_get(ms.e))
        lz_h = np.asarray(jax.device_get(ms.l_z))
        q_h = np.asarray(jax.device_get(ms.q))
        ring = steps_b >= np.quantile(steps_b, 0.9)
        res_all, _ = fa.bl_residuals(
            float(mg.radius), float(mg.a), e_h, lz_h, q_h, y_fb, stop_b
        )
        res_ring, _ = fa.bl_residuals(
            float(mg.radius), float(mg.a),
            e_h[ring], lz_h[ring], q_h[ring], y_fb[ring], stop_b[ring],
        )
        row["bl_bitmap"] = {k: fa.q_stats(v) for k, v in res_all.items()}
        row["bl_bitmap_photon_ring"] = {k: fa.q_stats(v) for k, v in res_ring.items()}

        # --- speed (128x256 hero camera, march only, best of 5) -----------
        row["hero_march_s"] = round(time_march(scene_t, x_t, p_t), 4)
        out[mode] = row
        print(f"[{mode}] hero_march_s={row['hero_march_s']}")
        print(f"[{mode}] ks lz frac>1e-4 ="
              f" {row['ks_hero_escaped']['lz']['frac_gt_1e-4']:.4f},"
              f" q frac>1e-4 = {row['ks_hero_escaped']['q']['frac_gt_1e-4']:.4f}")
        print(f"[{mode}] bl ring vr2 q99 ="
              f" {row['bl_bitmap_photon_ring']['vr2_res']['q99']:.3e}")

    os.environ.pop("GR_COMPENSATED", None)
    out["speed_cost_pct"] = round(
        100.0 * (out["kahan"]["hero_march_s"] / out["plain"]["hero_march_s"] - 1.0), 2
    )
    path = os.path.join(DOCS, "compensated_drift.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"speed cost: {out['speed_cost_pct']}%")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
