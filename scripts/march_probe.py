"""On-chip A/B probe of the KS march kernel's sustained steps/s.

Marches the HERO scene (kerr.toml, hero #4 camera) with every image row but
a strided subset of columns — the photon-ring / trapped lanes that dominate
hero render #4 are all present, so deep-budget blocks dominate the march and
the reported lane-steps/s is the kernel's sustained rate (the trace is
jitted whole; only the kernel while-loop contributes meaningfully).

Knobs under test ride env vars (GR_EVENT_GATE, GR_LANE_TILE, GR_OPAQUE_STOP,
GR_FAR_FIELD), so run once per configuration:

    GR_EVENT_GATE=0 python scripts/march_probe.py --max-steps 100000
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1000, help="hero grid edge")
    ap.add_argument("--col-stride", type=int, default=16)
    ap.add_argument("--max-steps", type=int, default=100000)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--scene", default=None)
    ap.add_argument(
        "--tracer",
        choices=["jit", "driver"],
        default="jit",
        help="jit: trace_rays_fast inside one jit (single-dispatch kernel); "
        "driver: make_fast_tracer, the shipped driver path (the r3 A/B "
        "that retired the phased-requeue orchestration ran through here)",
    )
    ap.add_argument(
        "--no-objects",
        action="store_true",
        help="strip the scene's objects (no opaque-stop help for the cost "
        "sort — the maximally divergent-block regime)",
    )
    args = ap.parse_args()

    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from gr_raytracer_tpu import config as cfgmod
    from gr_raytracer_tpu.rendering import camera as cam
    from gr_raytracer_tpu.rendering import fast_path

    from gr_raytracer_tpu.utils import assets as _assets
    cfg = cfgmod.load_config(args.scene or _assets.scene_path("kerr.toml"))
    opts = cfgmod.RenderOptions(
        width=args.size,
        height=args.size,
        max_steps=args.max_steps,
        camera_position=(-10.0, 0.0, -0.5),
        theta=1.52,
        psi=-1.57,
        phi=0.0,
    )
    scene = cfgmod.create_scene_host(cfg, opts, jnp.float32)
    if args.no_objects:
        scene = scene.replace(objects=())

    rows = np.arange(args.size, dtype=np.float32)
    cols = np.arange(0, args.size, args.col_stride, dtype=np.float32)
    rf = jnp.asarray(np.repeat(rows, cols.size))
    cf = jnp.asarray(np.tile(cols, rows.size))
    spec = fast_path.scene_kernel_spec(scene)

    if args.tracer == "driver":
        tracer = fast_path.make_fast_tracer(scene)

        def trace(rf, cf):
            color, _, stop, _ = tracer(scene, rf, cf)
            return stop, color

    else:

        @jax.jit
        def trace(rf, cf):
            x, p = cam.pixel_rays(scene.camera, rf, cf)
            s = fast_path.trace_rays_fast(scene, x, p, spec=spec)
            return s.steps, s.color

    # Fence with device_get: on the tunneled runtime block_until_ready
    # returns before the remote computation finishes (see .claude/skills/
    # verify) — timing with it undermeasures.
    t0 = time.perf_counter()
    steps, color = jax.device_get(trace(rf, cf))
    compile_s = time.perf_counter() - t0
    # driver mode returns stop codes in the first slot; steps_total is only
    # meaningful for the jit tracer.
    steps_total = int(np.asarray(steps, np.int64).sum()) if args.tracer == "jit" else 0

    best = float("inf")
    for i in range(args.repeats):
        t0 = time.perf_counter()
        jax.device_get(trace(rf + 1e-5 * (i + 1), cf))
        best = min(best, time.perf_counter() - t0)

    print(
        f"tracer={args.tracer} objects={not args.no_objects} "
        f"gate={os.environ.get('GR_EVENT_GATE', '1')} "
        f"tile={os.environ.get('GR_LANE_TILE', '1024')} "
        f"far={os.environ.get('GR_FAR_FIELD', '1')} "
        f"budget={args.max_steps} lanes={rf.size} compile={compile_s:.1f}s "
        f"march={best:.3f}s steps={steps_total} "
        f"steps/s={steps_total / best:.3e}"
    )


if __name__ == "__main__":
    main()
