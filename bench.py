"""Benchmark: Kerr (Kerr-Schild) render throughput on one chip.

Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": "rays/s", "vs_baseline": N,
     "backend": ..., "attempts": [...], "mfu": {...}}

The workload is the flagship Kerr blackbody-disc scene (presets.py) at a
fixed 256x256 grid and integration budget, rendered through the production
driver path (chunked + requeue compaction + Pallas fast path), so the
number is comparable across rounds. The reference publishes no numbers
(BASELINE.md); vs_baseline compares against this repo's earliest recorded
round whose backend MATCHES (BENCH_r*.json) — a TPU number is never scored
against a CPU fallback (r1 verdict weakness #1b).

Robustness against the tunneled-TPU failure modes that voided round 1's
number (cold remote compile takes minutes; a killed process wedges the
remote worker for 10-25 min):
  * a dedicated WARM child first compiles the graph with its own generous
    timeout (the persistent .jax_cache then serves the measuring child and
    every future driver run);
  * the TPU measurement is attempted twice before falling back to CPU;
  * every attempt's outcome (rc / timeout / tail of stderr) is recorded in
    the emitted JSON so a fallback is never silent.

Roofline accounting: the kernel is pure VPU work (no matmuls — the MXU is
idle by design; an 8-component ODE state has nothing to contract). The JSON
carries a `mfu` block with FLOPs/ray-step measured by XLA cost analysis of
the exact RK4 step expression, measured steps/s, and the implied fraction
of the v5e VPU f32 peak. See BASELINE.md for the roofline discussion.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

# Scored config is fixed (256² / 2000 steps); the env overrides exist for
# the CI smoke (scripts/ci.sh) which runs the same code path on CPU at a
# small size — a smoke run never overwrites a scored BENCH_r*.json.
ROWS = COLS = int(os.environ.get("GR_BENCH_SIZE", "256"))
MAX_STEPS = int(os.environ.get("GR_BENCH_STEPS", "2000"))
REPEATS = 3
WARM_TIMEOUT_S = 2700  # cold remote compile through the tunnel takes ~25 min
MEASURE_TIMEOUT_S = 600
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")

# TPU v5e (v5 lite) VPU f32 peak estimate: 8 sublanes x 128 lanes x 4 ALUs
# x ~1.74 GHz core clock ~= 7.1e12 FLOP/s. The geodesic march never touches
# the MXU (no contractions), so VPU f32 is the binding compute roofline;
# HBM traffic is ~100 B/ray TOTAL (VMEM-resident march), i.e. the kernel is
# compute-bound by ~5 orders of magnitude (BASELINE.md).
VPU_PEAK_F32 = 7.1e12


def _configure_cache(jax):
    try:
        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def estimate_step_flops():
    """FLOPs per ray per RK4 step of the KS kernel, from XLA cost analysis
    of the exact step expression (4x _rhs + state update + adaptive-lite h).
    Counted on the CPU backend (cost analysis of the Pallas kernel itself is
    unavailable); the arithmetic is identical by construction."""
    import jax
    import jax.numpy as jnp

    from gr_raytracer_tpu.ops import geodesic_pallas as gp

    lanes = 512

    def step(y):
        radius, a = 1.0, 0.45
        r_plus = 0.5 + (0.25 - a * a) ** 0.5 if a * a < 0.25 else 0.5
        _, _, _, _, r_here = gp._ks_scalars(radius, a, y[1], y[2], y[3])
        h = 1.0 * jnp.clip((r_here - r_plus) / 10.0, 0.01, 1.0)
        k1 = gp._rhs(radius, a, y)
        k2 = gp._rhs(radius, a, y + 0.5 * h * k1)
        k3 = gp._rhs(radius, a, y + 0.5 * h * k2)
        k4 = gp._rhs(radius, a, y + h * k3)
        return y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    try:
        y = jnp.ones((8, lanes), jnp.float32)
        cost = jax.jit(step, backend="cpu").lower(y).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost["flops"]) / lanes
    except Exception as e:  # cost analysis is best-effort
        print(f"[bench] cost analysis failed ({e}); using analytic count", file=sys.stderr)
        return 1000.0  # hand count: ~215 flops/RHS x 4 + update/stops/events


def _build_scene_host(jax, jnp):
    """Flagship scene with eager precomputation pinned to the host CPU
    backend when available — eager op-by-op dispatch over the tunneled TPU
    costs ~0.3-1 s per op (minutes per scene build)."""
    from gr_raytracer_tpu import config as cfgmod
    from gr_raytracer_tpu import presets

    cfgmod.enable_host_cpu_platform()
    build = lambda: presets.build_kerr_flagship(
        presets.kerr_flagship_params(jnp.float32),
        ROWS, COLS, max_steps=MAX_STEPS, max_radius=40.0, step_size=0.05,
    )
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = None
    default = jax.devices()[0]
    if cpu is None or default == cpu:
        return build()
    with jax.default_device(cpu):
        scene = build()
    return jax.device_put(scene, default)


def measure():
    import jax

    _configure_cache(jax)
    import jax.numpy as jnp
    import numpy as np

    from gr_raytracer_tpu.rendering import raytracer as rt

    # Scene build (LUT construction, camera) happens once, outside timing —
    # the benchmark measures the render path.
    scene = _build_scene_host(jax, jnp)
    backend = jax.default_backend()
    rf = (np.arange(ROWS * COLS) // COLS).astype(np.float32)
    cf = (np.arange(ROWS * COLS) % COLS).astype(np.float32)

    def run(shift):
        # Sub-pixel shift: same compiled fn, but the tunnel can't serve a
        # cached dispatch for repeated identical inputs.
        colors, _, _ = rt.trace_pixels_chunked(scene, rf + shift, cf, chunk_size=ROWS * COLS)
        return colors

    t0 = time.perf_counter()
    run(0.0)
    compile_s = time.perf_counter() - t0
    print(f"[bench] backend={backend} compile+first_run={compile_s:.1f}s", file=sys.stderr)

    times = []
    for i in range(REPEATS):
        t0 = time.perf_counter()
        run(1e-4 * (i + 1))
        times.append(time.perf_counter() - t0)
    best = min(times)
    rays_per_s = ROWS * COLS / best
    print(f"[bench] times={['%.3f' % t for t in times]} rays/s={rays_per_s:.0f}", file=sys.stderr)

    # --- roofline accounting (kernel path — TPU only) -------------------
    mfu = None
    try:
        if backend != "tpu":
            raise RuntimeError("skipped off-TPU (interpret-mode march would dominate)")
        from gr_raytracer_tpu.rendering import camera as cam
        from gr_raytracer_tpu.rendering import fast_path

        x, p = cam.pixel_rays(scene.camera, jnp.asarray(rf), jnp.asarray(cf))
        s = fast_path.trace_rays_fast(scene, x, p)
        total_steps = int(np.asarray(jax.device_get(s.steps), np.int64).sum())
        flops_per_step = estimate_step_flops()
        steps_per_s = total_steps / best
        flops_per_s = steps_per_s * flops_per_step
        mfu = {
            "flops_per_ray_step": round(flops_per_step, 1),
            "total_ray_steps": total_steps,
            "steps_per_s": round(steps_per_s, 1),
            "flops_per_s": round(flops_per_s, 1),
            "vpu_peak_f32": VPU_PEAK_F32,
            "vpu_utilization": round(flops_per_s / VPU_PEAK_F32, 4),
            "note": (
                "steps/s here divides useful ray-steps by the WHOLE frame "
                "time, which on the tunneled chip is ~90% dispatch latency + "
                "host transfer (scripts/bench_decomp.py); see march_sustained for "
                "the march-dominated rate and BASELINE.md for the roofline"
            ),
        }
        print(f"[bench] mfu={mfu}", file=sys.stderr)
    except Exception as e:
        print(f"[bench] mfu accounting failed: {e}", file=sys.stderr)

    # --- sustained-march stanza (r2 verdict weak #6 / item 2): a workload
    # where the MARCH dominates the frame instead of the tunnel. On the real
    # scenes nothing exhausts deep budgets (opaque stop + far-field
    # acceleration + cost sort retire lanes in ~45 steps on average; even at
    # a 1e6-step budget the flagship frame has zero trapped lanes), so the
    # production kernel is saturated directly: same camera rays, no objects,
    # unreachable max_radius, far-field acceleration off — every lane
    # marches its full 2000-step budget (horizon plunges excepted). This is
    # the production kernel's sustained ray-steps/s, comparable against the
    # pure-ALU ceiling (scripts/alu_ceiling_probe.py, ~1.5e9 lane-steps/s).
    hero = None
    try:
        if backend != "tpu":
            raise RuntimeError("skipped off-TPU")
        sat_scene = scene.replace(
            objects=(),
            integration=scene.integration.replace(
                max_radius=jnp.asarray(1e9, jnp.float32)
            ),
        )
        spec = fast_path.KernelSpec((), (), (), 0.0, False)

        @jax.jit
        def sat_trace(rf_, cf_):
            x_, p_ = cam.pixel_rays(sat_scene.camera, rf_, cf_)
            s_ = fast_path.trace_rays_fast(sat_scene, x_, p_, spec=spec)
            return s_.steps.astype(jnp.float32).sum(), s_.color[0]

        hrf, hcf = jnp.asarray(rf), jnp.asarray(cf)
        steps_h, _ = jax.device_get(sat_trace(hrf, hcf))
        hero_steps = int(steps_h)
        hbest = np.inf
        for i in range(2):
            t0 = time.perf_counter()
            jax.device_get(sat_trace(hrf + 1e-4 * (i + 1), hcf))
            hbest = min(hbest, time.perf_counter() - t0)
        hero = {
            "workload": (
                f"{ROWS}x{COLS} camera rays, no objects, unreachable "
                f"max_radius, far-field off — every lane marches its full "
                f"{MAX_STEPS}-step budget (the march-dominated regime)"
            ),
            "frame_s": round(hbest, 4),
            "useful_ray_steps": hero_steps,
            "useful_steps_per_s": round(hero_steps / hbest, 1),
            "alu_ceiling_steps_per_s": 1.5e9,
            "vs_baseline": _stanza_ratio(
                hero_steps / hbest, backend, ("march_sustained", "useful_steps_per_s")
            ),
        }
        print(f"[bench] march_sustained={hero}", file=sys.stderr)
    except Exception as e:
        print(f"[bench] sustained-march stanza failed: {e}", file=sys.stderr)

    # --- sustained volumetric raymarch (r3 verdict item 2/4): the binding
    # cost of hero #5. Full-occupancy synthetic lanes through the PRODUCTION
    # Pallas raymarch (ops/volumetric_pallas.raymarch — clipping, early exit,
    # split-domain fits, unroll all active) on the vendored streaky disc;
    # samples counted by the same clipped-interval math the kernel marches
    # (vp.march_length), so the rate is comparable against the pure-ALU
    # ceiling (scripts/vol_ceiling_probe.py, docs/vol_roofline.json).
    vol = None
    try:
        if backend != "tpu":
            raise RuntimeError("skipped off-TPU")
        from gr_raytracer_tpu import config as cfgmod2
        from gr_raytracer_tpu.ops import volumetric_pallas as vp
        from gr_raytracer_tpu.utils import assets

        vcfg = cfgmod2.load_config(assets.scene_path("kerr-volumetric-streaky.toml"))
        vopts = cfgmod2.RenderOptions(
            width=8, height=8, max_steps=2000,
            camera_position=(-10.0, 0.0, -0.5), theta=1.52, psi=-1.57,
        )
        try:
            cpu = jax.devices("cpu")[0]
        except Exception:
            cpu = None
        if cpu is not None:
            with jax.default_device(cpu):
                vscene = cfgmod2.create_scene(vcfg, vopts, jnp.float32)
        else:
            vscene = cfgmod2.create_scene(vcfg, vopts, jnp.float32)
        vobj = next(o for o in vscene.objects if hasattr(o, "raymarch"))
        vspec = vp.build_vol_spec(vobj, vscene.geometry)

        rng = np.random.default_rng(0)
        n_l = 16384
        r = rng.uniform(vspec.inner * 1.2, vspec.outer * 0.8, n_l)
        phi = rng.uniform(0.0, 2 * np.pi, n_l)
        h = rng.uniform(-0.3, 0.3, n_l) * vspec.thickness
        ro = np.stack([r * np.cos(phi), r * np.sin(phi), h], -1).astype(np.float32)
        tang = np.stack(
            [-np.sin(phi), np.cos(phi), 0.02 * rng.standard_normal(n_l)], -1
        )
        rd = (tang / np.linalg.norm(tang, axis=-1, keepdims=True)).astype(np.float32)
        obs = np.ones(n_l, np.float32)
        ptv = -np.ones(n_l, np.float32)
        ppv = (2.0 + 0.1 * rng.standard_normal(n_l)).astype(np.float32)
        act = np.ones(n_l, bool)
        exd = np.full(n_l, 1e9, np.float32)
        samples = float(vp.march_length(vobj, ro, rd, exd).sum() / vspec.step_size)

        vfn = jax.jit(
            lambda *a: vp.raymarch(vspec, *a)
        )
        args = [jnp.asarray(v) for v in (ro, rd, obs, ptv, ppv, act, exd)]
        jax.device_get(vfn(*args))
        vbest = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            jax.device_get(vfn(*args))
            vbest = min(vbest, time.perf_counter() - t0)
        vol = {
            "workload": (
                f"{n_l} full-occupancy in-disc lanes through the production "
                "volumetric Pallas raymarch (kerr-volumetric-streaky disc)"
            ),
            "march_s": round(vbest, 4),
            "samples": int(samples),
            "samples_per_s": round(samples / vbest, 1),
            "vs_baseline": _stanza_ratio(
                samples / vbest, backend, ("vol_sustained", "samples_per_s")
            ),
        }
        print(f"[bench] vol_sustained={vol}", file=sys.stderr)
    except Exception as e:
        print(f"[bench] vol-sustained stanza failed: {e}", file=sys.stderr)

    return rays_per_s, backend, compile_s, mfu, hero, vol


def warm():
    """Compile-only pass: populates the persistent cache so the measuring
    child (and the driver's rerun) never pays the cold tunnel compile."""
    import jax

    _configure_cache(jax)
    import jax.numpy as jnp
    import numpy as np

    from gr_raytracer_tpu.rendering import raytracer as rt

    scene = _build_scene_host(jax, jnp)
    rf = (np.arange(ROWS * COLS) // COLS).astype(np.float32)
    cf = (np.arange(ROWS * COLS) % COLS).astype(np.float32)
    t0 = time.perf_counter()
    rt.trace_pixels_chunked(scene, rf, cf, chunk_size=ROWS * COLS)
    print(f"[bench] warm pass done in {time.perf_counter() - t0:.1f}s", file=sys.stderr)


def load_baseline(backend):
    """Earliest recorded round value with a MATCHING backend — never compare
    a TPU (CPU) number against a CPU (TPU) baseline."""
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
            if isinstance(rec, dict) and "tail" in rec and "parsed" in rec:
                rec = rec["parsed"]  # driver wrapper format
            v = rec.get("value")
            if v and rec.get("backend") == backend:
                return float(v)
        except Exception:
            continue
    return None


def _stanza_ratio(value, backend, keys):
    """value / earliest recorded same-backend value at the nested `keys`
    path in BENCH_r*.json — per-stanza round-over-round scoring where the
    compute actually binds (r3 verdict item 4). None when no prior round
    recorded the stanza (it then becomes this round's baseline)."""
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            rec = json.load(open(path))
            if isinstance(rec, dict) and "tail" in rec and "parsed" in rec:
                rec = rec["parsed"]
            if rec.get("backend") != backend:
                continue
            node = rec
            for k in keys:
                node = node[k]
            if node:
                return round(float(value) / float(node), 4)
        except Exception:
            continue
    return None


def load_gradient_block():
    """The committed production-scale gradient measurement
    (scripts/grad_scale_probe.py → docs/gradient_bench.json): one
    value_and_grad step at 128² @ 20k budget + the 128² inverse spin fit,
    both run on the chip. Embedded with provenance rather than re-measured:
    a 128²@20k reverse pass would blow this child's measure timeout."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "docs", "gradient_bench.json")
    try:
        rec = json.load(open(path))
        rec["source"] = "docs/gradient_bench.json (scripts/grad_scale_probe.py)"
        return rec
    except Exception:
        return None


LATEST_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "docs", "bench_latest.json"
)
# The driver records only the LAST 2000 chars of stdout; round 4's record
# lost its own headline to that truncation (r4 verdict weak #1). Keep the
# printed line comfortably under the window and put the scored scalars at
# the END of the dict so even a truncated tail retains them.
LINE_BUDGET = 1800


def write_latest(rec):
    """Full (untruncated) record → committed mirror. Skipped for CI smoke
    runs (GR_BENCH_SIZE/STEPS overrides) so a small-size CPU smoke never
    overwrites the scored measurement."""
    if os.environ.get("GR_BENCH_SIZE") or os.environ.get("GR_BENCH_STEPS"):
        return
    try:
        with open(LATEST_PATH, "w") as f:
            json.dump(rec, f, indent=1)
            f.write("\n")
    except Exception as e:
        print(f"[bench] bench_latest write failed: {e}", file=sys.stderr)


def compact_line(rec):
    """One JSON line for stdout: verbose prose stripped, big blocks first,
    headline metric/value/vs_baseline LAST (tail-truncation-proof)."""

    def slim(d, drop=("note", "workload")):
        return {k: v for k, v in d.items() if k not in drop} if d else None

    out = {}
    if rec.get("attempts"):
        out["attempts"] = [
            {k: a[k] for k in ("attempt", "rc", "elapsed_s") if k in a}
            for a in rec["attempts"]
        ]
    g = rec.get("gradient")
    if g:
        out["gradient"] = {
            "reverse_mode": g.get("reverse_mode"),
            "grad_step_s": (g.get("grad_step") or {}).get("wall_clock_s"),
            "bl_grad_step_s": (g.get("bl_grad_step") or {}).get("wall_clock_s"),
            "vol_grad_step_s": (g.get("volumetric") or {}).get("wall_clock_s"),
            "source": "docs/gradient_bench.json",
        }
    if rec.get("mfu"):
        out["mfu"] = slim(rec["mfu"])
    out["full_record"] = "docs/bench_latest.json"
    for key in ("backend", "compile_s"):
        if key in rec:
            out[key] = rec[key]
    if rec.get("vol_sustained"):
        out["vol_sustained"] = slim(rec["vol_sustained"])
    if rec.get("march_sustained"):
        out["march_sustained"] = slim(rec["march_sustained"])
    for key in ("metric", "value", "unit", "vs_baseline"):
        out[key] = rec.get(key)
    line = json.dumps(out)
    # Degrade gracefully if some stanza balloons: drop the leading (least
    # scored) blocks until the line fits the driver's window.
    for victim in ("attempts", "mfu", "gradient"):
        if len(line) <= LINE_BUDGET:
            break
        out.pop(victim, None)
        line = json.dumps(out)
    return line


def emit(rays_per_s, backend, attempts=None, compile_s=None, mfu=None, hero=None, vol=None):
    baseline = load_baseline(backend)
    vs_baseline = rays_per_s / baseline if baseline else 1.0
    rec = {
        "metric": "kerr_render_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(vs_baseline, 4),
        "backend": backend,
    }
    if compile_s is not None:
        rec["compile_s"] = round(compile_s, 1)
    if mfu is not None:
        rec["mfu"] = mfu
    if hero is not None:
        rec["march_sustained"] = hero
    if vol is not None:
        rec["vol_sustained"] = vol
    gradient = load_gradient_block()
    if gradient is not None:
        rec["gradient"] = gradient
    if attempts is not None:
        rec["attempts"] = attempts
    write_latest(rec)
    print(compact_line(rec))


def _run_child(args, env_extra, timeout):
    env = dict(os.environ)
    env.update(env_extra)
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)] + args,
            env=env,
            timeout=timeout,
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired as e:
        tail = ((e.stderr or b"").decode() if isinstance(e.stderr, bytes) else (e.stderr or ""))[-400:]
        return None, {"rc": "timeout", "elapsed_s": round(time.perf_counter() - t0, 1), "tail": tail}
    sys.stderr.write(out.stderr)
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    info = {"rc": out.returncode, "elapsed_s": round(time.perf_counter() - t0, 1)}
    if out.returncode != 0 or not lines:
        info["tail"] = out.stderr[-400:]
        return None, info
    return lines[-1], info


def main():
    if "--warm" in sys.argv:
        warm()
        return
    if "--worker" in sys.argv:
        rays_per_s, backend, compile_s, mfu, hero, vol = measure()
        emit(rays_per_s, backend, compile_s=compile_s, mfu=mfu, hero=hero, vol=vol)
        return

    attempts = []
    cpu_env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""}

    # Warm the compile cache on the TPU first (its own generous timeout —
    # the cold tunnel compile is the documented round-1 killer).
    _, warm_info = _run_child(["--warm"], {}, WARM_TIMEOUT_S)
    attempts.append({"attempt": "tpu-warm", **warm_info})

    plan = [("tpu", {}), ("tpu-retry", {}), ("cpu", cpu_env)]
    for name, env_extra in plan:
        line, info = _run_child(["--worker"], env_extra, MEASURE_TIMEOUT_S)
        attempts.append({"attempt": name, **info})
        if line is not None:
            parsed = json.loads(line)
            rec = None
            try:
                # The worker mirrored its FULL (untruncated) record to
                # bench_latest.json; prefer it over the compact line.
                full = json.load(open(LATEST_PATH))
                if (
                    full.get("backend") == parsed.get("backend")
                    and full.get("value") == parsed.get("value")
                ):
                    rec = full
            except Exception:
                pass
            if rec is None:
                rec = parsed
            rec["attempts"] = attempts
            write_latest(rec)
            print(compact_line(rec))
            return
    # Every attempt failed: emit a zero measurement rather than nothing.
    emit(0.0, "none", attempts=attempts)


if __name__ == "__main__":
    main()
