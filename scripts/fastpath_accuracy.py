"""Fast-path accuracy study: Pallas kernel vs the adaptive-RKF45 lax path.

Three modes:

  (default)            CPU interpret-mode sweep (f64): the h0 / budget
                       parameter tables behind fast_path.py's step-rule
                       constants. Writes docs/fastpath_accuracy.md.

  --dump-ref PATH      CPU f64 reference dump: traces the shared probes
                       through the f64 lax path (scene/rays built in f32,
                       then upcast, so the SAME rays are comparable across
                       precisions/backends) and saves stop codes + tone
                       colors to PATH (.npz).

  --tpu [--ref PATH]   Compiled-f32 on-chip study (r2 verdict item 1): for
                       each probe, the compiled kernel vs the on-chip f32
                       lax path (stop agreement + tone error), vs the f64
                       CPU dump when given (true f32-vs-f64 error, with the
                       f32-lax-vs-f64 column attributing how much is the
                       kernel vs f32 itself), per-lane conserved-quantity
                       drift from the kernel's final states (k·k, L_z,
                       Carter Q for the KS kernel; Mino potential residuals
                       for the BL kernel) — overall and for the
                       slowest-decile (photon-ring) lanes — plus a
                       1e6-step hero-camera probe (step-halving
                       self-convergence + drift) and the BL escaped-ray
                       texel study (r2 verdict item 6). Writes
                       docs/fastpath_accuracy_tpu.md + docs/fastpath_accuracy.json.

Run:  python scripts/fastpath_accuracy.py --dump-ref /tmp/fp_ref.npz
      python scripts/fastpath_accuracy.py --tpu --ref /tmp/fp_ref.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

DOCS = os.path.join(os.path.dirname(__file__), "..", "docs")


def tone(c):
    return c / (1.0 + c)


# ---------------------------------------------------------------------------
# Shared probes (identical across the ref dump and the TPU run)
# ---------------------------------------------------------------------------


def probe_ks_flagship(rows=16, cols=32):
    from test_pallas import flagship

    return flagship(rows, cols)


def probe_bl_default(rows=16, cols=32):
    from test_pallas import kerr_bl_scene

    return kerr_bl_scene(rows, cols, dtype=__import__("jax.numpy", fromlist=["x"]).float32)


def _bl_scene_with_celestial(celestial_lines, rows, cols):
    import jax.numpy as jnp
    import numpy as np

    from gr_raytracer_tpu import config as cfgmod
    from gr_raytracer_tpu.rendering import camera as cam

    toml = f"""
celestial_temperature = {5000.0 if "BlackBody" in celestial_lines else 0.0}
{celestial_lines}
[geometry_type.KerrBL]
radius = 1.0
a = 0.45
horizon_epsilon = 1e-3
[[objects]]
[objects.Disc]
inner_radius = 2.0
outer_radius = 6.0
temperature = 5000.0
[objects.Disc.texture.BlackBody]
beaming_exponent = 3.0
"""
    cfg = cfgmod.parse_config(toml, base_dir=os.path.join(os.path.dirname(__file__), ".."))
    opts = cfgmod.RenderOptions(
        width=cols, height=rows, max_steps=3000, max_radius=40.0, step_size=0.01,
        camera_position=(-12.0, 0.0, -1.0), theta=-np.pi,
    )
    scene = cfgmod.create_scene(cfg, opts, jnp.float32)
    rr, cc = jnp.meshgrid(
        jnp.arange(rows, dtype=jnp.float32), jnp.arange(cols, dtype=jnp.float32), indexing="ij"
    )
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    return scene, x, p


def probe_bl_bitmap(rows=16, cols=32):
    """BL scene whose celestial is the vendored celestial.png atlas —
    bilinear-filtered, far smoother than the knife-edge CHECKER."""
    return _bl_scene_with_celestial(
        '[celestial_texture.Bitmap]\nbeaming_exponent = 0.0\npath = "resources/celestial.png"',
        rows, cols,
    )


def probe_bl_blackbody(rows=16, cols=32):
    """BL scene with a blackbody celestial (T = 5000 K): escaped-ray color is
    a SMOOTH function of the redshift alone — zero texel quantization."""
    return _bl_scene_with_celestial(
        "[celestial_texture.BlackBody]\nbeaming_exponent = 0.0", rows, cols
    )


def probe_ks_hero(rows=32, cols=64, max_steps=1_000_000):
    """The hero #4 shape: vendored kerr.toml, reference camera, 1e6 budget."""
    import jax.numpy as jnp
    import numpy as np

    from gr_raytracer_tpu import config as cfgmod
    from gr_raytracer_tpu.rendering import camera as cam
    from gr_raytracer_tpu.utils import assets

    cfg = cfgmod.load_config(assets.scene_path("kerr.toml"))
    opts = cfgmod.RenderOptions(
        width=cols, height=rows, max_steps=max_steps, max_radius=15000.0,
        camera_position=(-10.0, 0.0, -0.5), theta=1.52, psi=-1.57,
    )
    scene = cfgmod.create_scene_host(cfg, opts, jnp.float32)
    rr, cc = jnp.meshgrid(
        jnp.arange(rows, dtype=jnp.float32), jnp.arange(cols, dtype=jnp.float32), indexing="ij"
    )
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    return scene, x, p


def probe_bl_hero(rows=32, cols=64, max_steps=1_000_000):
    """Deep-Mino KerrBL probe (r4 verdict item 6): vendored kerr-bl.toml
    (a = 0.499 — near-extremal, where the Mino-potential vr² residuals are
    RHS-bound and Kahan-immune) with the hero ring-framing camera and a
    nominal 1e6 budget (the BL kernel doubles it as Mino steps). The f64
    CPU reference integrates the SAME f32 rays."""
    import jax.numpy as jnp

    from gr_raytracer_tpu import config as cfgmod
    from gr_raytracer_tpu.rendering import camera as cam
    from gr_raytracer_tpu.utils import assets

    cfg = cfgmod.load_config(assets.scene_path("kerr-bl.toml"))
    opts = cfgmod.RenderOptions(
        width=cols, height=rows, max_steps=max_steps, max_radius=1000.0,
        camera_position=(-10.0, 0.0, -0.5), theta=1.52, psi=-1.57,
    )
    scene = cfgmod.create_scene_host(cfg, opts, jnp.float32)
    rr, cc = jnp.meshgrid(
        jnp.arange(rows, dtype=jnp.float32), jnp.arange(cols, dtype=jnp.float32),
        indexing="ij",
    )
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    return scene, x, p


REF_PROBES = {
    "ks_flagship": probe_ks_flagship,
    "bl_default": probe_bl_default,
    "bl_bitmap": probe_bl_bitmap,
    "bl_blackbody": probe_bl_blackbody,
}


# ---------------------------------------------------------------------------
# Conserved-quantity drift from kernel final states
# ---------------------------------------------------------------------------


def ks_drift(radius, a, y0, yf, stop):
    """Per-lane conservation drift of the KS kernel, extracted in float64
    numpy (gr_raytracer_tpu.utils.invariants — the jax path is f32-locked in
    a TPU process) from the f32 initial/final states, so the numbers measure
    the f32 integration, not the extraction. Returns dict of [N] arrays:
      kk  — null-condition violation |g^{αβ}p_αp_β| / E² at the final state
      e   — relative E = −p_t drift (identically 0 by construction: the
            kernel never touches p_t; reported to prove it)
      lz  — relative L_z = ξ·p drift (axial Killing)
      q   — relative Carter-constant drift via the KS→BL conversion
    NaN-stopped lanes are excluded (their states are the poison itself), and
    so are horizon-captured lanes: the march legitimately continues INSIDE
    the horizon (Kerr-Schild is horizon-regular) where momenta and curvature
    terms grow without bound toward the singularity, so their final-state
    "relative drift" is unboundedly large by construction while their
    terminal shading (opaque black, scene.rs:178-190 semantics) depends on
    the stop code alone — never on the final state. The lanes whose final
    state actually feeds shading (celestial UV) are the escaped ones, and
    every in-flight event payload (disc hits) is recorded at crossing time,
    long before any plunge."""
    import numpy as np

    from gr_raytracer_tpu.rendering import integrator as integ
    from gr_raytracer_tpu.utils import invariants as inv

    y0 = np.asarray(y0, np.float64)
    yf = np.asarray(yf, np.float64)
    stop = np.asarray(stop)
    ok = (stop != integ.NAN) & (stop != integ.HORIZON)
    r_s, a = float(radius), float(a)

    e0 = -y0[:, 4]
    kk0 = inv.ks_hamiltonian(r_s, a, y0)
    kkf = inv.ks_hamiltonian(r_s, a, yf)
    lz0, lzf = inv.ks_lz(y0), inv.ks_lz(yf)
    q0 = inv.ks_carter(r_s, a, y0)
    qf = inv.ks_carter(r_s, a, yf)
    scale = np.maximum(e0 * e0, 1e-12)
    out = {
        "kk": np.abs(kkf - kk0) / scale,
        "e": np.abs(yf[:, 4] - y0[:, 4]) / np.maximum(np.abs(y0[:, 4]), 1e-12),
        "lz": np.abs(lzf - lz0) / np.maximum(np.abs(lz0), np.abs(e0)),
        "q": np.abs(qf - q0) / np.maximum(np.abs(q0), e0 * e0),
    }
    return {k: v[ok] for k, v in out.items()}, ok


def bl_residuals(r_s, a, e, l_z, q, yf, stop):
    """Mino-potential residuals of the BL kernel's final states: the state
    integrates dv_r = R'/2, dv_θ = Θ'/2, so |v_r² − R(r)| and |v_θ² − Θ(θ)|
    (exactly 0 at launch) measure accumulated f32 integration drift.
    Extraction in numpy f64 (utils/invariants). NaN- and horizon-stopped
    lanes are excluded for the same reasons as ks_drift: near the horizon
    the BL chart itself degenerates (R ~ Δ² → 0 with huge R'), so a
    captured lane's final-state residual measures the chart singularity,
    not the integration, and its shading is state-independent."""
    import numpy as np

    from gr_raytracer_tpu.rendering import integrator as integ
    from gr_raytracer_tpu.utils import invariants as inv

    yf = np.asarray(yf, np.float64)
    stop = np.asarray(stop)
    ok = (stop != integ.NAN) & (stop != integ.HORIZON)
    e = np.asarray(e, np.float64)
    l_z = np.asarray(l_z, np.float64)
    q = np.asarray(q, np.float64)
    r, th = yf[:, 1], yf[:, 2]
    v_r, v_th = yf[:, 4], yf[:, 5]
    R = inv.potential_r(r, r_s, a, e, l_z, q)
    TH = inv.potential_theta(th, a, e, l_z, q)
    scale_r = np.maximum.reduce([np.abs(R), v_r * v_r, (e * e) * (r * r) ** 2 * 1e-6])
    scale_t = np.maximum.reduce([np.abs(TH), v_th * v_th, e * e])
    out = {
        "vr2_res": np.abs(v_r * v_r - R) / np.maximum(scale_r, 1e-12),
        "vth2_res": np.abs(v_th * v_th - TH) / np.maximum(scale_t, 1e-12),
    }
    return {k: v[ok] for k, v in out.items()}, ok


def q_stats(v):
    """mean/q99/max plus the fraction of lanes above 1e-4 — the reference's
    own invariant-drift warn threshold (integrator.rs:184-199). The drift
    distributions are extremely heavy-tailed (a handful of singularity-
    grazing knife-edge lanes carry astronomically large values), so the
    tail FRACTION is the meaningful size of the problem; mean/max alone
    read as much worse than the per-lane reality."""
    import numpy as np

    v = np.asarray(v)
    if v.size == 0:
        return {"mean": 0.0, "q99": 0.0, "max": 0.0, "frac_gt_1e-4": 0.0}
    return {
        "mean": float(v.mean()),
        "q99": float(np.quantile(v, 0.99)),
        "max": float(v.max()),
        "frac_gt_1e-4": float((v > 1e-4).mean()),
    }


def agree_and_err(stop_a, color_a, stop_b, color_b, klass_a=None, klass_b=None):
    """Stop agreement (with the opaque-stop SATURATED equivalence) and the
    tone-mapped max-channel error on agreeing lanes."""
    import numpy as np

    from gr_raytracer_tpu.rendering import integrator as integ
    from gr_raytracer_tpu.rendering import scene as scn

    sa = np.asarray(stop_a)
    sb = np.asarray(stop_b)
    agree = sa == sb
    if klass_a is not None and klass_b is not None:
        sat = (sa == integ.SATURATED) | (sb == integ.SATURATED)
        agree = agree | (
            sat & (np.asarray(klass_a) == scn.HIT) & (np.asarray(klass_b) == scn.HIT)
        )
    err = np.abs(tone(np.asarray(color_a)) - tone(np.asarray(color_b))).max(axis=-1)
    return agree, err


# ---------------------------------------------------------------------------
# CPU f64 reference dump
# ---------------------------------------------------------------------------


def _upcast(tree):
    import jax
    import jax.numpy as jnp

    def up(a):
        if hasattr(a, "dtype") and a.dtype == jnp.float32:
            return a.astype(jnp.float64)
        return a

    return jax.tree.map(up, tree)


def dump_ref(path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np

    from gr_raytracer_tpu.rendering import scene as scn

    out = {}
    for name, builder in REF_PROBES.items():
        scene, x, p = builder()
        scene64 = _upcast(scene)
        s = scn.trace_rays(scene64, jnp.asarray(x, jnp.float64), jnp.asarray(p, jnp.float64))
        out[f"{name}.stop"] = np.asarray(s.stop_code)
        out[f"{name}.klass"] = np.asarray(s.ray_class)
        out[f"{name}.color"] = np.asarray(s.color, np.float64)
        out[f"{name}.x"] = np.asarray(x, np.float32)
        out[f"{name}.p"] = np.asarray(p, np.float32)
        print(f"[ref] {name}: traced {x.shape[0]} rays (f64 lax, CPU)")
    np.savez_compressed(path, **out)
    print(f"wrote {path}")


# ---------------------------------------------------------------------------
# TPU compiled-f32 study
# ---------------------------------------------------------------------------


def run_tpu(ref_path=None, texel_size=1000):
    import time

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from gr_raytracer_tpu import config as cfgmod
    from gr_raytracer_tpu.geometry.kerr import Kerr
    from gr_raytracer_tpu.rendering import fast_path as fp
    from gr_raytracer_tpu.rendering import integrator as integ
    from gr_raytracer_tpu.rendering import scene as scn

    cfgmod.enable_host_cpu_platform()
    assert jax.default_backend() == "tpu", "run with the TPU attached"
    ref = np.load(ref_path) if ref_path else None
    results = {"backend": "tpu", "dtype": "float32"}
    lines = [
        "# Fast-path accuracy on chip (compiled f32 kernels)",
        "",
        "Generated by scripts/fastpath_accuracy.py --tpu. Probes are traced by",
        "the COMPILED Pallas kernels on the TPU (f32) and compared against:",
        "the on-chip f32 lax RKF45 path (same backend, same precision — isolates",
        "the kernel), and the CPU f64 lax reference (the true f32-vs-f64 error;",
        "the f32-lax column attributes how much of it is f32 itself rather than",
        "the kernel). Conservation drift is extracted in f64 from the kernel's",
        "f32 final states. See docs/fastpath_accuracy.md for the CPU-interpret",
        "parameter sweeps.",
        "",
    ]

    @jax.jit
    def lax_trace(scene, x, p):
        return scn.trace_rays(scene, x, p)

    def kernel_trace(scene, x, p):
        spec = fp.scene_kernel_spec(scene)
        res, freq, solver, inverse, n = fp._march_scene(scene, x, p, False, spec)
        samples = fp._finish_samples(scene, res, freq, solver, inverse, n)
        unsort = lambda a: np.asarray(jax.device_get(a))[np.asarray(inverse)][:n]
        return samples, unsort(res.y), solver, np.asarray(jax.device_get(res.steps))[np.asarray(inverse)][:n]

    # ---- probes with an f32-lax (and optional f64) reference -------------
    for name, builder in REF_PROBES.items():
        t0 = time.time()
        scene, x, p = builder()
        fast, y_f, solver, steps = kernel_trace(scene, x, p)
        lax = lax_trace(scene, x, p)
        fs, fc, fk = (np.asarray(jax.device_get(v)) for v in (fast.stop_code, fast.color, fast.ray_class))
        ls, lc, lk = (np.asarray(jax.device_get(v)) for v in (lax.stop_code, lax.color, lax.ray_class))
        agree, err = agree_and_err(fs, fc, ls, lc, fk, lk)
        row = {
            "rays": int(fs.size),
            "vs_f32_lax": {"stop_agreement": float(agree.mean()), **q_stats(err[agree])},
        }
        if ref is not None and f"{name}.stop" in ref:
            # Same f32 camera rays modulo backend roundoff; recorded, not
            # asserted (a few ulp of CPU-vs-TPU f32 divergence is expected).
            row["ray_max_abs_diff"] = float(
                np.abs(np.asarray(x) - ref[f"{name}.x"]).max()
            )
            a64, e64 = agree_and_err(fs, fc, ref[f"{name}.stop"], ref[f"{name}.color"], fk, ref[f"{name}.klass"])
            al, el = agree_and_err(ls, lc, ref[f"{name}.stop"], ref[f"{name}.color"], lk, ref[f"{name}.klass"])
            row["vs_f64_lax"] = {"stop_agreement": float(a64.mean()), **q_stats(e64[a64])}
            row["f32lax_vs_f64_lax"] = {"stop_agreement": float(al.mean()), **q_stats(el[al])}
        # Conserved-quantity drift, overall and on the slowest decile
        # (the photon-ring lanes — the deep-budget tail the drift question
        # is about).
        slow = steps >= np.quantile(steps, 0.9)
        if isinstance(scene.geometry, Kerr):
            y0 = np.asarray(solver.initial_state(jnp.asarray(x), jnp.asarray(p)))
            drift, ok = ks_drift(scene.geometry.radius, scene.geometry.a, y0, y_f, fs)
            row["drift"] = {k: q_stats(v) for k, v in drift.items()}
            # Per-stop-class split: the drift tail lives entirely in the
            # TRAPPED/BUDGET lanes — rays orbiting for thousands of steps in
            # the strong-field region just outside the horizon, whose
            # shading (opaque black / default) never reads the final state.
            # The escaped lanes are the ones whose final state feeds
            # shading (celestial UV).
            esc_m = fs == integ.CELESTIAL
            row["drift_escaped"] = {
                k: q_stats(v)
                for k, v in ks_drift(
                    scene.geometry.radius, scene.geometry.a, y0[esc_m], y_f[esc_m], fs[esc_m]
                )[0].items()
            }
            drift_slow, _ = ks_drift(
                scene.geometry.radius, scene.geometry.a, y0[slow], y_f[slow], fs[slow]
            )
            row["drift_photon_ring"] = {k: q_stats(v) for k, v in drift_slow.items()}
        else:
            march_geometry = fp._march_geometry_of(scene)
            msolver = march_geometry.make_solver(jnp.asarray(x), jnp.asarray(p))
            r_s_f = float(march_geometry.radius)
            a_f = float(march_geometry.a)
            e_h = np.asarray(jax.device_get(msolver.e))
            lz_h = np.asarray(jax.device_get(msolver.l_z))
            q_h = np.asarray(jax.device_get(msolver.q))
            res, ok = bl_residuals(r_s_f, a_f, e_h, lz_h, q_h, y_f, fs)
            row["drift"] = {k: q_stats(v) for k, v in res.items()}
            esc_m = fs == integ.CELESTIAL
            row["drift_escaped"] = {
                k: q_stats(v)
                for k, v in bl_residuals(
                    r_s_f, a_f, e_h[esc_m], lz_h[esc_m], q_h[esc_m], y_f[esc_m], fs[esc_m]
                )[0].items()
            }
            row["drift_photon_ring"] = {
                k: q_stats(v)
                for k, v in bl_residuals(
                    r_s_f, a_f, e_h[slow], lz_h[slow], q_h[slow], y_f[slow], fs[slow]
                )[0].items()
            }
        # escaped-lane-only tone error (the BL tail question, item 6)
        esc = (fs == integ.CELESTIAL) & (ls == integ.CELESTIAL)
        row["escaped_vs_f32_lax"] = q_stats(err[esc])
        results[name] = row
        print(f"[tpu] {name}: {row['vs_f32_lax']} ({time.time()-t0:.1f}s)")
        lines += [f"## {name}", "", "```json", json.dumps(row, indent=1), "```", ""]

    # ---- hero 1e6-step probe: self-convergence + drift --------------------
    t0 = time.time()
    scene, x, p = probe_ks_hero()
    fast, y_f, solver, steps = kernel_trace(scene, x, p)
    fs, fc, fk = (np.asarray(jax.device_get(v)) for v in (fast.stop_code, fast.color, fast.ray_class))
    import gr_raytracer_tpu.ops.geodesic_pallas as gpm

    real = gpm.kerr_rk4_march
    gpm.kerr_rk4_march = lambda *a, **kw: real(*a, **{**kw, "h0": 0.25, "max_steps": 4 * kw["max_steps"]})
    try:
        fine, y_ffine, _, _ = kernel_trace(scene, x, p)
    finally:
        gpm.kerr_rk4_march = real
    ns, nc, nk = (np.asarray(jax.device_get(v)) for v in (fine.stop_code, fine.color, fine.ray_class))
    agree, err = agree_and_err(fs, fc, ns, nc, fk, nk)
    y0 = np.asarray(solver.initial_state(jnp.asarray(x), jnp.asarray(p)))
    drift, ok = ks_drift(scene.geometry.radius, scene.geometry.a, y0, y_f, fs)
    slow = steps >= np.quantile(steps, 0.9)
    drift_slow, _ = ks_drift(scene.geometry.radius, scene.geometry.a, y0[slow], y_f[slow], fs[slow])
    esc_m = fs == integ.CELESTIAL
    drift_esc, _ = ks_drift(scene.geometry.radius, scene.geometry.a, y0[esc_m], y_f[esc_m], fs[esc_m])
    row = {
        "rays": int(fs.size),
        "budget": int(scene.integration.max_steps),
        "steps_mean": float(steps.mean()),
        "steps_max": int(steps.max()),
        "vs_h0_quarter_4x_budget": {"stop_agreement": float(agree.mean()), **q_stats(err[agree])},
        "drift": {k: q_stats(v) for k, v in drift.items()},
        "drift_escaped": {k: q_stats(v) for k, v in drift_esc.items()},
        "drift_photon_ring": {k: q_stats(v) for k, v in drift_slow.items()},
    }
    results["ks_hero_1e6"] = row
    print(f"[tpu] ks_hero_1e6: {row['vs_h0_quarter_4x_budget']} ({time.time()-t0:.1f}s)")
    lines += ["## ks_hero_1e6 (hero camera, max_steps = 1e6)", "",
              "Step-halving self-convergence: the production step rule (h0 = 1.0)",
              "against h0 = 0.25 with a 4x budget, plus f64-extracted conservation",
              "drift of the f32 march (the reference warns at 1e-4 relative drift,",
              "integrator.rs:184-199).", "",
              "```json", json.dumps(row, indent=1), "```", ""]

    # ---- BL escaped-ray texel study at texel_size² -------------------------
    t0 = time.time()
    for name, builder in (("bl_bitmap", probe_bl_bitmap), ("bl_blackbody", probe_bl_blackbody),
                          ("bl_checker", probe_bl_default)):
        scene, xs, ps = builder(texel_size, texel_size)
        fast, _, _, _ = kernel_trace(scene, xs, ps)
        lax = lax_trace(scene, xs, ps)
        fs, fc = np.asarray(jax.device_get(fast.stop_code)), np.asarray(jax.device_get(fast.color))
        ls, lc = np.asarray(jax.device_get(lax.stop_code)), np.asarray(jax.device_get(lax.color))
        esc = (fs == integ.CELESTIAL) & (ls == integ.CELESTIAL)
        err = np.abs(tone(fc) - tone(lc)).max(axis=-1)[esc]
        row = {
            "rays": int(fs.size),
            "escaped": int(esc.sum()),
            "tone_err": q_stats(err),
            "wrong_texel_frac_gt_0.01": float((err > 0.01).mean()) if err.size else 0.0,
        }
        results[f"texel_{name}_{texel_size}"] = row
        print(f"[tpu] texel {name} @{texel_size}²: {row} ({time.time()-t0:.1f}s)")
        lines += [f"## escaped-ray texel study — {name} @ {texel_size}²", "",
                  "```json", json.dumps(row, indent=1), "```", ""]
        t0 = time.time()

    with open(os.path.join(DOCS, "fastpath_accuracy.json"), "w") as f:
        json.dump(results, f, indent=1)
    with open(os.path.join(DOCS, "fastpath_accuracy_tpu.md"), "w") as f:
        f.write("\n".join(lines))
    print("wrote docs/fastpath_accuracy.json + docs/fastpath_accuracy_tpu.md")


# ---------------------------------------------------------------------------
# CPU interpret-mode parameter sweeps (the original study, unchanged)
# ---------------------------------------------------------------------------


def run_cpu_sweep(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import numpy as np

    from test_pallas import flagship, kerr_bl_scene

    import gr_raytracer_tpu.ops.geodesic_pallas as gpm
    from gr_raytracer_tpu.rendering import fast_path as fp
    from gr_raytracer_tpu.rendering import scene as scn

    lines = [
        "# Fast-path accuracy study",
        "",
        f"Probe: {args.rows}x{args.cols} rays, interpret mode on CPU (f64); "
        "reference = adaptive-RKF45 lax path on the same scene. Stop",
        "agreement counts a SATURATED lane (opaque first hit retired the",
        "lane; color and ray class exact by construction) as agreeing iff",
        "the reference classifies HIT — the parity tests' semantics",
        "(tests/test_pallas.stop_agree_mask).",
        "",
        "Generated by scripts/fastpath_accuracy.py — the committed version of",
        "the h0 sweep behind fast_path.py's step-rule constants. The on-chip",
        "compiled-f32 companion is docs/fastpath_accuracy_tpu.md.",
        "",
    ]

    from test_pallas import stop_agree_mask

    def measure(scene, x, p, patch):
        ref = scn.trace_rays(scene, x, p)
        cref = tone(np.asarray(ref.color))
        with patch:
            fast = fp.trace_rays_fast(scene, x, p, interpret=True)
        # Same agreement semantics as the parity tests: a SATURATED lane
        # (opaque first hit retired the lane — exact for color and class by
        # construction) agrees iff the reference classifies HIT.
        agree = stop_agree_mask(ref, fast)
        err = np.abs(cref[agree] - tone(np.asarray(fast.color))[agree]).max(axis=-1)
        return dict(
            agreement=float(agree.mean()),
            err_mean=float(err.mean()),
            err_q99=float(np.quantile(err, 0.99)),
            err_max=float(err.max()),
            steps_mean=float(np.asarray(fast.steps).mean()),
        )

    class kwpatch:
        def __init__(self, name, **over):
            self.name, self.over = name, over

        def __enter__(self):
            self.real = getattr(gpm, self.name)
            real, over = self.real, self.over
            setattr(gpm, self.name, lambda *a, **kw: real(*a, **{**kw, **over}))

        def __exit__(self, *exc):
            setattr(gpm, self.name, self.real)

    scene, x, p = flagship(args.rows, args.cols)
    lines += ["## Kerr (Kerr-Schild) kernel — h0 sweep", "",
              "| h0 | stop agreement | tone err mean | q99 | max | steps/ray |",
              "|---|---|---|---|---|---|"]
    for h0 in (0.25, 0.5, 1.0, 2.0):
        m = measure(scene, x, p, kwpatch("kerr_rk4_march", h0=h0))
        lines.append(
            f"| {h0} | {m['agreement']:.4f} | {m['err_mean']:.2e} | "
            f"{m['err_q99']:.2e} | {m['err_max']:.2e} | {m['steps_mean']:.0f} |"
        )
        print(lines[-1])
    lines += [
        "",
        "h0 = 1.0 (the RKF45 controller's H_MAX, runge_kutta.rs:61-76) keeps",
        "the ≥99% stop-agreement / ≤0.01 tone-mapped bar while quartering the",
        "step count vs h0 = 0.25 — the near-horizon shrink (distance-above-",
        "horizon scaling) governs accuracy, not the far-field cap.",
        "",
    ]

    scene, x, p = kerr_bl_scene(args.rows, args.cols)
    lines += ["## KerrBL (Mino) kernel — budget multiplier sweep (h0 = 0.01)", "",
              "| budget × | stop agreement | tone err mean | q99 | max | steps/ray |",
              "|---|---|---|---|---|---|"]
    base = int(scene.integration.max_steps)
    for mult in (1, 2, 4):
        m = measure(scene, x, p, kwpatch("kerr_bl_rk4_march", max_steps=mult * base))
        lines.append(
            f"| {mult} | {m['agreement']:.4f} | {m['err_mean']:.2e} | "
            f"{m['err_q99']:.2e} | {m['err_max']:.2e} | {m['steps_mean']:.0f} |"
        )
        print(lines[-1])
    lines += [
        "",
        "The fixed Mino step is finer than RKF45's accepted steps, so an equal",
        "step COUNT under-budgets the kernel: near-critical rays exhaust and",
        "misclassify as TRAPPED. A 2× budget (fast_path.py) restores full stop",
        "agreement; only never-stopping lanes consume the extra budget. The",
        "remaining q99 color tail is escaped rays landing in adjacent celestial",
        "CHECKER cells (knife-edge UV, classification identical) — not",
        "integration error: it is invariant under h0 and budget, and vanishes",
        "under smooth textures (docs/fastpath_accuracy_tpu.md texel study).",
        "",
    ]

    out = os.path.join(DOCS, "fastpath_accuracy.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16)
    ap.add_argument("--cols", type=int, default=32)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--dump-ref", type=str, default=None, metavar="PATH.npz")
    ap.add_argument("--ref", type=str, default=None, metavar="PATH.npz")
    ap.add_argument("--texel-size", type=int, default=1000)
    args = ap.parse_args()

    if args.dump_ref:
        dump_ref(args.dump_ref)
    elif args.tpu:
        run_tpu(ref_path=args.ref, texel_size=args.texel_size)
    else:
        run_cpu_sweep(args)


if __name__ == "__main__":
    main()
