"""Pallas RK4 geodesic kernel: parity vs the adaptive RKF45 lax path
(interpret mode on CPU; the compiled path is exercised by bench.py on real
TPU hardware). SURVEY.md stage 12."""

import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu import presets
from gr_raytracer_tpu.ops import geodesic_pallas as gp
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import fast_path
from gr_raytracer_tpu.rendering import scene as scn


def flagship(rows=8, cols=16, dtype=jnp.float32):
    params = presets.kerr_flagship_params(dtype)
    scene = presets.build_kerr_flagship(
        params, rows, cols, max_steps=2000, max_radius=40.0, step_size=0.05
    )
    rr, cc = jnp.meshgrid(
        jnp.arange(rows, dtype=dtype), jnp.arange(cols, dtype=dtype), indexing="ij"
    )
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    return scene, x, p


def test_supports_scene():
    scene, _, _ = flagship(2, 2)
    assert fast_path.supports_scene(scene)
    assert not fast_path.supports_scene(scene.replace(objects=(object(),)))


def test_kernel_parity_with_rkf45_path():
    """Flagship-scene parity at the production bar (r1 verdict item 4):
    ≥99% stop agreement and ≤0.01 tone-mapped error on agreeing rays.
    The h0 = H_MAX = 1.0 step rule is evidenced by the committed sweep
    (scripts/fastpath_accuracy.py → docs/fastpath_accuracy.md)."""
    scene, x, p = flagship(16, 32)
    ref = scn.trace_rays(scene, x, p)
    fast = fast_path.trace_rays_fast(scene, x, p, interpret=True)

    stop_ref = np.asarray(ref.stop_code)
    stop_fast = np.asarray(fast.stop_code)
    assert (stop_ref == stop_fast).mean() >= 0.99

    tone = lambda c: c / (1.0 + c)
    c_ref = tone(np.asarray(ref.color))
    c_fast = tone(np.asarray(fast.color))
    agree = stop_ref == stop_fast
    np.testing.assert_allclose(c_fast[agree], c_ref[agree], atol=0.01)
    assert np.abs(c_fast[agree] - c_ref[agree]).mean() < 5e-4


def test_kernel_hamiltonian_conservation():
    """H = ½ g^{μν} p_μ p_ν ≈ 0 for null rays must survive the march."""
    scene, x, p = flagship(4, 8, dtype=jnp.float32)
    geometry = scene.geometry
    solver = geometry.make_solver(x, p)
    y0 = solver.initial_state(x, p)
    pad = (-y0.shape[0]) % gp.LANE_TILE
    y0p = jnp.concatenate([y0, jnp.broadcast_to(y0[:1], (pad, 8))])
    y_f, stop, steps, *_ = gp.kerr_rk4_march(
        geometry.radius,
        geometry.a,
        geometry.horizon_epsilon,
        y0p,
        h0=0.25,
        max_steps=2000,
        max_radius=40.0,
        interpret=True,
    )
    y_f = np.asarray(y_f)[: y0.shape[0]]
    stop = np.asarray(stop)[: y0.shape[0]]
    h_final = np.asarray(
        gp._hamiltonian(
            float(geometry.radius),
            float(geometry.a),
            jnp.asarray(y_f[:, 1:4].T),
            jnp.asarray(y_f[:, 4:8].T),
        )
    )
    escaped = stop == 2
    assert escaped.any()
    # Momentum scale is O(1); |H| stays small along escaped rays (f32 march).
    assert np.abs(h_final[escaped]).max() < 5e-4


def test_kernel_records_disc_crossings():
    scene, x, p = flagship()
    fast = fast_path.trace_rays_fast(scene, x, p, interpret=True)
    ref = scn.trace_rays(scene, x, p)
    # The disc is visible in this framing: both paths classify some rays HIT.
    assert (np.asarray(fast.ray_class) == scn.HIT).any()
    hit_frac_ref = (np.asarray(ref.ray_class) == scn.HIT).mean()
    hit_frac_fast = (np.asarray(fast.ray_class) == scn.HIT).mean()
    assert abs(hit_frac_ref - hit_frac_fast) < 0.05


def kerr_bl_scene(rows=8, cols=16, dtype=jnp.float64):
    from gr_raytracer_tpu import config as cfgmod
    import numpy as np

    toml = """
celestial_temperature = 0.0
[celestial_texture.Checker]
beaming_exponent = 0.0
width = 18.0
height = 9.0
color1 = [40, 40, 120]
color2 = [5, 5, 20]
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
    cfg = cfgmod.parse_config(toml)
    opts = cfgmod.RenderOptions(
        width=cols,
        height=rows,
        max_steps=3000,
        max_radius=40.0,
        step_size=0.01,
        camera_position=(-10.0, 0.0, -0.5),
        theta=-np.pi,
    )
    scene = cfgmod.create_scene(cfg, opts, dtype)
    rr, cc = jnp.meshgrid(
        jnp.arange(rows, dtype=dtype), jnp.arange(cols, dtype=dtype), indexing="ij"
    )
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    return scene, x, p


def test_kerr_bl_kernel_parity_with_rkf45_path():
    """BL/Mino kernel at the ≥99% stop-agreement bar (full agreement on this
    probe with the 2× step budget — docs/fastpath_accuracy.md). The color
    tail (q99) is escaped rays landing in adjacent celestial CHECKER cells
    (knife-edge UV, identical classification), invariant under step size —
    so the tight bound applies to the error distribution's bulk."""
    scene, x, p = kerr_bl_scene(16, 32)
    assert fast_path.supports_scene(scene)
    ref = scn.trace_rays(scene, x, p)
    fast = fast_path.trace_rays_fast(scene, x, p, interpret=True)
    stop_ref = np.asarray(ref.stop_code)
    stop_fast = np.asarray(fast.stop_code)
    assert (stop_ref == stop_fast).mean() >= 0.99
    tone = lambda c: c / (1.0 + c)
    agree = stop_ref == stop_fast
    c_ref = tone(np.asarray(ref.color))[agree]
    c_fast = tone(np.asarray(fast.color))[agree]
    err = np.abs(c_ref - c_fast).max(axis=-1)
    assert err.mean() < 5e-3
    assert np.quantile(err, 0.95) < 0.01
    # Both paths should see disc hits in this framing.
    assert (np.asarray(ref.ray_class) == scn.HIT).any()
    assert (np.asarray(fast.ray_class) == scn.HIT).any()


def test_schwarzschild_via_bl_kernel_parity():
    """Schwarzschild scenes ride the a=0 Mino kernel (the spherical chart is
    the a=0 BL chart); parity vs the native Schwarzschild RKF45 path."""
    from gr_raytracer_tpu import config as cfgmod

    toml = """
celestial_temperature = 0.0
[celestial_texture.Checker]
beaming_exponent = 0.0
width = 18.0
height = 9.0
color1 = [40, 40, 120]
color2 = [5, 5, 20]
[geometry_type.Schwarzschild]
radius = 1.0
horizon_epsilon = 1e-3
[[objects]]
[objects.Disc]
inner_radius = 3.0
outer_radius = 6.0
temperature = 5000.0
[objects.Disc.texture.BlackBody]
beaming_exponent = 3.0
"""
    cfg = cfgmod.parse_config(toml)
    opts = cfgmod.RenderOptions(
        width=16,
        height=8,
        max_steps=3000,
        max_radius=40.0,
        step_size=0.01,
        camera_position=(-10.0, 0.0, -0.5),
        theta=-np.pi,
    )
    scene = cfgmod.create_scene(cfg, opts, jnp.float64)
    assert fast_path.supports_scene(scene)
    rr, cc = jnp.meshgrid(jnp.arange(8.0), jnp.arange(16.0), indexing="ij")
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    ref = scn.trace_rays(scene, x, p)
    fast = fast_path.trace_rays_fast(scene, x, p, interpret=True)
    stop_ref = np.asarray(ref.stop_code)
    stop_fast = np.asarray(fast.stop_code)
    assert (stop_ref == stop_fast).mean() > 0.9
    tone = lambda c: c / (1.0 + c)
    agree = stop_ref == stop_fast
    err = np.abs(tone(np.asarray(ref.color))[agree] - tone(np.asarray(fast.color))[agree])
    assert err.mean() < 5e-3
    assert (np.asarray(fast.ray_class) == scn.HIT).any()


def test_kerr_sphere_kernel_parity():
    """Kerr + sphere + disc rides the KS kernel with in-kernel sphere
    crossings (sphere.rs semantics incl. the straddle precondition)."""
    from gr_raytracer_tpu import config as cfgmod

    toml = """
celestial_temperature = 0.0
[celestial_texture.Checker]
beaming_exponent = 0.0
width = 18.0
height = 9.0
color1 = [40, 40, 120]
color2 = [5, 5, 20]
[geometry_type.Kerr]
radius = 0.4
a = 0.15
horizon_epsilon = 1e-3
[[objects]]
[objects.Disc]
inner_radius = 3.0
outer_radius = 5.0
temperature = 2000.0
[objects.Disc.texture.Checker]
beaming_exponent = 0.0
width = 6.0
height = 6.0
color1 = [255, 120, 0]
color2 = [120, 40, 0]
[[objects]]
[objects.Sphere]
radius = 2.0
position = [0.0, 0.0, 0.0]
temperature = 2000.0
[objects.Sphere.texture.Checker]
beaming_exponent = 0.0
width = 6.0
height = 6.0
color1 = [255, 0, 0]
color2 = [90, 0, 0]
"""
    cfg = cfgmod.parse_config(toml)
    opts = cfgmod.RenderOptions(
        width=16,
        height=8,
        max_steps=3000,
        max_radius=40.0,
        step_size=0.05,
        camera_position=(-10.0, 0.0, -0.5),
        theta=1.52,
        psi=-1.57,
    )
    scene = cfgmod.create_scene(cfg, opts, jnp.float64)
    assert fast_path.supports_scene(scene)
    rr, cc = jnp.meshgrid(jnp.arange(8.0), jnp.arange(16.0), indexing="ij")
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    ref = scn.trace_rays(scene, x, p)
    fast = fast_path.trace_rays_fast(scene, x, p, interpret=True)
    stop_ref = np.asarray(ref.stop_code)
    stop_fast = np.asarray(fast.stop_code)
    assert (stop_ref == stop_fast).mean() > 0.9
    # Sphere visibly hit on both paths, with matching hit sets mostly.
    hit_ref = np.asarray(ref.ray_class) == scn.HIT
    hit_fast = np.asarray(fast.ray_class) == scn.HIT
    assert hit_ref.any() and hit_fast.any()
    assert (hit_ref == hit_fast).mean() > 0.9
    tone = lambda c: c / (1.0 + c)
    agree = (stop_ref == stop_fast) & (hit_ref == hit_fast)
    err = np.abs(tone(np.asarray(ref.color))[agree] - tone(np.asarray(fast.color))[agree])
    assert err.mean() < 2e-2
