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


def stop_agree_mask(ref, fast):
    """Stop-code agreement with opaque-first-hit semantics: a SATURATED fast
    lane stopped at its first event because the (statically opaque) hit
    saturates the alpha fold — color and ray class are exact by construction,
    only the stop code can't know HORIZON vs CELESTIAL. It counts as agreeing
    iff the reference lane indeed classifies HIT."""
    stop_ref = np.asarray(ref.stop_code)
    stop_fast = np.asarray(fast.stop_code)
    sat = stop_fast == scn.integ.SATURATED
    if sat.any():
        # Saturated lanes must all classify HIT (opacity ≥ threshold).
        assert (np.asarray(fast.ray_class)[sat] == scn.HIT).all()
    hit_ref = np.asarray(ref.ray_class) == scn.HIT
    return (stop_ref == stop_fast) | (sat & hit_ref)


def test_kernel_parity_with_rkf45_path():
    """Flagship-scene parity at the production bar (r1 verdict item 4):
    ≥99% stop agreement and ≤0.01 tone-mapped error on agreeing rays.
    The h0 = H_MAX = 1.0 step rule is evidenced by the committed sweep
    (scripts/fastpath_accuracy.py → docs/fastpath_accuracy.md)."""
    scene, x, p = flagship(16, 32)
    ref = scn.trace_rays(scene, x, p)
    fast = fast_path.trace_rays_fast(scene, x, p, interpret=True)

    agree = stop_agree_mask(ref, fast)
    assert agree.mean() >= 0.99

    tone = lambda c: c / (1.0 + c)
    c_ref = tone(np.asarray(ref.color))
    c_fast = tone(np.asarray(fast.color))
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
    agree = stop_agree_mask(ref, fast)
    assert agree.mean() >= 0.99
    tone = lambda c: c / (1.0 + c)
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
    agree = stop_agree_mask(ref, fast)
    assert agree.mean() > 0.9
    tone = lambda c: c / (1.0 + c)
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
    assert stop_agree_mask(ref, fast).mean() > 0.9
    # Sphere visibly hit on both paths, with matching hit sets mostly.
    hit_ref = np.asarray(ref.ray_class) == scn.HIT
    hit_fast = np.asarray(fast.ray_class) == scn.HIT
    assert hit_ref.any() and hit_fast.any()
    assert (hit_ref == hit_fast).mean() > 0.9
    tone = lambda c: c / (1.0 + c)
    agree = stop_agree_mask(ref, fast) & (hit_ref == hit_fast)
    err = np.abs(tone(np.asarray(ref.color))[agree] - tone(np.asarray(fast.color))[agree])
    assert err.mean() < 2e-2


def test_far_field_escape_acceleration():
    """Outward lanes beyond r_safe take geometric half-gap steps: escaping to
    max_radius = 500 costs O(log) steps, with the same classification and the
    same asymptotic direction as the exact H_MAX = 1.0 cadence."""
    scene, x, p = flagship(4, 8, dtype=jnp.float32)
    geometry = scene.geometry
    solver = geometry.make_solver(x, p)
    y0 = solver.initial_state(x, p)
    pad = (-y0.shape[0]) % gp.LANE_TILE
    y0p = jnp.concatenate([y0, jnp.broadcast_to(y0[:1], (pad, 8))])
    march = lambda r_safe, max_steps: gp.kerr_rk4_march(
        geometry.radius,
        geometry.a,
        geometry.horizon_epsilon,
        y0p,
        h0=1.0,
        max_steps=max_steps,
        max_radius=500.0,
        r_safe=r_safe,
        interpret=True,
    )
    y_a, stop_a, steps_a, *_ = march(12.0, 800)
    y_b, stop_b, steps_b, *_ = march(0.0, 800)
    n = y0.shape[0]
    stop_a, stop_b = np.asarray(stop_a)[:n], np.asarray(stop_b)[:n]
    np.testing.assert_array_equal(stop_a, stop_b)
    esc = stop_a == 2  # CELESTIAL
    assert esc.any()
    # The H_MAX cadence needs ~500 steps to reach r = 500; the far-field rule
    # collapses the escape to a logarithmic number of steps.
    assert np.asarray(steps_a)[:n][esc].max() < 150
    assert np.asarray(steps_b)[:n][esc].max() > 400
    # Same asymptotic direction (celestial UV driver) to f32 tolerance.
    da = np.asarray(y_a)[:n, 1:4]
    db = np.asarray(y_b)[:n, 1:4]
    da = da / np.linalg.norm(da, axis=-1, keepdims=True)
    db = db / np.linalg.norm(db, axis=-1, keepdims=True)
    assert np.abs(da[esc] - db[esc]).max() < 2e-3


def test_opaque_stop_is_exact():
    """opaque_stop on/off must produce identical colors and ray classes —
    the first opaque event saturates the fold, so truncating the march is a
    pure optimization (VERDICT hero-render lever)."""
    scene, x, p = flagship(8, 16)
    spec_on = fast_path.scene_kernel_spec(scene)
    assert spec_on.opaque  # blackbody disc texture is statically opaque
    spec_off = fast_path.KernelSpec(
        spec_on.discs, spec_on.spheres, spec_on.vols, spec_on.r_safe, False
    )
    on = fast_path.trace_rays_fast(scene, x, p, interpret=True, spec=spec_on)
    off = fast_path.trace_rays_fast(scene, x, p, interpret=True, spec=spec_off)
    sat = np.asarray(on.stop_code) == scn.integ.SATURATED
    assert sat.any()
    np.testing.assert_array_equal(np.asarray(on.ray_class), np.asarray(off.ray_class))
    np.testing.assert_allclose(np.asarray(on.color), np.asarray(off.color), atol=1e-6)


KERR_VOLUMETRIC_SCENE = """
celestial_temperature = 0.0

[celestial_texture.Checker]
beaming_exponent = 0.0
width = 10.0
height = 10.0
color1 = [0, 255, 0]
color2 = [0, 100, 0]

[geometry_type.Kerr]
radius = 1.0
a = 0.3
horizon_epsilon = 1e-4

[[objects]]
[objects.VolumetricDisc]
inner_radius = 3.0
outer_radius = 6.0
temperature = 5000.0
num_octaves = 3
perlin_seed = 42
max_steps = 3000
step_size = 0.01
thickness = 0.1
density_multiplier = 300.0
brightness_reference_temperature = 1000.0
absorption = 0.3
scattering = 0.4
noise_scale = [2.0, 2.0, 2.0]
noise_offset = 0.4
[objects.VolumetricDisc.texture.BlackBody]
beaming_exponent = 0.0
"""


def test_volumetric_kernel_geometric_parity():
    """KS-kernel bounding-volume events vs the lax geometric pass: same stop
    codes, same volumetric hit set, and matching full colors through the
    identical inline raymarch shading (the kernel only replaces detection;
    entry points differ by the chord-vs-geodesic sagitta of unequal step
    cadences, so color tolerance is modest)."""
    from gr_raytracer_tpu import config as cfgmod

    cfg = cfgmod.parse_config(KERR_VOLUMETRIC_SCENE)
    opts = cfgmod.RenderOptions(
        width=16,
        height=8,
        max_steps=4000,
        max_radius=30.0,
        step_size=0.05,
        camera_position=(-12.0, 0.0, -1.5),
        theta=1.52,
        psi=-1.57,
    )
    scene = cfgmod.create_scene(cfg, opts)
    assert fast_path.supports_scene(scene)
    spec = fast_path.scene_kernel_spec(scene)
    assert len(spec.vols) == 1 and not spec.opaque

    rr, cc = np.meshgrid(np.arange(8.0), np.arange(16.0), indexing="ij")
    x, p = cam.pixel_rays(scene.camera, jnp.asarray(rr.ravel()), jnp.asarray(cc.ravel()))
    ref = scn.trace_rays(scene, x, p)
    fast = fast_path.trace_rays_fast(scene, x, p, interpret=True, spec=spec)

    stop_ref = np.asarray(ref.stop_code)
    stop_fast = np.asarray(fast.stop_code)
    agree = stop_ref == stop_fast
    assert agree.mean() >= 0.95
    hit_ref = np.asarray(ref.ray_class) == scn.HIT
    hit_fast = np.asarray(fast.ray_class) == scn.HIT
    assert hit_ref.any()
    assert (hit_ref == hit_fast).mean() >= 0.95
    tone = lambda c: c / (1.0 + c)
    both = agree & (hit_ref == hit_fast)
    err = np.abs(tone(np.asarray(ref.color))[both] - tone(np.asarray(fast.color))[both])
    assert err.mean() < 1e-2

    # The geometric-pass variant exposes the same events for the driver's
    # compacted raymarch: volumetric slots present where the inline path hit.
    geo = fast_path.trace_geometric_fast(scene, x, p, interpret=True, spec=spec)
    vol_lanes = (np.asarray(geo.ev_kind) == 0).any(axis=-1)
    assert (vol_lanes & hit_fast).sum() > 0
    # Volumetric surface_colors slots stay zero (shaded by the split pass).
    vol_mask = np.asarray(geo.ev_kind) == 0
    assert np.all(np.asarray(geo.surface_colors)[vol_mask] == 0.0)


def test_compact_wire_matches_geo_trace():
    """The on-device compact volumetric-event wire
    (fast_path.make_fast_geo_compact_tracer — the tunnel-transfer lever
    behind the hero-#5 split driver) must carry exactly the full GeoTrace's
    event lanes: same count, same (ray, slot) set, identical packed payloads
    (ro | rd | obs_e | p_t | p_phi | exit_d), and value-identical
    celestial/kind/stop/overflow after the int8 narrowing."""
    from gr_raytracer_tpu import config as cfgmod

    cfg = cfgmod.parse_config(KERR_VOLUMETRIC_SCENE)
    opts = cfgmod.RenderOptions(
        width=16, height=8, max_steps=4000, max_radius=30.0, step_size=0.05,
        camera_position=(-12.0, 0.0, -1.5), theta=1.52, psi=-1.57,
    )
    scene = cfgmod.create_scene(cfg, opts)
    spec = fast_path.scene_kernel_spec(scene)
    rr, cc = np.meshgrid(np.arange(8.0), np.arange(16.0), indexing="ij")
    rf, cf = jnp.asarray(rr.ravel()), jnp.asarray(cc.ravel())
    x, p = cam.pixel_rays(scene.camera, rf, cf)
    geo = fast_path.trace_geometric_fast(scene, x, p, interpret=True, spec=spec)

    n = int(rf.shape[0])
    tracer = fast_path.make_fast_geo_compact_tracer(scene, 0, 2 * n, interpret=True)
    cel, kind8, stop8, ovf, packed, order, count = (
        np.asarray(v) for v in tracer(scene, rf, cf)
    )
    count = int(count)
    mask = np.asarray(geo.ev_kind) == 0
    flat_idx = np.nonzero(mask.reshape(-1))[0]
    assert count == flat_idx.size > 0
    np.testing.assert_array_equal(np.sort(order[:count]), flat_idx)

    k_slots = int(np.asarray(geo.ev_kind).shape[1])
    nn, kk = order[:count] // k_slots, order[:count] % k_slots
    ev = np.asarray(geo.ev_data)[nn, kk]
    # Tight allclose, not equality: the tracer is jitted while the
    # reference trace here is eager, and XLA's fusion choices differ at
    # the last-ulp level between the two.
    np.testing.assert_allclose(packed[:count, 0:3], ev[:, 0:3], rtol=1e-6, atol=1e-6)
    seg = ev[:, 9:12]
    rd = seg / np.maximum(np.linalg.norm(seg, axis=-1, keepdims=True), 1e-30)
    np.testing.assert_allclose(packed[:count, 3:6], rd, atol=1e-5)
    np.testing.assert_allclose(packed[:count, 6], np.asarray(geo.observer_energy)[nn], rtol=1e-6)
    np.testing.assert_allclose(packed[:count, 7], np.asarray(geo.p_t)[nn], rtol=1e-6)
    np.testing.assert_allclose(packed[:count, 8], np.asarray(geo.p_phi)[nn], rtol=1e-6)
    ed_ref = np.asarray(scene.objects[0].exit_distance(
        jnp.asarray(packed[:count, 0:3]), jnp.asarray(packed[:count, 3:6])))
    np.testing.assert_allclose(packed[:count, 9], ed_ref, rtol=1e-5, atol=1e-5)

    np.testing.assert_array_equal(kind8.astype(np.int32), np.asarray(geo.ev_kind))
    np.testing.assert_array_equal(stop8.astype(np.int32), np.asarray(geo.stop_code))
    np.testing.assert_array_equal(ovf, np.asarray(geo.ev_overflow))
    np.testing.assert_allclose(cel, np.asarray(geo.celestial), rtol=1e-5, atol=1e-6)


def test_bl_kernel_sphere_parity():
    """Spheres in the BL/Mino kernel via the per-step KS Cartesian embedding:
    parity vs the lax path on a Schwarzschild disc+sphere scene (the
    schwarzschild-sphere.toml shape)."""
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
radius = 0.5
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
        step_size=0.01,
        camera_position=(-10.0, 0.0, -0.5),
        theta=-np.pi,
    )
    scene = cfgmod.create_scene(cfg, opts, jnp.float64)
    assert fast_path.supports_scene(scene)
    spec = fast_path.scene_kernel_spec(scene)
    assert len(spec.spheres) == 1 and len(spec.discs) == 1
    rr, cc = np.meshgrid(np.arange(8.0), np.arange(16.0), indexing="ij")
    x, p = cam.pixel_rays(scene.camera, jnp.asarray(rr.ravel()), jnp.asarray(cc.ravel()))
    ref = scn.trace_rays(scene, x, p)
    fast = fast_path.trace_rays_fast(scene, x, p, interpret=True)
    assert stop_agree_mask(ref, fast).mean() > 0.9
    hit_ref = np.asarray(ref.ray_class) == scn.HIT
    hit_fast = np.asarray(fast.ray_class) == scn.HIT
    assert hit_ref.any() and hit_fast.any()
    assert (hit_ref == hit_fast).mean() > 0.9
    tone = lambda c: c / (1.0 + c)
    agree = stop_agree_mask(ref, fast) & (hit_ref == hit_fast)
    err = np.abs(tone(np.asarray(ref.color))[agree] - tone(np.asarray(fast.color))[agree])
    assert err.mean() < 2e-2


def test_bl_kernel_volumetric_parity():
    """Volumetric bounding-volume events in the BL/Mino kernel (Schwarzschild
    rides the a = 0 chart): parity vs the lax path on a
    schwarzschild-volumetric-stony.toml-shaped scene."""
    from gr_raytracer_tpu import config as cfgmod

    toml = KERR_VOLUMETRIC_SCENE.replace(
        """[geometry_type.Kerr]
radius = 1.0
a = 0.3
horizon_epsilon = 1e-4""",
        """[geometry_type.Schwarzschild]
radius = 1.0
horizon_epsilon = 1e-4""",
    )
    cfg = cfgmod.parse_config(toml)
    # Camera angles live in the spherical chart here (theta = -pi looks at
    # the hole, like the other Schwarzschild kernel tests).
    opts = cfgmod.RenderOptions(
        width=16,
        height=8,
        max_steps=4000,
        max_radius=30.0,
        step_size=0.05,
        camera_position=(-10.0, 0.0, -0.5),
        theta=-np.pi,
    )
    scene = cfgmod.create_scene(cfg, opts)
    assert fast_path.supports_scene(scene)
    spec = fast_path.scene_kernel_spec(scene)
    assert len(spec.vols) == 1 and not spec.opaque

    rr, cc = np.meshgrid(np.arange(8.0), np.arange(16.0), indexing="ij")
    x, p = cam.pixel_rays(scene.camera, jnp.asarray(rr.ravel()), jnp.asarray(cc.ravel()))
    ref = scn.trace_rays(scene, x, p)
    fast = fast_path.trace_rays_fast(scene, x, p, interpret=True, spec=spec)

    agree = np.asarray(ref.stop_code) == np.asarray(fast.stop_code)
    assert agree.mean() >= 0.95
    hit_ref = np.asarray(ref.ray_class) == scn.HIT
    hit_fast = np.asarray(fast.ray_class) == scn.HIT
    assert hit_ref.any()
    assert (hit_ref == hit_fast).mean() >= 0.95
    tone = lambda c: c / (1.0 + c)
    both = agree & (hit_ref == hit_fast)
    err = np.abs(tone(np.asarray(ref.color))[both] - tone(np.asarray(fast.color))[both])
    assert err.mean() < 1e-2


def _two_leg_vs_single(scene, x, p):
    """March in two bounded-attempt legs via the kernels' checkpoint/resume
    inputs and compare against the single-shot march, bit for bit.

    attempts0 is derived from the single-shot march (half the slowest lane's
    step count — with the fixed-step kernels an active lane advances once per
    in-kernel iteration, so the slowest lane is guaranteed still RUNNING
    after leg 1) rather than hard-coded per scene: changes to far-field /
    opaque-stop defaults can't silently make the resume assertion vacuous."""
    from gr_raytracer_tpu.rendering import integrator as integ

    spec = fast_path.scene_kernel_spec(scene)
    geo, solver, y0, _, _ = fast_path._prepare_march(scene, x, p)
    cfg = scene.integration
    single = fast_path._run_kernel(geo, cfg, solver, y0, spec, interpret=True)
    slowest = int(np.asarray(single[2]).max())
    assert slowest >= 2, "probe scene retires every lane instantly; resume vacuous"
    attempts0 = max(1, slowest // 2)
    leg1 = fast_path._run_kernel(
        geo, cfg, solver, y0, spec, interpret=True, attempts=attempts0, finalize=False
    )
    # The derived budget must leave some lanes mid-march, or resume is vacuous.
    assert (np.asarray(leg1[1]) == integ.RUNNING).any()
    leg2 = fast_path._run_kernel(
        geo, cfg, solver, leg1[0], spec, interpret=True, resume=leg1
    )
    for name, a, b in zip(
        ("y", "stop", "steps", "ev_kind", "ev_data", "ev_count", "ev_overflow"),
        leg2,
        single,
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_kernel_march_resume_ks():
    """The KS kernel's attempts/resume/finalize inputs give checkpointable
    marches: two resumed legs == one shot, bit-identical (per-lane steps,
    events and stop codes carry over; max_steps stays the TOTAL budget).
    This is the primitive for preemption-tolerant deep-budget renders.
    (The phased-requeue orchestration once built on it was measured slower
    than single dispatch in every regime and removed — fast_path.py has the
    numbers.)"""
    scene, x, p = flagship(8, 16)
    _two_leg_vs_single(scene, x, p)


def test_kernel_march_resume_bl():
    """Resume through the BL/Mino kernel: the per-lane conserved (E, L_z, Q)
    solver rides along unchanged and the Mino-time march continues each
    lane's identical fixed-step trajectory."""
    scene, x, p = kerr_bl_scene(8, 16)
    _two_leg_vs_single(scene, x, p)


def test_kernel_multi_crossing_event_buffer():
    """Photon-ring grazers cross the equatorial disc on every half-winding;
    with opaque-stop disabled the kernel's K-slot buffer must record the
    multi-crossing sequence and reproduce the lax fold's higher-order image
    colors (VERDICT r1 item 5, kernel side)."""
    from tests.test_raytracer import _photon_disc_scene, _RING_ROW, _RING_COLS

    scene = _photon_disc_scene(max_steps=8000)
    rr = np.full(_RING_COLS.size, _RING_ROW)
    x, p = cam.pixel_rays(scene.camera, jnp.asarray(rr), jnp.asarray(_RING_COLS))
    spec = fast_path.scene_kernel_spec(scene)._replace(opaque=False)

    res, freq, solver, inverse, n = fast_path._march_scene(
        scene, x, p, interpret=True, spec=spec
    )
    counts = np.asarray(res.ev_count[np.asarray(inverse)][:n])
    assert counts.max() >= 3, f"expected >=3 kernel crossings, max={counts.max()}"
    assert not np.asarray(res.ev_overflow).any()

    ref = scn.trace_rays(scene, x, p)
    fast = fast_path.trace_rays_fast(scene, x, p, interpret=True, spec=spec)
    agree = stop_agree_mask(ref, fast)
    multi = (counts >= 3) & agree
    assert multi.any()
    tone = lambda c: c / (1.0 + c)
    err = np.abs(
        tone(np.asarray(ref.color))[multi] - tone(np.asarray(fast.color))[multi]
    )
    # Different integrators (RKF45 vs fixed-cadence RK4) land crossings at
    # slightly different radii; the checker cells bound the bulk error.
    assert np.median(err.max(axis=-1)) < 0.05


def test_compensated_march_matches_plain():
    """Kahan-compensated state accumulation (the deep-budget drift
    mitigation, fast_path.DEEP_BUDGET_COMPENSATION) must reproduce the
    plain march: identical stop codes/steps/events, states equal to f32
    summation noise — at short budgets the compensation is pure rounding
    bookkeeping, not a different integrator."""
    scene, x, p = flagship(8, 16)
    spec = fast_path.scene_kernel_spec(scene)
    geo, solver, y0, _, _ = fast_path._prepare_march(scene, x, p)
    cfg = scene.integration
    kw = dict(
        h0=1.0, max_steps=cfg.max_steps, max_radius=cfg.max_radius,
        discs=spec.discs, r_safe=spec.r_safe, opaque_stop=spec.opaque,
        interpret=True,
    )
    plain = gp.kerr_rk4_march(geo.radius, geo.a, geo.horizon_epsilon, y0, **kw)
    comp = gp.kerr_rk4_march(
        geo.radius, geo.a, geo.horizon_epsilon, y0, compensated=True, **kw
    )
    np.testing.assert_array_equal(np.asarray(plain[1]), np.asarray(comp[1]))  # stop
    np.testing.assert_array_equal(np.asarray(plain[2]), np.asarray(comp[2]))  # steps
    np.testing.assert_array_equal(np.asarray(plain[3]), np.asarray(comp[3]))  # kinds
    finite = np.isfinite(np.asarray(plain[0]))
    np.testing.assert_allclose(
        np.asarray(comp[0])[finite], np.asarray(plain[0])[finite], rtol=1e-4, atol=1e-4
    )


def test_analytic_rhs_matches_autodiff():
    """The hand-derived Kerr-Schild ∂H/∂x in gp._rhs must match the jax.grad
    specification (gp._rhs_autodiff) to f64 roundoff at random states."""
    import numpy as np

    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.normal(size=(8, 256)) * 3.0)
    y = y.at[1:4].add(jnp.sign(y[1:4]) * 2.0)  # keep off the ring singularity
    for a in (0.0, 0.45, 0.9):
        ref = np.asarray(gp._rhs_autodiff(1.0, a, y))
        got = np.asarray(gp._rhs(1.0, a, y))
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_kernel_atan2_matches_numpy_including_origin():
    """The kernel's primitive atan2 must match libm on every quadrant, the
    axes, AND the origin: an event exactly on the axis (e.g. a volumetric cap
    crossing at x = y = 0) must produce a defined UV, not NaN (r2 verdict
    weak #8)."""
    vals = jnp.asarray([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0])
    yy, xx = jnp.meshgrid(vals, vals, indexing="ij")
    got = np.asarray(gp._atan2(yy, xx))
    want = np.arctan2(np.asarray(yy), np.asarray(xx))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, atol=5e-7)
    assert float(gp._atan2(jnp.asarray(0.0), jnp.asarray(0.0))) == 0.0
