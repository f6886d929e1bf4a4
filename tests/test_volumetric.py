"""Volumetric disc tests: Perlin noise properties, density bounds, bounding-
volume intersection, raymarch behavior, config construction + validation.

Mirrors volumetric_disc.rs in-module tests (:626-786) at the behavior level
(the Perlin implementation is seed-compatible with itself, not bit-matched to
the Rust `noise` crate — SURVEY.md stage 9)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gr_raytracer_tpu import config as cfgmod
from gr_raytracer_tpu.geometry.schwarzschild import Schwarzschild
from gr_raytracer_tpu.objects.volumetric_disc import VolumetricDisc, build_volumetric_disc
from gr_raytracer_tpu.ops import noise
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import scene as scn
from gr_raytracer_tpu.rendering.redshift import ray_frequency_data
from gr_raytracer_tpu.rendering.temperature import ConstantTemperature
from gr_raytracer_tpu.rendering.texture import BlackBodyMap, CheckerMap


def make_disc(**kw):
    args = dict(
        inner_radius=2.0,
        outer_radius=6.0,
        temperature_model=ConstantTemperature(value=jnp.asarray(5000.0)),
        texture=BlackBodyMap.create(0.0),
        num_octaves=4,
        perlin_seed=7,
        max_steps=2000,
        step_size=0.01,
        thickness=0.1,
        density_multiplier=100.0,
        brightness_reference_temperature=1000.0,
        absorption=0.3,
        scattering=0.4,
        noise_scale=(2.0, 2.0, 2.0),
        noise_offset=0.0,
    )
    args.update(kw)
    return VolumetricDisc.create(**args)


# ---------------------------------------------------------------------------
# Perlin noise
# ---------------------------------------------------------------------------


def test_perlin_zero_at_lattice_and_bounded():
    perm = jnp.asarray(noise.permutation_table(3))
    lattice = jnp.asarray([[0.0, 1.0, 2.0], [5.0, -3.0, 7.0]])
    np.testing.assert_allclose(np.asarray(noise.perlin3(perm, lattice)), 0.0, atol=1e-12)
    rng = np.random.RandomState(0)
    p = jnp.asarray(rng.uniform(-20, 20, size=(4096, 3)))
    v = np.asarray(noise.perlin3(perm, p))
    assert np.all(np.abs(v) <= 1.0 + 1e-9)
    assert v.std() > 0.05  # non-degenerate field


def test_perlin_seed_determinism():
    p = jnp.asarray(np.random.RandomState(1).uniform(-5, 5, size=(64, 3)))
    a = np.asarray(noise.perlin3(jnp.asarray(noise.permutation_table(11)), p))
    b = np.asarray(noise.perlin3(jnp.asarray(noise.permutation_table(11)), p))
    c = np.asarray(noise.perlin3(jnp.asarray(noise.permutation_table(12)), p))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3


def test_perlin_continuity_across_cell_edges():
    perm = jnp.asarray(noise.permutation_table(5))
    eps = 1e-6
    below = jnp.asarray([[1.0 - eps, 0.3, 0.7]])
    above = jnp.asarray([[1.0 + eps, 0.3, 0.7]])
    assert abs(float((noise.perlin3(perm, below) - noise.perlin3(perm, above))[0])) < 1e-4


# ---------------------------------------------------------------------------
# Density
# ---------------------------------------------------------------------------


def test_density_zero_outside_bounds():
    disc = make_disc()
    pts = jnp.asarray(
        [
            [1.0, 0.0, 0.0],  # inside inner radius
            [7.0, 0.0, 0.0],  # outside outer radius
            [4.0, 0.0, 1.0],  # far above the slab (10 sigma)
        ]
    )
    np.testing.assert_array_equal(np.asarray(disc.density(pts)), 0.0)


def test_density_nonnegative_and_sometimes_positive():
    disc = make_disc(noise_offset=0.3)
    rng = np.random.RandomState(2)
    r = rng.uniform(2.2, 5.8, 512)
    phi = rng.uniform(-np.pi, np.pi, 512)
    z = rng.uniform(-0.05, 0.05, 512)
    pts = jnp.asarray(np.stack([r * np.cos(phi), r * np.sin(phi), z], axis=-1))
    d = np.asarray(disc.density(pts))
    assert np.all(d >= 0.0)
    assert (d > 0.0).sum() > 100


def test_density_seamless_at_phi_pi():
    """The cylindrical noise mapping removes the φ seam: density is continuous
    across φ = ±π (volumetric_disc.rs:119-131)."""
    disc = make_disc(noise_offset=0.5)
    eps = 1e-7
    r = 4.0
    below = jnp.asarray([[r * np.cos(np.pi - eps), r * np.sin(np.pi - eps), 0.02]])
    above = jnp.asarray([[r * np.cos(-np.pi + eps), r * np.sin(-np.pi + eps), 0.02]])
    assert abs(float((disc.density(below) - disc.density(above))[0])) < 1e-3


# ---------------------------------------------------------------------------
# Bounding-volume intersection
# ---------------------------------------------------------------------------


def seg(a, b):
    a4 = jnp.asarray([[0.0, *a]])
    b4 = jnp.asarray([[0.0, *b]])
    return a4, b4


def test_segment_hits_outer_cylinder_from_outside():
    disc = make_disc()
    hit, t, point, uv = disc.segment_hit(*seg((10.0, 0.0, 0.0), (0.0, 0.0, 0.0)))
    assert bool(hit[0])
    np.testing.assert_allclose(float(point[0, 0]), 6.0, atol=1e-9)  # outer radius


def test_segment_hits_cap_from_above():
    disc = make_disc()
    hit, t, point, uv = disc.segment_hit(*seg((4.0, 0.0, 1.0), (4.0, 0.0, -1.0)))
    assert bool(hit[0])
    np.testing.assert_allclose(float(point[0, 2]), 0.3, atol=1e-9)  # +3·thickness cap


def test_segment_misses_through_hole():
    disc = make_disc()
    # Straight down the axis, inside the inner radius: no boundary crossed.
    hit, *_ = disc.segment_hit(*seg((0.5, 0.0, 1.0), (0.5, 0.0, -1.0)))
    assert not bool(hit[0])


def test_segment_miss_far_away():
    disc = make_disc()
    hit, *_ = disc.segment_hit(*seg((10.0, 10.0, 5.0), (11.0, 10.0, 5.0)))
    assert not bool(hit[0])


# ---------------------------------------------------------------------------
# Raymarch
# ---------------------------------------------------------------------------


def flat_freq(n=1):
    # (+,−,−,−) signature: for a future-directed photon both the observer
    # energy and p_t = <∂_t, p> are positive, giving a positive redshift.
    return (
        jnp.ones((n,)),  # obs energy
        jnp.ones((n,)),  # p_t
        jnp.zeros((n,)),  # p_phi
    )


def test_raymarch_inactive_lane_is_transparent_black():
    disc = make_disc()
    geometry = Schwarzschild(radius=jnp.asarray(1.0), horizon_epsilon=jnp.asarray(1e-4))
    ro = jnp.asarray([[6.0, 0.0, 0.0]])
    rd = jnp.asarray([[-1.0, 0.0, 0.0]])
    obs, pt, pphi = flat_freq()
    out = disc.raymarch(geometry, ro, rd, obs, pt, pphi, jnp.asarray([False]))
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_raymarch_through_gas_accumulates_emission_and_opacity():
    disc = make_disc(noise_offset=0.6)
    geometry = Schwarzschild(radius=jnp.asarray(0.2), horizon_epsilon=jnp.asarray(1e-4))
    ro = jnp.asarray([[6.0, 0.0, 0.0]])
    rd = jnp.asarray([[-1.0, 0.0, 0.0]])
    obs, pt, pphi = flat_freq()
    out = np.asarray(disc.raymarch(geometry, ro, rd, obs, pt, pphi, jnp.asarray([True])))
    assert np.all(np.isfinite(out))
    assert out[0, 3] > 0.01  # accumulated opacity
    assert out[0, 1] > 0.0  # emitted luminance
    assert out[0, 3] <= 1.0


def test_raymarch_no_emission_without_timelike_orbit():
    """Gas inside the photon sphere attenuates but emits nothing
    (volumetric_disc.rs:292-296)."""
    # Big hole: photon sphere at 1.5 r_s = 7.5 covers the whole disc.
    disc = make_disc(noise_offset=0.6)
    geometry = Schwarzschild(radius=jnp.asarray(5.0), horizon_epsilon=jnp.asarray(1e-4))
    ro = jnp.asarray([[6.0, 0.0, 0.0]])
    rd = jnp.asarray([[-1.0, 0.0, 0.0]])
    obs, pt, pphi = flat_freq()
    out = np.asarray(disc.raymarch(geometry, ro, rd, obs, pt, pphi, jnp.asarray([True])))
    assert np.all(out[0, :3] == 0.0)
    assert out[0, 3] > 0.0  # still attenuates


# ---------------------------------------------------------------------------
# End-to-end + config
# ---------------------------------------------------------------------------

VOLUMETRIC_SCENE = """
celestial_temperature = 0.0

[celestial_texture.Checker]
beaming_exponent = 0.0
width = 10.0
height = 10.0
color1 = [0, 255, 0]
color2 = [0, 100, 0]

[geometry_type.Schwarzschild]
radius = 1.0
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


def test_volumetric_scene_end_to_end():
    cfg = cfgmod.parse_config(VOLUMETRIC_SCENE)
    opts = cfgmod.RenderOptions(
        width=5,
        height=5,
        max_steps=4000,
        max_radius=30.0,
        step_size=0.05,
        camera_position=(-12.0, 0.0, -1.5),
        theta=-np.pi + 0.12,  # tilted view through the slab
    )
    scene = cfgmod.create_scene(cfg, opts)
    x, p = cam.full_grid_rays(scene.camera)
    out = scn.trace_rays(scene, x, p)
    color = np.asarray(out.color)
    assert np.all(np.isfinite(color))
    # At least one ray passes through gas and picks up volumetric emission.
    assert (np.asarray(out.stop_code) == 2).any() or (np.asarray(out.stop_code) == 1).any()
    assert color[..., :3].max() > 0.0


def test_volumetric_config_validation():
    disc_cfg = dict(
        kind="VolumetricDisc",
        inner_radius=3.0,
        outer_radius=2.0,  # invalid
        temperature=5000.0,
        num_octaves=3,
        max_steps=100,
        step_size=0.01,
        thickness=0.1,
        density_multiplier=1.0,
        brightness_reference_temperature=1000.0,
        absorption=0.3,
        scattering=0.4,
        noise_scale=(1.0, 1.0, 1.0),
        noise_offset=0.0,
    )
    geometry = Schwarzschild(radius=jnp.asarray(1.0), horizon_epsilon=jnp.asarray(1e-4))
    tex = CheckerMap.from_srgb(0.0, 2.0, 2.0, (255, 0, 0), (0, 0, 255))
    with pytest.raises(cfgmod.ConfigError, match="outer_radius > inner_radius"):
        build_volumetric_disc(disc_cfg, geometry, tex, jnp.float64)
    disc_cfg["outer_radius"] = 6.0
    disc_cfg["thickness"] = 0.0
    with pytest.raises(cfgmod.ConfigError, match="thickness"):
        build_volumetric_disc(disc_cfg, geometry, tex, jnp.float64)


def test_reference_volumetric_scene_builds():
    from gr_raytracer_tpu.utils import assets

    cfg = cfgmod.load_config(assets.scene_path("schwarzschild-volumetric-streaky.toml"))
    opts = cfgmod.RenderOptions(width=3, height=3, camera_position=(-18.0, 0.0, -1.0))
    scene = cfgmod.create_scene(cfg, opts)
    assert any(hasattr(o, "raymarch") for o in scene.objects)


def test_corner_hashes_bit_identical_to_hash3():
    """noise._corner_hashes shares per-axis lattice products across the 8
    cube corners; it must stay BIT-identical to _hash3 per corner (the noise
    field, and thus every volumetric render, depends on it)."""
    import numpy as np

    from gr_raytracer_tpu.ops import noise

    rng = np.random.default_rng(11)
    xi = jnp.asarray(rng.integers(-10**6, 10**6, 512), jnp.int32)
    yi = jnp.asarray(rng.integers(-10**6, 10**6, 512), jnp.int32)
    zi = jnp.asarray(rng.integers(-10**6, 10**6, 512), jnp.int32)
    key = jnp.uint32(noise.permutation_table(3))
    h = noise._corner_hashes(key, xi, yi, zi)
    one = jnp.int32(1)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ref = noise._hash3(key, xi + dx * one, yi + dy * one, zi + dz * one)
                np.testing.assert_array_equal(np.asarray(h[dx][dy][dz]), np.asarray(ref))
