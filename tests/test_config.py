"""Config loader tests: TOML parsing of every reference scene file,
validation rejects, scene assembly, camera-velocity resolution, plus the
exact blackbody sRGB swatch oracles.

Mirrors configuration.rs:232-455 and black_body_radiation.rs:63-73."""

import glob

import jax.numpy as jnp
import numpy as np
import pytest

from gr_raytracer_tpu import config as cfgmod
from gr_raytracer_tpu.geometry.kerr_bl import KerrBL
from gr_raytracer_tpu.geometry.schwarzschild import Schwarzschild
from gr_raytracer_tpu.rendering import scene as scn
from gr_raytracer_tpu.rendering.blackbody import blackbody_xyz
from gr_raytracer_tpu.rendering.color import xyz_to_srgb8

from gr_raytracer_tpu.utils import assets

REFERENCE_SCENES = sorted(glob.glob(assets.scene_definitions_dir() + "/*.toml"))
# A missing asset directory would silently collapse the parametrized suites
# to zero tests — fail loudly instead (the repo vendors 14 scenes).
assert len(REFERENCE_SCENES) >= 14, f"scene assets missing: {assets.scene_definitions_dir()}"

CHECKER_SCENE = """
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
[objects.Disc]
inner_radius = 3.0
outer_radius = 5.0
temperature = 2000.0
[objects.Disc.texture.BlackBody]
beaming_exponent = 0.0

[[objects]]
[objects.Sphere]
radius = 1.5
position = [0.0, 0.0, 20.0]
temperature = 0.0
[objects.Sphere.texture.Checker]
beaming_exponent = 0.0
width = 4.0
height = 4.0
color1 = [255, 0, 0]
color2 = [100, 0, 0]
"""


@pytest.mark.parametrize("path", REFERENCE_SCENES, ids=lambda p: p.split("/")[-1])
def test_reference_scene_files_parse(path):
    cfg = cfgmod.load_config(path)
    assert cfg.geometry_type["kind"] in (
        "Euclidean",
        "EuclideanSpherical",
        "Schwarzschild",
        "Kerr",
        "KerrBL",
    )
    for obj in cfg.objects:
        assert obj["kind"] in ("Sphere", "Disc", "VolumetricDisc")
        assert "texture" in obj


def test_parse_defaults():
    cfg = cfgmod.parse_config("[geometry_type.Euclidean]")
    assert cfg.celestial_texture == {"kind": "BlackBody", "beaming_exponent": 0.0}
    assert cfg.camera_velocity == {"kind": "StaticObserver"}
    assert cfg.adaptive_sampling.enabled
    assert cfg.adaptive_sampling.samples_per_axis == 4
    assert cfg.adaptive_sampling.luminance_contrast_threshold == 0.15
    assert cfg.adaptive_sampling.opacity_contrast_threshold == 0.1


def test_parse_rejects_missing_geometry():
    with pytest.raises(cfgmod.ConfigError, match="geometry_type"):
        cfgmod.parse_config("celestial_temperature = 1.0")


def test_parse_rejects_unknown_geometry():
    with pytest.raises(cfgmod.ConfigError, match="unknown geometry_type"):
        cfgmod.parse_config("[geometry_type.Minkowski]")


def test_adaptive_sampling_boundary_and_partial_values():
    """Boundary threshold values (0 and 1) parse and validate; a partial
    adaptive_sampling block keeps defaults for the unspecified fields
    (configuration.rs adaptive_sampling_accepts_boundary_values /
    _partial_config_uses_defaults)."""
    cfg = cfgmod.parse_config(
        "[geometry_type.Euclidean]\n[adaptive_sampling]\n"
        "luminance_contrast_threshold = 0.0\nopacity_contrast_threshold = 1.0\n"
        "object_hit_opacity_threshold = 1.0\n"
    )
    a = cfg.adaptive_sampling
    assert a.luminance_contrast_threshold == 0.0
    assert a.opacity_contrast_threshold == 1.0
    assert a.object_hit_opacity_threshold == 1.0
    # Unspecified fields keep the reference defaults.
    assert a.enabled and a.samples_per_axis == 4
    assert a.exclude_background_contrast


def test_parse_rejects_bad_adaptive_sampling():
    bad = "[geometry_type.Euclidean]\n[adaptive_sampling]\nsamples_per_axis = 0\n"
    with pytest.raises(cfgmod.ConfigError, match="samples_per_axis"):
        cfgmod.parse_config(bad)
    bad2 = "[geometry_type.Euclidean]\n[adaptive_sampling]\nluminance_contrast_threshold = 1.5\n"
    with pytest.raises(cfgmod.ConfigError, match="luminance_contrast_threshold"):
        cfgmod.parse_config(bad2)


def test_create_scene_from_toml():
    cfg = cfgmod.parse_config(CHECKER_SCENE)
    opts = cfgmod.RenderOptions(width=8, height=8, camera_position=(-10.0, 0.0, -0.5))
    scene = cfgmod.create_scene(cfg, opts)
    assert isinstance(scene.geometry, Schwarzschild)
    assert len(scene.objects) == 2
    assert scene.camera.rows == 8
    # Camera position was converted to the spherical chart: r ≈ 10.012.
    np.testing.assert_allclose(float(scene.camera.position[1]), np.sqrt(100.25), rtol=1e-12)
    # Disc temperature model is the Novikov-Thorne LUT for a BH geometry.
    assert hasattr(scene.objects[0].temperature_model, "r_isco")


def test_explicit_velocity_normalization_rejected():
    toml = CHECKER_SCENE + "\n[camera_velocity.Explicit]\ncomponents = [2.0, 0.0, 0.0, 0.0]\n"
    cfg = cfgmod.parse_config(toml)
    opts = cfgmod.RenderOptions(width=4, height=4, camera_position=(-10.0, 0.0, -0.5))
    with pytest.raises(cfgmod.ConfigError, match="not normalized"):
        cfgmod.create_scene(cfg, opts)


def test_zamo_velocity_accepted():
    toml = (
        CHECKER_SCENE.replace(
            "[geometry_type.Schwarzschild]\nradius = 1.0",
            "[geometry_type.KerrBL]\nradius = 1.0\na = 0.4",
        )
        + '\ncamera_velocity = "Zamo"\n'
    )
    cfg = cfgmod.parse_config(toml)
    opts = cfgmod.RenderOptions(width=4, height=4, camera_position=(-10.0, 0.0, -0.5))
    scene = cfgmod.create_scene(cfg, opts)
    assert isinstance(scene.geometry, KerrBL)
    u = scene.camera.velocity
    norm = float(scene.geometry.inner_product(scene.camera.position, u, u))
    np.testing.assert_allclose(norm, -1.0, atol=1e-10)


def test_end_to_end_render_from_config():
    from gr_raytracer_tpu.rendering import raytracer as rt

    cfg = cfgmod.parse_config(CHECKER_SCENE)
    opts = cfgmod.RenderOptions(
        width=7,
        height=7,
        max_steps=3000,
        max_radius=30.0,
        step_size=0.05,
        camera_position=(-10.0, 0.0, 0.0),
        theta=-np.pi,
    )
    scene = cfgmod.create_scene(cfg, opts)
    scene = scene.replace(adaptive=scene.adaptive)
    out = rt.render_section(scene, chunk_size=64)
    assert out.color.shape == (7, 7, 4)
    # Center ray plunges into the hole -> captured black; some rays escape.
    assert out.ray_class[3, 3] == scn.CAPTURED
    assert np.all(out.color[3, 3, :3] == 0.0)
    assert (out.ray_class == scn.ESCAPED).any()


# ---------------------------------------------------------------------------
# Blackbody sRGB swatches (black_body_radiation.rs:63-73, exact)
# ---------------------------------------------------------------------------


def swatch(temperature):
    xyz = np.asarray(blackbody_xyz(jnp.asarray(float(temperature), jnp.float64)))[:3]
    exposure = 1.0 / xyz.sum()
    return tuple(int(v) for v in np.asarray(xyz_to_srgb8(jnp.asarray(xyz), exposure=exposure)))


def test_blackbody_swatch_red_1000k():
    assert swatch(1000.0) == (255, 60, 0)


def test_blackbody_swatch_blue_10000k():
    assert swatch(10000.0) == (137, 146, 172)


REFERENCE_SCENE_CAMERAS = {
    # Per-geometry facing angles (docs/examples.md; the tetrad forward axis
    # differs per chart).
    "Euclidean": dict(camera_position=(10.0, 0.0, 0.0)),
    "EuclideanSpherical": dict(camera_position=(10.0, 0.0, 0.0)),  # z = -r̂, faces inward
    "Schwarzschild": dict(camera_position=(-10.0, 0.0, -0.5), theta=-np.pi),
    "Kerr": dict(camera_position=(-10.0, 0.0, -0.5), theta=1.52, psi=-1.57),
    "KerrBL": dict(camera_position=(-10.0, 0.0, -0.5), theta=-np.pi),
}


def _reference_scenes(volumetric):
    out = []
    for path in REFERENCE_SCENES:
        cfg = cfgmod.load_config(path)
        has_vol = any(o["kind"] == "VolumetricDisc" for o in cfg.objects)
        if has_vol == volumetric:
            out.append(path)
    return out


@pytest.mark.parametrize(
    "path", _reference_scenes(volumetric=False), ids=lambda p: p.rsplit("/", 1)[-1]
)
def test_reference_scene_renders_end_to_end(path):
    """Every non-volumetric upstream scene file renders end to end (6×6,
    small budget) and classifies sensibly — completeness beyond the
    parse-only check above. (Volumetric scenes carry a 50k-step marcher
    that is too slow for CPU f64 CI; their build is pinned below and their
    render path by test_volumetric/test_pallas.)"""
    from gr_raytracer_tpu.rendering import raytracer as rt
    from gr_raytracer_tpu.rendering import scene as scn

    cfg = cfgmod.load_config(path)
    opts = cfgmod.RenderOptions(
        width=6, height=6, max_steps=400, max_radius=30.0, step_size=0.05,
        **REFERENCE_SCENE_CAMERAS[cfg.geometry_type["kind"]],
    )
    scene = cfgmod.create_scene(cfg, opts)
    out = rt.render_section(scene, chunk_size=64)
    assert out.color.shape == (6, 6, 4)
    assert np.isfinite(out.color).all()
    # Every scene points the camera at the hole/sphere: rays must both
    # escape (celestial) and terminate on something.
    assert (out.ray_class == scn.ESCAPED).any()
    assert (out.ray_class != scn.ESCAPED).any()


@pytest.mark.parametrize(
    "path", _reference_scenes(volumetric=True), ids=lambda p: p.rsplit("/", 1)[-1]
)
def test_all_reference_volumetric_scenes_build(path):
    """All upstream volumetric scenes build (validation, textures, noise
    tables, temperature LUTs)."""
    cfg = cfgmod.load_config(path)
    opts = cfgmod.RenderOptions(
        width=4, height=4, max_steps=100, max_radius=30.0, step_size=0.05,
        **REFERENCE_SCENE_CAMERAS[cfg.geometry_type["kind"]],
    )
    scene = cfgmod.create_scene(cfg, opts)
    assert len(scene.objects) >= 1
