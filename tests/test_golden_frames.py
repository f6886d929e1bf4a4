"""Frame-level golden regressions: 16×16 f64 renders (full driver path incl.
adaptive supersampling) pinned against committed .npz goldens.

Complements the per-pixel exact-CIE golden tests (test_scene_golden.py) by
covering the whole driver: chunking, requeue phases, AA selection + jitter,
shading, fold. Regenerate via the generator block at the bottom after an
INTENTIONAL behavior change."""

import os

import numpy as np
import pytest

from gr_raytracer_tpu import config as cfgmod
from gr_raytracer_tpu.rendering import raytracer as rt

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

SCENES = {
    "euclidean_sphere": (
        """
celestial_temperature = 0.0
[celestial_texture.Checker]
beaming_exponent = 0.0
width = 18.0
height = 9.0
color1 = [0, 255, 0]
color2 = [0, 100, 0]
[geometry_type.Euclidean]
[[objects]]
[objects.Sphere]
radius = 2.0
position = [0.0, 0.0, 0.0]
temperature = 0.0
[objects.Sphere.texture.Checker]
beaming_exponent = 0.0
width = 8.0
height = 8.0
color1 = [255, 0, 0]
color2 = [100, 0, 0]
""",
        dict(camera_position=(10.0, 0.0, 0.0)),
    ),
    "schwarzschild_disc": (
        """
celestial_temperature = 0.0
[celestial_texture.Checker]
beaming_exponent = 0.0
width = 18.0
height = 9.0
color1 = [30, 30, 90]
color2 = [4, 4, 12]
[geometry_type.Schwarzschild]
radius = 1.0
horizon_epsilon = 1e-4
[[objects]]
[objects.Disc]
inner_radius = 3.0
outer_radius = 6.0
temperature = 4000.0
[objects.Disc.texture.BlackBody]
beaming_exponent = 3.0
""",
        dict(camera_position=(-10.0, 0.0, -0.8), theta=-np.pi),
    ),
    "kerr_bl_disc": (
        """
celestial_temperature = 0.0
[celestial_texture.Checker]
beaming_exponent = 0.0
width = 18.0
height = 9.0
color1 = [30, 30, 90]
color2 = [4, 4, 12]
[geometry_type.KerrBL]
radius = 1.0
a = 0.45
horizon_epsilon = 1e-3
[[objects]]
[objects.Disc]
inner_radius = 2.0
outer_radius = 6.0
temperature = 4000.0
[objects.Disc.texture.BlackBody]
beaming_exponent = 3.0
""",
        dict(camera_position=(-10.0, 0.0, -0.8), theta=-np.pi),
    ),
    # Kerr (Kerr-Schild chart) — Hamiltonian solver + disc + sphere: guards
    # the KS driver path and multi-object nearest-hit inside the loop.
    "kerr_ks_disc_sphere": (
        """
celestial_temperature = 0.0
[celestial_texture.Checker]
beaming_exponent = 0.0
width = 18.0
height = 9.0
color1 = [30, 30, 90]
color2 = [4, 4, 12]
[geometry_type.Kerr]
radius = 1.0
a = 0.45
horizon_epsilon = 1e-3
[[objects]]
[objects.Disc]
inner_radius = 2.0
outer_radius = 6.0
temperature = 4000.0
[objects.Disc.texture.BlackBody]
beaming_exponent = 3.0
[[objects]]
[objects.Sphere]
radius = 1.0
position = [0.0, 4.0, 1.5]
temperature = 0.0
[objects.Sphere.texture.Checker]
beaming_exponent = 0.0
width = 8.0
height = 8.0
color1 = [255, 120, 0]
color2 = [120, 40, 0]
""",
        dict(camera_position=(-10.0, 0.0, -0.5), theta=1.52, psi=-1.57),
    ),
    # Volumetric disc (small march budget): guards the split driver +
    # raymarch shading end to end.
    "schwarzschild_volumetric": (
        """
celestial_temperature = 0.0
[celestial_texture.Checker]
beaming_exponent = 0.0
width = 18.0
height = 9.0
color1 = [30, 30, 90]
color2 = [4, 4, 12]
[geometry_type.Schwarzschild]
radius = 1.0
horizon_epsilon = 1e-4
[[objects]]
[objects.VolumetricDisc]
inner_radius = 2.0
outer_radius = 6.0
thickness = 0.5
num_octaves = 2
perlin_seed = 7
max_steps = 400
step_size = 0.02
density_multiplier = 8.0
brightness_reference_temperature = 4000.0
absorption = 0.6
scattering = 0.4
noise_scale = [1.0, 1.0, 1.0]
noise_offset = 0.0
axis = [0.0, 0.0, 1.0]
temperature = 4000.0
[objects.VolumetricDisc.texture.BlackBody]
beaming_exponent = 0.0
""",
        dict(camera_position=(-10.0, 0.0, -0.8), theta=-np.pi),
    ),
}


def render(name):
    toml, okw = SCENES[name]
    cfg = cfgmod.parse_config(toml)
    opts = cfgmod.RenderOptions(
        width=16, height=16, max_steps=4000, max_radius=30.0, step_size=0.05, **okw
    )
    scene = cfgmod.create_scene(cfg, opts)
    return rt.render_section(scene, chunk_size=256)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_golden_frame(name):
    out = render(name)
    golden = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
    np.testing.assert_array_equal(out.ray_class, golden["ray_class"])
    np.testing.assert_allclose(out.color, golden["color"], rtol=1e-9, atol=1e-9)


if __name__ == "__main__":
    # Golden regeneration — run ONLY after an intentional behavior change:
    #   python -m tests.test_golden_frames [name ...]
    import sys

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    names = sys.argv[1:] or sorted(SCENES)
    for name in names:
        out = render(name)
        path = os.path.join(GOLDEN_DIR, f"{name}.npz")
        np.savez_compressed(path, color=out.color, ray_class=out.ray_class)
        print(f"wrote {path}")
