"""Shared test-scene builder mirroring the reference's test_scene module
(scene.rs:234-370): checker textures, sphere at the origin + thin disc,
30000-step / r=10000 integration budget."""

import jax.numpy as jnp

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.objects.disc import Disc
from gr_raytracer_tpu.objects.sphere import Sphere
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import integrator as integ
from gr_raytracer_tpu.rendering import scene as scn
from gr_raytracer_tpu.rendering.temperature import ConstantTemperature, build_disc_temperature
from gr_raytracer_tpu.rendering.texture import CheckerMap

CELESTIAL_SPHERE_RADIUS = 10000.0

# Golden CIE constants (scene.rs:386-405).
CELESTIAL_SPHERE_COLOR_1 = (0.04556866876322511, 0.09113733752645022, 0.015189552006485689, 1.0)
CELESTIAL_SPHERE_COLOR_2 = (0.3575761, 0.7151522, 0.119192, 1.0)
SPHERE_COLOR_2 = (0.4124564, 0.2126729, 0.0193339, 1.0)


def build_test_scene(
    geometry,
    camera,
    sphere_radius=2.0,
    disc_inner=0.2,
    disc_outer=0.3,
    epsilon=1e-12,
    max_events=8,
):
    celestial = CheckerMap.from_srgb(0.0, 100.0, 100.0, (0, 255, 0), (0, 100, 0))
    disc_tex = CheckerMap.from_srgb(0.0, 200.0, 10.0, (0, 0, 255), (0, 0, 100))
    sphere_tex = CheckerMap.from_srgb(0.0, 10.0, 10.0, (255, 0, 0), (100, 0, 0))

    if hasattr(geometry, "radius") and float(geometry.radius) > 0.0:
        temp_model = build_disc_temperature(
            geometry.radius, getattr(geometry, "a", 0.0), 0.0, disc_outer
        )
    else:
        temp_model = ConstantTemperature(value=jnp.asarray(0.0))

    objects = (
        Sphere(
            radius=jnp.asarray(sphere_radius),
            center=jnp.zeros(4),
            temperature=jnp.asarray(0.0),
            texture=sphere_tex,
        ),
        Disc(
            inner_radius=jnp.asarray(disc_inner),
            outer_radius=jnp.asarray(disc_outer),
            temperature_model=temp_model,
            texture=disc_tex,
        ),
    )
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(CELESTIAL_SPHERE_RADIUS),
        step_size=jnp.asarray(0.001),
        epsilon=jnp.asarray(epsilon),
        max_steps=30000,
        max_events=max_events,
    )
    return scn.Scene(
        geometry=geometry,
        camera=camera,
        objects=objects,
        celestial_map=celestial,
        celestial_temperature=jnp.asarray(0.0),
        integration=cfg,
    )


def trace_pixel(scene, row, col):
    x, p = cam.pixel_rays(
        scene.camera, jnp.asarray([float(row)]), jnp.asarray([float(col)])
    )
    return scn.trace_rays(scene, x, p)
