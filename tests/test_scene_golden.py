"""Golden-value end-to-end pixel tests — exact CIE XYZ oracles from the
reference test suite (scene.rs:416-666)."""

import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry.euclidean import EuclideanSpace
from gr_raytracer_tpu.geometry.euclidean_spherical import EuclideanSpaceSpherical
from gr_raytracer_tpu.geometry.schwarzschild import Schwarzschild
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import scene as scn

from scene_helpers import (
    CELESTIAL_SPHERE_COLOR_2,
    SPHERE_COLOR_2,
    build_test_scene,
    trace_pixel,
)

PI = float(jnp.pi)


def test_hits_sphere_euclidean():
    geometry = EuclideanSpace()
    camera = cam.build_camera(
        geometry,
        jnp.array([0.0, 10.0, 0.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0, 0.0]),
        PI / 2,
        11,
        11,
    )
    scene = build_test_scene(geometry, camera)
    out = trace_pixel(scene, 5, 5)
    assert int(out.ray_class[0]) == scn.HIT
    np.testing.assert_allclose(np.asarray(out.color[0]), SPHERE_COLOR_2, atol=1e-6)


def test_hits_sphere_euclidean_spherical():
    geometry = EuclideanSpaceSpherical()
    position = charts.cartesian_to_spherical(jnp.array([0.0, 0.0, 0.0, -10.0]))
    camera = cam.build_camera(
        geometry, position, jnp.array([1.0, 0.0, 0.0, 0.0]), PI / 2, 11, 11
    )
    scene = build_test_scene(geometry, camera)
    out = trace_pixel(scene, 5, 5)
    np.testing.assert_allclose(
        np.asarray(out.color[0]),
        [0.052562486896837575, 0.0271025410675224, 0.002463867369774764, 1.0],
        atol=1e-6,
    )


def test_hits_sphere_schwarzschild_freefall():
    radius = 1.0
    geometry = Schwarzschild(radius=jnp.asarray(radius), horizon_epsilon=jnp.asarray(1e-4))
    position = jnp.array([0.0, 10.0, PI / 2, 0.0])
    a = 1.0 - radius / 10.0
    velocity = jnp.array([-1.0 / a, -np.sqrt(radius / 10.0), 0.0, 0.0])
    camera = cam.build_camera(geometry, position, velocity, PI / 2, 11, 11)
    scene = build_test_scene(geometry, camera, 2.0, 3.0, 4.0)
    out = trace_pixel(scene, 5, 5)
    np.testing.assert_allclose(np.asarray(out.color[0]), SPHERE_COLOR_2, atol=1e-6)


def test_hits_sphere_schwarzschild_stationary():
    radius = 1.0
    geometry = Schwarzschild(radius=jnp.asarray(radius), horizon_epsilon=jnp.asarray(1e-4))
    position = jnp.array([0.0, 10.0, PI / 2, 0.0])
    a = 1.0 - radius / 10.0
    velocity = jnp.array([-1.0 / np.sqrt(a), 0.0, 0.0, 0.0])
    camera = cam.build_camera(geometry, position, velocity, PI / 2, 11, 11)
    scene = build_test_scene(geometry, camera, 2.0, 3.0, 4.0)
    out = trace_pixel(scene, 5, 5)
    np.testing.assert_allclose(np.asarray(out.color[0]), SPHERE_COLOR_2, atol=1e-6)


def test_misses_sphere_euclidean():
    geometry = EuclideanSpace()
    camera = cam.build_camera(
        geometry,
        jnp.array([0.0, 10.0, 0.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0, 0.0]),
        PI / 2,
        11,
        11,
    )
    scene = build_test_scene(geometry, camera)
    out = trace_pixel(scene, 0, 0)
    assert int(out.ray_class[0]) == scn.ESCAPED
    np.testing.assert_allclose(np.asarray(out.color[0]), CELESTIAL_SPHERE_COLOR_2, atol=1e-6)


def test_misses_sphere_schwarzschild():
    radius = 2.0
    geometry = Schwarzschild(radius=jnp.asarray(radius), horizon_epsilon=jnp.asarray(1e-4))
    position = charts.cartesian_to_spherical(jnp.array([0.0, 10.0, 0.0, 0.0]))
    r = float(position[1])
    a = 1.0 - radius / r
    velocity = jnp.array([1.0 / a, -np.sqrt(radius / r), 0.0, 0.0])
    camera = cam.build_camera(geometry, position, velocity, PI / 2, 11, 11, 0.0, PI / 2, PI / 2)
    scene = build_test_scene(geometry, camera, 2.0, 3.0, 4.0)
    out = trace_pixel(scene, 0, 0)
    np.testing.assert_allclose(np.asarray(out.color[0]), CELESTIAL_SPHERE_COLOR_2, atol=1e-6)


def test_hits_horizon_schwarzschild():
    radius = 1.0
    geometry = Schwarzschild(radius=jnp.asarray(radius), horizon_epsilon=jnp.asarray(1e-4))
    position = charts.cartesian_to_spherical(jnp.array([0.0, -10.0, 0.0, 0.0]))
    r = float(position[1])
    a = 1.0 - radius / r
    velocity = jnp.array([-1.0 / np.sqrt(a), 0.0, 0.0, 0.0])
    camera = cam.build_camera(
        geometry, position, velocity, PI / 2, 11, 11, PI / 2, 0.0, PI / 2
    )
    scene = build_test_scene(geometry, camera, 0.5, 3.0, 4.0)
    out = trace_pixel(scene, 5, 5)
    assert int(out.ray_class[0]) == scn.CAPTURED
    np.testing.assert_allclose(np.asarray(out.color[0]), [0.0, 0.0, 0.0, 1.0], atol=1e-12)


def test_intersects_with_disc():
    geometry = EuclideanSpace()
    camera = cam.build_camera(
        geometry,
        jnp.array([0.0, 7.0, 0.0, 0.8]),
        jnp.array([1.0, 0.0, 0.0, 0.0]),
        PI / 4,
        101,
        101,
    )
    scene = build_test_scene(geometry, camera, 1.0, 2.0, 7.0)
    out = trace_pixel(scene, 0, 51)
    np.testing.assert_allclose(
        np.asarray(out.color[0]),
        [0.022994536463607135, 0.009197814585442854, 0.12110455021248553, 1.0],
        atol=1e-6,
    )
