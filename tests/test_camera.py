"""Camera tests against reference oracle values (camera.rs:274-508)."""

import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu.geometry.euclidean import EuclideanSpace
from gr_raytracer_tpu.geometry.kerr import Kerr
from gr_raytracer_tpu.geometry.schwarzschild import Schwarzschild
from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.rendering import camera as cam

PI = float(jnp.pi)


def _euclidean_camera(rows=11, cols=11, fov=PI / 2):
    return cam.build_camera(
        EuclideanSpace(),
        jnp.array([0.0, 1.0, 0.0, 0.0]),
        jnp.array([1.0, 0.0, 0.0, 0.0]),
        fov,
        rows,
        cols,
    )


def test_corner_directions_oracle():
    camera = _euclidean_camera()
    geometry = EuclideanSpace()
    pos = camera.position

    corner = -0.6853582554517135
    corner_z = 0.24610591900311507

    def d(row, col):
        return np.asarray(cam.pixel_directions(camera, jnp.asarray(float(row)), jnp.asarray(float(col))))

    np.testing.assert_allclose(d(0, 0), [0.0, corner_z, -corner, corner], atol=1e-12)
    np.testing.assert_allclose(d(0, 10), [0.0, corner_z, corner, corner], atol=1e-12)
    np.testing.assert_allclose(d(5, 5), [0.0, -1.0, 0.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(d(10, 0), [0.0, corner_z, -corner, -corner], atol=1e-12)
    np.testing.assert_allclose(d(10, 10), [0.0, corner_z, corner, -corner], atol=1e-12)

    # All directions are unit spacelike: <N, N> = -1 in (+,---).
    for rc in [(0, 0), (0, 10), (5, 5), (10, 0), (10, 10)]:
        v = jnp.asarray(d(*rc))
        ip = geometry.inner_product(pos, v, v)
        np.testing.assert_allclose(float(ip), -1.0, atol=1e-12)


def test_camera_rays_are_null():
    camera = _euclidean_camera(rows=7, cols=9)
    geometry = EuclideanSpace()
    x, p = cam.full_grid_rays(camera)
    kk = geometry.inner_product(x, p, p)
    np.testing.assert_allclose(np.asarray(kk), 0.0, atol=1e-12)


def test_centered_offset_is_base_ray():
    camera = _euclidean_camera()
    x0, p0 = cam.pixel_rays(camera, jnp.asarray(3.0), jnp.asarray(7.0))
    x1, p1 = cam.pixel_rays_offset(camera, jnp.asarray(3.0), jnp.asarray(7.0), 0.5, 0.5)
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1), atol=1e-15)


def test_past_directed_plus_minus_signature():
    """sig0 * <u_cam, p> < 0 (camera.rs:462-484)."""
    geometry = Schwarzschild(radius=jnp.asarray(0.0), horizon_epsilon=jnp.asarray(0.0))
    position = charts.cartesian_to_spherical(jnp.array([0.0, 10.0, 0.0, 0.0]))
    velocity = jnp.array([1.0, 0.0, 0.0, 0.0])
    camera = cam.build_camera(geometry, position, velocity, PI / 2, 11, 11)
    x, p = cam.pixel_rays(camera, jnp.asarray(5.0), jnp.asarray(5.0))
    orientation = geometry.signature()[0] * geometry.inner_product(x, velocity, p)
    assert float(orientation) < 0.0


def test_past_directed_minus_plus_signature():
    geometry = Kerr(radius=jnp.asarray(0.0), a=jnp.asarray(0.0), horizon_epsilon=jnp.asarray(0.0))
    position = jnp.array([0.0, 10.0, 0.0, 0.0])
    velocity = jnp.array([1.0, 0.0, 0.0, 0.0])
    camera = cam.build_camera(geometry, position, velocity, PI / 2, 11, 11)
    x, p = cam.pixel_rays(camera, jnp.asarray(5.0), jnp.asarray(5.0))
    orientation = geometry.signature()[0] * geometry.inner_product(x, velocity, p)
    assert float(orientation) < 0.0


def test_same_rays_across_charts():
    """Euclidean vs spherical-chart cameras produce the same ray positions
    (camera.rs:366-457)."""
    from gr_raytracer_tpu.geometry.euclidean_spherical import EuclideanSpaceSpherical

    pos_cart = jnp.array([0.0, 0.0, 1.0, 0.0])
    vel = jnp.array([1.0, 0.0, 0.0, 0.0])
    c1 = cam.build_camera(EuclideanSpace(), pos_cart, vel, PI / 2, 10, 10, 0.0, PI / 2, PI / 2)
    c2 = cam.build_camera(
        EuclideanSpaceSpherical(),
        charts.cartesian_to_spherical(pos_cart),
        vel,
        PI / 2,
        10,
        10,
        0.0,
        PI / 2,
        PI / 2,
    )
    x1, _ = cam.full_grid_rays(c1)
    x2, _ = cam.full_grid_rays(c2)
    np.testing.assert_allclose(
        np.asarray(x1), np.asarray(charts.spherical_to_cartesian(x2)), atol=1e-10
    )


def test_f32_kerr_camera_build_is_accurate():
    """Regression: f32 frame contractions must run at HIGHEST precision.

    With default matmul precision, TPU-semantics backends evaluate f32
    einsums with bfloat16 passes; the Lorentz boost of the Kerr tetrad at
    the flagship camera position then lands at <e0,e0> = -1.0139 and camera
    construction raises. precision.einsum pins HIGHEST; the f32 build must
    pass validation (tol 1e-4) and measure orthonormal to ~1e-6.
    """
    dt = jnp.float32
    g = Kerr(
        radius=jnp.asarray(1.0, dt),
        a=jnp.asarray(0.499, dt),
        horizon_epsilon=jnp.asarray(1e-4, dt),
    )
    pos = jnp.asarray([0.0, 18.0, 0.0, 0.8], dt)
    vel = jnp.zeros(4, dt).at[0].set(1.0289732)  # static observer u^t
    camera = cam.build_camera(g, pos, vel, PI / 4, 16, 16)  # validates inside
    sig = g.signature()
    for i in range(4):
        for j in range(i, 4):
            want = sig[i] if i == j else 0.0
            got = float(g.inner_product(pos, camera.tetrad[i], camera.tetrad[j]))
            assert abs(got - want) < 5e-6, (i, j, got)
