"""Scene-object intersection tests.

Ports of the reference's sphere.rs and objects.rs in-module tests:
segment-vs-sphere preconditions (sphere.rs:188-223), world-space
intersection point regression (sphere.rs:225-246), nearest-hit ordering
with overlapping spheres (objects.rs:190-232), and the disc intersection
through Schwarzschild's native spherical chart (objects.rs:234-276).
"""

import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry.euclidean import EuclideanSpace
from gr_raytracer_tpu.objects.disc import Disc
from gr_raytracer_tpu.objects.sphere import Sphere
from gr_raytracer_tpu.rendering import scene as scn
from gr_raytracer_tpu.rendering.texture import CheckerMap


def _checker():
    return CheckerMap.from_srgb(3.0, 5.0, 5.0, (100, 0, 0, 255), (0, 100, 0, 255))


def _sphere_at(x, y, z, radius=1.0):
    return Sphere(
        radius=jnp.asarray(radius),
        center=jnp.array([0.0, x, y, z]),
        temperature=jnp.asarray(0.0),
        texture=_checker(),
    )


def _seg(a, b):
    """Single-segment [1, 4] Cartesian endpoints."""
    return jnp.asarray(a)[None, :], jnp.asarray(b)[None, :]


# ---------------------------------------------------------------------------
# Sphere (sphere.rs:188-246)
# ---------------------------------------------------------------------------


def test_sphere_intersection_center_sphere():
    sphere = _sphere_at(0.0, 0.0, 0.0)
    hit, _, _, _ = sphere.segment_hit(*_seg([0.0, 1.1, 0.0, 0.0], [0.0, 0.9, 0.0, 0.0]))
    assert bool(hit[0])


def test_sphere_intersection_center_sphere_no_intersection():
    sphere = _sphere_at(0.0, 0.0, 0.0)
    hit, _, _, _ = sphere.segment_hit(*_seg([0.0, 1.1, 0.0, 0.0], [0.0, 1.01, 0.0, 0.0]))
    assert not bool(hit[0])


def test_sphere_intersection_moved_sphere():
    sphere = _sphere_at(5.0, 0.0, 0.0)
    hit, _, _, _ = sphere.segment_hit(*_seg([0.0, 6.1, 0.0, 0.0], [0.0, 5.9, 0.0, 0.0]))
    assert bool(hit[0])


def test_sphere_intersection_moved_sphere_misses():
    sphere = _sphere_at(5.0, 0.0, 0.0)
    hit, _, _, _ = sphere.segment_hit(*_seg([0.0, 6.1, 0.0, 0.0], [0.0, 6.01, 0.0, 0.0]))
    assert not bool(hit[0])


def test_sphere_intersection_point_is_world_space_not_sphere_local():
    # Regression (sphere.rs:225-246): the intersection point feeds the
    # geometry's fields at the emitter's TRUE location, so it must be world
    # coordinates (z ~ 21, the top of a sphere centered at z = 20), not the
    # sphere-local z ~ 1.
    sphere = _sphere_at(0.0, 0.0, 20.0)
    hit, _, point, _ = sphere.segment_hit(
        *_seg([0.0, 0.0, 0.0, 22.0], [0.0, 0.0, 0.0, 19.5])
    )
    assert bool(hit[0])
    np.testing.assert_allclose(float(point[0, 2]), 21.0, atol=1e-9)


# ---------------------------------------------------------------------------
# Nearest-hit ordering (objects.rs:190-232)
# ---------------------------------------------------------------------------


def _nearest_kind(objects, start, end):
    """Run the scene's in-loop nearest-hit segment test over one segment and
    return (hit, object index, world point)."""
    geometry = EuclideanSpace()
    scene = scn.Scene(
        geometry=geometry,
        camera=None,
        objects=tuple(objects),
        celestial_map=None,
        celestial_temperature=jnp.asarray(0.0),
        integration=None,
    )
    fn = scn._segment_fn(scene)
    cart_prev, cart_new = _seg(start, end)
    p = jnp.zeros_like(cart_prev)
    hit, kind, data = fn(cart_prev, cart_prev, p, cart_new, cart_new, p)
    return bool(hit[0]), int(kind[0]), np.asarray(data[0, :3])


def test_add_and_intersect_spheres_inside_each_other():
    # A segment from z = -3 to the origin enters the outer r=2 sphere first
    # (at z ~ -2); the inner sphere (center z = 1, r = 1) is not crossed by
    # this segment at all. The nearest hit must be the outer sphere at
    # z ~ -2 regardless of the order the objects were added in.
    start, end = [0.0, 0.0, 0.0, -3.0], [0.0, 0.0, 0.0, 0.0]
    closer = _sphere_at(0.0, 0.0, 0.0, radius=2.0)
    farther = _sphere_at(0.0, 0.0, 1.0, radius=1.0)

    hit1, kind1, point1 = _nearest_kind([farther, closer], start, end)
    assert hit1 and kind1 == 1
    np.testing.assert_allclose(point1[2], -2.0, atol=1e-9)

    hit2, kind2, point2 = _nearest_kind([closer, farther], start, end)
    assert hit2 and kind2 == 0
    np.testing.assert_allclose(point2[2], -2.0, atol=1e-9)


def test_add_and_intersect_two_spheres_nearest_first():
    # Two unit spheres at z = 0 and z = 1; a segment from z = -3 crossing
    # into the first sphere must report the closer surface (z = -1), in
    # either insertion order. (The reference's version of this test is
    # #[ignore]d because its per-object crossing precondition misses the
    # full pass-through; with a segment ending inside the closer sphere the
    # ordering itself is exercised here.)
    start, end = [0.0, 0.0, 0.0, -3.0], [0.0, 0.0, 0.0, -0.5]
    closer = _sphere_at(0.0, 0.0, 0.0)
    farther = _sphere_at(0.0, 0.0, 1.0)

    hit1, kind1, point1 = _nearest_kind([farther, closer], start, end)
    assert hit1 and kind1 == 1
    np.testing.assert_allclose(point1[2], -1.0, atol=1e-9)

    hit2, kind2, point2 = _nearest_kind([closer, farther], start, end)
    assert hit2 and kind2 == 0
    np.testing.assert_allclose(point2[2], -1.0, atol=1e-9)


# ---------------------------------------------------------------------------
# Disc through the native spherical chart (objects.rs:234-276)
# ---------------------------------------------------------------------------


def test_intersect_disc_with_schwarzschild_native_spherical_steps():
    # Regression: the integrator hands the segment test CARTESIAN endpoints
    # converted from the geometry's native chart. An inclined ray straddling
    # the equatorial plane in spherical coordinates must hit the disc.
    disc = Disc(
        inner_radius=jnp.asarray(4.0),
        outer_radius=jnp.asarray(10.0),
        temperature_model=None,
        texture=_checker(),
    )
    sph_prev = jnp.array([[0.0, 6.0, jnp.pi / 2 - 0.3, 0.0]])
    sph_new = jnp.array([[0.0, 6.0, jnp.pi / 2 + 0.3, 0.0]])
    cart_prev = charts.to_cartesian(sph_prev, charts.SPHERICAL)
    cart_new = charts.to_cartesian(sph_new, charts.SPHERICAL)
    hit, t, point, _ = disc.segment_hit(cart_prev, cart_new)
    assert bool(hit[0])
    # The crossing is at the plane z = 0, radius ~ 6 * sin spans the segment;
    # by symmetry the midpoint: t = 0.5, |xy| = 6 cos(0.3) ... 6 sin(pi/2-.3)?
    np.testing.assert_allclose(float(t[0]), 0.5, atol=1e-12)
    np.testing.assert_allclose(float(point[0, 2]), 0.0, atol=1e-12)
    r_xy = float(jnp.sqrt(point[0, 0] ** 2 + point[0, 1] ** 2))
    assert 4.0 < r_xy < 10.0
