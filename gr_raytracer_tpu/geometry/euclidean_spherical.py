"""Flat space in the spherical chart (t, r, θ, φ), signature (+,−,−,−).

Validates the curvilinear machinery against the Cartesian Euclidean geometry.
Reference: src/geometry/euclidean_spherical.rs. Note the reference's Lorentz
transformation is the identity (no boost support in this chart,
euclidean_spherical.rs:113-121) — reproduced for parity.
"""

from __future__ import annotations

import jax.numpy as jnp

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry.base import Geometry, Solver


class EuclideanSphericalSolver(Solver):
    @property
    def chart(self):
        return charts.SPHERICAL

    def rhs(self, y):
        """Straight lines in spherical coordinates (Christoffel terms of flat
        space; reference: euclidean_spherical.rs:46-70)."""
        r, theta = y[..., 1], y[..., 2]
        v_t, v_r, v_theta, v_phi = y[..., 4], y[..., 5], y[..., 6], y[..., 7]
        st, ct = jnp.sin(theta), jnp.cos(theta)
        a_t = jnp.zeros_like(v_t)
        a_r = r * (v_theta * v_theta + v_phi * v_phi * st * st)
        a_theta = -(2.0 / r) * v_r * v_theta + st * ct * v_phi * v_phi
        a_phi = -(2.0 / r) * v_phi * v_r - 2.0 * (ct / st) * v_theta * v_phi
        return jnp.stack([v_t, v_r, v_theta, v_phi, a_t, a_r, a_theta, a_phi], axis=-1)


class EuclideanSpaceSpherical(Geometry):
    @property
    def chart(self):
        return charts.SPHERICAL

    def signature(self):
        return (1.0, -1.0, -1.0, -1.0)

    def metric(self, x):
        r, theta = x[..., 1], x[..., 2]
        one = jnp.ones_like(r)
        diag = jnp.stack([one, -one, -r * r, -r * r * jnp.sin(theta) ** 2], axis=-1)
        return diag[..., :, None] * jnp.eye(4, dtype=x.dtype)

    def inner_product(self, x, v, w):
        r, theta = x[..., 1], x[..., 2]
        return (
            v[..., 0] * w[..., 0]
            - v[..., 1] * w[..., 1]
            - r * r * v[..., 2] * w[..., 2]
            - r * r * jnp.sin(theta) ** 2 * v[..., 3] * w[..., 3]
        )

    def tetrad(self, x):
        """(e_t, e_φ, −e_θ, −e_r) in spherical components
        (reference: euclidean_spherical.rs:99-111)."""
        r, theta = x[..., 1], x[..., 2]
        zero = jnp.zeros_like(r)
        one = jnp.ones_like(r)
        e_t = jnp.stack([one, zero, zero, zero], axis=-1)
        e_phi = jnp.stack([zero, zero, zero, 1.0 / (r * jnp.sin(theta))], axis=-1)
        e_theta_neg = jnp.stack([zero, zero, -1.0 / r, zero], axis=-1)
        e_r_neg = jnp.stack([zero, -one, zero, zero], axis=-1)
        return jnp.stack([e_t, e_phi, e_theta_neg, e_r_neg], axis=-2)

    def lorentz_transformation(self, x, velocity):
        """Identity — parity with the reference's unimplemented boost
        (euclidean_spherical.rs:113-121)."""
        return jnp.broadcast_to(jnp.eye(4, dtype=x.dtype), x.shape[:-1] + (4, 4))

    def inside_horizon(self, x):
        return jnp.zeros(x.shape[:-1], bool)

    def closed_orbit(self, x, step_index, max_steps):
        return jnp.zeros(x.shape[:-1], bool)

    def radial_coordinate(self, x, chart):
        if chart == charts.CARTESIAN:
            return jnp.sqrt(x[..., 1] ** 2 + x[..., 2] ** 2 + x[..., 3] ** 2)
        return x[..., 1]

    def stationary_velocity(self, x):
        return jnp.zeros_like(x).at[..., 0].set(1.0)

    def zamo_velocity(self, x):
        return self.stationary_velocity(x)

    def orbit_coefficients_at_radius(self, r):
        shp = jnp.shape(r)
        dt = jnp.result_type(r)
        return jnp.ones(shp, dt), jnp.zeros(shp, dt), jnp.ones(shp, bool)

    def axial_killing(self, x):
        return jnp.zeros_like(x).at[..., 3].set(1.0)

    def make_solver(self, x0, p0):
        return EuclideanSphericalSolver()
