"""Flat Minkowski space in the Cartesian chart, signature (+,−,−,−).

Reference: src/geometry/euclidean.rs. Geodesics are straight lines
(x' = p, p' = 0); the tetrad is built from spherical unit vectors at the
camera position so the default view faces the origin.
"""

from __future__ import annotations

import jax.numpy as jnp

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry.base import Geometry, Solver

_ETA = (1.0, -1.0, -1.0, -1.0)


class EuclideanSolver(Solver):
    @property
    def chart(self):
        return charts.CARTESIAN

    def rhs(self, y):
        p = y[..., 4:8]
        return jnp.concatenate([p, jnp.zeros_like(p)], axis=-1)


class EuclideanSpace(Geometry):
    @property
    def chart(self):
        return charts.CARTESIAN

    def signature(self):
        return _ETA

    def metric(self, x):
        eta = jnp.diag(jnp.asarray(_ETA, x.dtype))
        return jnp.broadcast_to(eta, x.shape[:-1] + (4, 4))

    def inner_product(self, x, v, w):
        return v[..., 0] * w[..., 0] - jnp.sum(v[..., 1:] * w[..., 1:], axis=-1)

    def tetrad(self, x):
        """x = e_φ, y = −e_θ, z = −e_r from the position's spherical angles
        (reference: euclidean.rs:86-109) — the camera faces the origin."""
        r, theta, phi = charts.get_as_spherical(x, charts.CARTESIAN)
        st, ct = jnp.sin(theta), jnp.cos(theta)
        sp, cp = jnp.sin(phi), jnp.cos(phi)
        zero = jnp.zeros_like(r)
        one = jnp.ones_like(r)
        e_t = jnp.stack([one, zero, zero, zero], axis=-1)
        e_r = jnp.stack([zero, st * cp, st * sp, ct], axis=-1)
        e_theta = jnp.stack([zero, ct * cp, ct * sp, -st], axis=-1)
        e_phi = jnp.stack([zero, -sp, cp, zero], axis=-1)
        return jnp.stack([e_t, e_phi, -e_theta, -e_r], axis=-2)

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
        """Flat space: "orbit" = static observer (u^t = 1, u^φ = 0), always ok
        (reference: euclidean.rs:207-217)."""
        shp = jnp.shape(r)
        dt = jnp.result_type(r)
        return jnp.ones(shp, dt), jnp.zeros(shp, dt), jnp.ones(shp, bool)

    def axial_killing(self, x):
        zero = jnp.zeros_like(x[..., 0])
        return jnp.stack([zero, -x[..., 2], x[..., 1], zero], axis=-1)

    def make_solver(self, x0, p0):
        return EuclideanSolver()
