"""Schwarzschild spacetime in the spherical chart (t, r, θ, φ), (+,−,−,−).

Reference: src/geometry/schwarzschild.rs. Closed-form geodesic RHS; the
timelike tetrad leg is a freely-falling observer (arXiv:1511.06025).
"""

from __future__ import annotations

import jax.numpy as jnp

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry import circular_orbit
from gr_raytracer_tpu.geometry.base import TRAPPED_ORBIT_RADIUS_FACTOR, Geometry, Solver


class SchwarzschildSolver(Solver):
    radius: jnp.ndarray

    @property
    def chart(self):
        return charts.SPHERICAL

    def rhs(self, y):
        """Geodesic equations (reference: schwarzschild.rs:54-80)."""
        r, theta = y[..., 1], y[..., 2]
        v_t, v_r, v_theta, v_phi = y[..., 4], y[..., 5], y[..., 6], y[..., 7]
        a = 1.0 - self.radius / r
        a_prime = self.radius / (r * r)
        ap_over_a = a_prime / a
        st, ct = jnp.sin(theta), jnp.cos(theta)
        acc_t = -ap_over_a * v_t * v_r
        acc_r = (
            -0.5 * a * a_prime * v_t * v_t
            + 0.5 * ap_over_a * v_r * v_r
            + a * r * (v_theta * v_theta + v_phi * v_phi * st * st)
        )
        acc_theta = -(2.0 / r) * v_r * v_theta + st * ct * v_phi * v_phi
        acc_phi = -(2.0 / r) * v_phi * v_r - 2.0 * (ct / st) * v_theta * v_phi
        return jnp.stack([v_t, v_r, v_theta, v_phi, acc_t, acc_r, acc_theta, acc_phi], axis=-1)


class Schwarzschild(Geometry):
    radius: jnp.ndarray  # r_s = 2M
    horizon_epsilon: jnp.ndarray

    @property
    def chart(self):
        return charts.SPHERICAL

    def signature(self):
        return (1.0, -1.0, -1.0, -1.0)

    def metric(self, x):
        r, theta = x[..., 1], x[..., 2]
        a = 1.0 - self.radius / r
        diag = jnp.stack([a, -1.0 / a, -r * r, -r * r * jnp.sin(theta) ** 2], axis=-1)
        return diag[..., :, None] * jnp.eye(4, dtype=x.dtype)

    def inner_product(self, x, v, w):
        r, theta = x[..., 1], x[..., 2]
        a = 1.0 - self.radius / r
        return (
            a * v[..., 0] * w[..., 0]
            - v[..., 1] * w[..., 1] / a
            - r * r * v[..., 2] * w[..., 2]
            - r * r * jnp.sin(theta) ** 2 * v[..., 3] * w[..., 3]
        )

    def tetrad(self, x):
        """Freely-falling-observer tetrad (reference: schwarzschild.rs:116-132):
        t = (1/a, −√(r_s/r), 0, 0), x = e_φ, y = e_θ, z = radial."""
        r, theta = x[..., 1], x[..., 2]
        rr0 = self.radius / r
        a = 1.0 - rr0
        zero = jnp.zeros_like(r)
        sq = jnp.sqrt(rr0)
        e_t = jnp.stack([1.0 / a, -sq, zero, zero], axis=-1)
        e_x = jnp.stack([zero, zero, zero, 1.0 / (r * jnp.sin(theta))], axis=-1)
        e_y = jnp.stack([zero, zero, 1.0 / r, zero], axis=-1)
        e_z = jnp.stack([-sq / a, jnp.ones_like(r), zero, zero], axis=-1)
        return jnp.stack([e_t, e_x, e_y, e_z], axis=-2)

    def inside_horizon(self, x):
        return x[..., 1] <= self.radius + self.horizon_epsilon

    def closed_orbit(self, x, step_index, max_steps):
        return (step_index == max_steps - 1) & (
            x[..., 1] < TRAPPED_ORBIT_RADIUS_FACTOR * self.radius
        )

    def radial_coordinate(self, x, chart):
        if chart == charts.CARTESIAN:
            return jnp.sqrt(x[..., 1] ** 2 + x[..., 2] ** 2 + x[..., 3] ** 2)
        return x[..., 1]

    def stationary_velocity(self, x):
        a = 1.0 - self.radius / x[..., 1]
        u = jnp.zeros_like(x)
        return u.at[..., 0].set(1.0 / jnp.sqrt(a))

    def zamo_velocity(self, x):
        return self.stationary_velocity(x)

    def orbit_coefficients_at_radius(self, r):
        zero = jnp.zeros_like(self.radius)
        return circular_orbit.killing_coefficients(self.radius, zero, r)

    def axial_killing(self, x):
        return jnp.zeros_like(x).at[..., 3].set(1.0)

    def make_solver(self, x0, p0):
        return SchwarzschildSolver(radius=self.radius)

    def constants_of_motion(self, x, p):
        """E = a v^t, L_z = −r² sin²θ v^φ (reference: schwarzschild.rs:213-233)."""
        r, theta = x[..., 1], x[..., 2]
        a = 1.0 - self.radius / r
        return {
            "E": a * p[..., 0],
            "L_z": -r * r * jnp.sin(theta) ** 2 * p[..., 3],
        }
