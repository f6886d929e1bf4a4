"""Kerr spacetime in the Kerr-Schild Cartesian chart, signature (−,+,+,+).

g_{μν} = η_{μν} + f k_μ k_ν with analytic inverse g^{μν} = η^{μν} − f k^μ k^ν
(reference: src/geometry/kerr.rs:49-110). Geodesics are Hamiltonian in the
covariant momentum:

    H(x, p) = ½ g^{αβ}(x) p_α p_β
    dx^μ/dλ =  ∂H/∂p_μ = g^{μν} p_ν
    dp_μ/dλ = −∂H/∂x^μ

The reference computes ∂g with central finite differences (kerr.rs:162-186);
here dp = −∇ₓH is exact via JAX autodiff — cheaper, exact, and itself
differentiable for parameter gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry import circular_orbit
from gr_raytracer_tpu.precision import einsum
from gr_raytracer_tpu.geometry.base import (
    TRAPPED_ORBIT_RADIUS_FACTOR,
    Geometry,
    Solver,
    gram_schmidt,
)

_ETA_DIAG = (-1.0, 1.0, 1.0, 1.0)


def _f_and_k(radius, a, x):
    """Kerr-Schild scalar f and covector k at Cartesian x (kerr.rs:36-58)."""
    xs, ys, zs = x[..., 1], x[..., 2], x[..., 3]
    r_sq = charts.bl_radius_sq_from_cartesian(a, xs, ys, zs)
    r = jnp.sqrt(r_sq)
    f = (r * r_sq * radius) / (r_sq * r_sq + a * a * zs * zs)
    k_t = jnp.ones_like(r)
    k_x = (r * xs + a * ys) / (r_sq + a * a)
    k_y = (r * ys - a * xs) / (r_sq + a * a)
    k_z = zs / r
    return f, jnp.stack([k_t, k_x, k_y, k_z], axis=-1)


def kerr_metric(radius, a, x):
    """Covariant Kerr-Schild metric, [..., 4, 4]."""
    f, k = _f_and_k(radius, a, x)
    eta = jnp.diag(jnp.asarray(_ETA_DIAG, x.dtype))
    return eta + f[..., None, None] * k[..., :, None] * k[..., None, :]


def kerr_metric_contravariant(radius, a, x):
    """Analytic inverse: η^{μν} − f k^μ k^ν (kerr.rs:88-110)."""
    f, k = _f_and_k(radius, a, x)
    k_up = k.at[..., 0].multiply(-1.0)
    eta = jnp.diag(jnp.asarray(_ETA_DIAG, x.dtype))
    return eta - f[..., None, None] * k_up[..., :, None] * k_up[..., None, :]


class KerrSolver(Solver):
    radius: jnp.ndarray
    a: jnp.ndarray

    @property
    def chart(self):
        return charts.CARTESIAN

    def rhs(self, y):
        x, p = y[..., :4], y[..., 4:8]
        ginv = kerr_metric_contravariant(self.radius, self.a, x)
        xdot = einsum("...ij,...j->...i", ginv, p)

        def total_h(xx):
            gi = kerr_metric_contravariant(self.radius, self.a, xx)
            return 0.5 * jnp.sum(einsum("...ij,...i,...j->...", gi, p, p))

        pdot = -jax.grad(total_h)(x)
        return jnp.concatenate([xdot, pdot], axis=-1)

    def initial_state(self, x, p):
        """Lower the index: the state carries covariant momentum
        (kerr.rs:243-260)."""
        g = kerr_metric(self.radius, self.a, x)
        p_cov = einsum("...ij,...j->...i", g, p)
        return jnp.concatenate([x, p_cov], axis=-1)

    def momentum(self, y):
        ginv = kerr_metric_contravariant(self.radius, self.a, y[..., :4])
        return einsum("...ij,...j->...i", ginv, y[..., 4:8])


class Kerr(Geometry):
    radius: jnp.ndarray  # r_s = 2M
    a: jnp.ndarray
    horizon_epsilon: jnp.ndarray

    @property
    def chart(self):
        return charts.CARTESIAN

    @property
    def spin(self):
        return self.a

    def signature(self):
        return _ETA_DIAG

    def metric(self, x):
        return kerr_metric(self.radius, self.a, x)

    def tetrad(self, x):
        """ADM lapse/shift frame orthonormalized by metric Gram-Schmidt
        (reference: kerr.rs:297-331)."""
        f, k = _f_and_k(self.radius, self.a, x)
        alpha = 1.0 / jnp.sqrt(1.0 + f)
        bfac = f / (1.0 + f)
        e_t = jnp.stack(
            [
                1.0 / alpha,
                -bfac * k[..., 1] / alpha,
                -bfac * k[..., 2] / alpha,
                -bfac * k[..., 3] / alpha,
            ],
            axis=-1,
        )
        eye = jnp.broadcast_to(jnp.eye(4, dtype=x.dtype), x.shape[:-1] + (4, 4))
        vectors = jnp.concatenate([e_t[..., None, :], eye[..., 1:, :]], axis=-2)
        return gram_schmidt(self, x, vectors)

    def inside_horizon(self, x):
        m = 0.5 * self.radius
        r = jnp.sqrt(
            charts.bl_radius_sq_from_cartesian(self.a, x[..., 1], x[..., 2], x[..., 3])
        )
        rp = m + jnp.sqrt(jnp.maximum(m * m - self.a * self.a, 0.0))
        over_extremal = jnp.abs(self.a) > m
        return jnp.where(over_extremal, False, r <= rp + self.horizon_epsilon)

    def closed_orbit(self, x, step_index, max_steps):
        r = self.radial_coordinate(x, charts.CARTESIAN)
        return (step_index == max_steps - 1) & (r < TRAPPED_ORBIT_RADIUS_FACTOR * self.radius)

    def radial_coordinate(self, x, chart):
        if chart == charts.CARTESIAN:
            return jnp.sqrt(
                charts.bl_radius_sq_from_cartesian(self.a, x[..., 1], x[..., 2], x[..., 3])
            )
        return x[..., 1]  # BL r

    def stationary_velocity(self, x):
        f, _ = _f_and_k(self.radius, self.a, x)
        u = jnp.zeros_like(x)
        return u.at[..., 0].set(1.0 / jnp.sqrt(1.0 - f))

    def zamo_velocity(self, x):
        xs, ys, zs = x[..., 1], x[..., 2], x[..., 3]
        r = jnp.sqrt(charts.bl_radius_sq_from_cartesian(self.a, xs, ys, zs))
        theta = jnp.where(r > 0.0, jnp.arccos(jnp.clip(zs / jnp.where(r > 0.0, r, 1.0), -1.0, 1.0)), 0.0)
        u_t, u_phi = circular_orbit.zamo_killing_coefficients(self.radius, self.a, r, theta)
        e_t = jnp.zeros_like(x).at[..., 0].set(1.0)
        return u_t[..., None] * e_t + u_phi[..., None] * self.axial_killing(x)

    def orbit_coefficients_at_radius(self, r):
        return circular_orbit.killing_coefficients(self.radius, self.a, r)

    def axial_killing(self, x):
        """∂_φ = x ∂_y − y ∂_x (kerr.rs:482-485)."""
        zero = jnp.zeros_like(x[..., 0])
        return jnp.stack([zero, -x[..., 2], x[..., 1], zero], axis=-1)

    def make_solver(self, x0, p0):
        return KerrSolver(radius=self.radius, a=self.a)

    def constants_of_motion(self, x, p):
        """E = −p_t(cov), L_z = −y p_x + x p_y (kerr.rs:421-445)."""
        g = kerr_metric(self.radius, self.a, x)
        p_cov = einsum("...ij,...j->...i", g, p)
        return {
            "E": -p_cov[..., 0],
            "L_z": -x[..., 2] * p_cov[..., 1] + x[..., 1] * p_cov[..., 2],
        }
