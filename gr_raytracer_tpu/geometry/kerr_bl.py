"""Kerr in Boyer-Lindquist coordinates with Carter-separated geodesics.

Reference: src/geometry/kerr_bl.rs. The null geodesic equations decouple in
Mino time λ using the conserved (E, L_z, Q) extracted once per ray:

    state = (t, r, θ, φ, v_r, v_θ, 0, 0),  v = d(·)/dλ
    dv_r = R'(r)/2,  dv_θ = Θ'(θ)/2,  dt/dλ, dφ/dλ algebraic.

This is why BL is ~8-9× faster than the Kerr-Schild Hamiltonian path in the
reference (docs/example-render-commands.md:57-58) — the RHS is ~20 flops.
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

# Floor for sin²θ in the Carter-constant axis guard (kerr_bl.rs:25-28).
SIN2_FLOOR = 1e-28

# Gradient floor for the launch-velocity square roots (see
# _turning_safe_sqrt): camera rays launch AT a turning point of their
# potential (R(r₀) = v_r² with v_r ≈ 0 for near-tangential pixels; in f32
# the potential frequently rounds to exactly 0), where d√x → ∞.
_POT_GRAD_FLOOR = 1e-9


def _turning_safe_sqrt(pot):
    """√(max(pot, 0)) with a BIT-EXACT forward and a gradient that vanishes
    below _POT_GRAD_FLOOR. Above the floor `maximum` selects `pot`, so the
    value and derivative are the plain √pot; at/below it the lane sits at
    the potential's non-differentiable turning point — the derivative is
    one-sided-infinite there (it overflowed the kernel-VJP chain into NaN
    parameter gradients on chip), and zero is the defensible subgradient."""
    val = jnp.sqrt(jnp.maximum(pot, 0.0))
    capped = jnp.sqrt(jnp.maximum(pot, _POT_GRAD_FLOOR))
    return jnp.where(pot > _POT_GRAD_FLOOR, capped, jax.lax.stop_gradient(val))


def _sigma(r, a, theta):
    return r * r + a * a * jnp.cos(theta) ** 2


def _delta(r, r_s, a):
    return r * r - r_s * r + a * a


def metric_bl(r_s, a, r, theta):
    """Covariant BL metric, [..., 4, 4] (kerr_bl.rs:253-272)."""
    sig = _sigma(r, a, theta)
    sin2 = jnp.sin(theta) ** 2
    g_tt = -(1.0 - r_s * r / sig)
    g_rr = sig / _delta(r, r_s, a)
    g_thth = sig
    g_phph = (r * r + a * a + a * a * r_s * r * sin2 / sig) * sin2
    g_tph = -a * r_s * r * sin2 / sig
    zero = jnp.zeros_like(g_tt)
    rows = [
        [g_tt, zero, zero, g_tph],
        [zero, g_rr, zero, zero],
        [zero, zero, g_thth, zero],
        [g_tph, zero, zero, g_phph],
    ]
    return jnp.stack([jnp.stack(row, axis=-1) for row in rows], axis=-2)


def metric_bl_contravariant(r_s, a, r, theta):
    """Contravariant BL metric (kerr_bl.rs:276-293)."""
    sig = _sigma(r, a, theta)
    dl = _delta(r, r_s, a)
    sin2 = jnp.sin(theta) ** 2
    r2, a2 = r * r, a * a
    big_a = (r2 + a2) ** 2 - dl * a2 * sin2
    g_tt = -big_a / (sig * dl)
    g_rr = dl / sig
    g_thth = 1.0 / sig
    g_phph = (dl - a2 * sin2) / (sig * dl * sin2)
    g_tph = -a * r_s * r / (sig * dl)
    zero = jnp.zeros_like(g_tt)
    rows = [
        [g_tt, zero, zero, g_tph],
        [zero, g_rr, zero, zero],
        [zero, zero, g_thth, zero],
        [g_tph, zero, zero, g_phph],
    ]
    return jnp.stack([jnp.stack(row, axis=-1) for row in rows], axis=-2)


def potential_r(r, r_s, a, e, l_z, q):
    """R(r) = [(r²+a²)E − aL_z]² − Δ[(L_z−aE)² + Q] (kerr_bl.rs:77-81)."""
    p_r = (r * r + a * a) * e - a * l_z
    return p_r * p_r - _delta(r, r_s, a) * ((l_z - a * e) ** 2 + q)


def potential_r_derivative(r, r_s, a, e, l_z, q):
    p_r = (r * r + a * a) * e - a * l_z
    carter_term = (l_z - a * e) ** 2 + q
    return 4.0 * r * e * p_r - (2.0 * r - r_s) * carter_term


def potential_theta(theta, a, e, l_z, q):
    """Θ(θ) for null geodesics (μ = 0): Q + a²E²cos²θ − L_z²cos²θ/sin²θ
    (kerr_bl.rs:101-105). Diverges at the poles by design; the integrator's
    NaN stop handles rays that reach the axis."""
    ct, st = jnp.cos(theta), jnp.sin(theta)
    return q + a * a * e * e * ct * ct - l_z * l_z * ct * ct / (st * st)


def potential_theta_derivative(theta, a, e, l_z, q):
    ct, st = jnp.cos(theta), jnp.sin(theta)
    return -2.0 * a * a * e * e * ct * st + 2.0 * l_z * l_z * ct / (st ** 3)


class KerrBLSolver(Solver):
    radius: jnp.ndarray
    a: jnp.ndarray
    e: jnp.ndarray  # per-ray conserved energy           [...]
    l_z: jnp.ndarray  # per-ray conserved angular momentum  [...]
    q: jnp.ndarray  # per-ray Carter constant             [...]

    @property
    def chart(self):
        return charts.BOYER_LINDQUIST

    def _dt_dphi(self, r, theta):
        """Algebraic Mino-time dt/dλ and dφ/dλ (kerr_bl.rs:150-163)."""
        dl = _delta(r, self.radius, self.a)
        p_r = (r * r + self.a * self.a) * self.e - self.a * self.l_z
        sin2 = jnp.sin(theta) ** 2
        dt = (r * r + self.a * self.a) / dl * p_r + self.a * (
            self.l_z - self.a * self.e * sin2
        )
        dphi = self.a / dl * p_r + self.l_z / sin2 - self.a * self.e
        return dt, dphi

    def rhs(self, y):
        r, theta = y[..., 1], y[..., 2]
        v_r, v_theta = y[..., 4], y[..., 5]
        dt, dphi = self._dt_dphi(r, theta)
        dv_r = potential_r_derivative(r, self.radius, self.a, self.e, self.l_z, self.q) / 2.0
        dv_theta = potential_theta_derivative(theta, self.a, self.e, self.l_z, self.q) / 2.0
        zero = jnp.zeros_like(dv_r)
        return jnp.stack([dt, v_r, v_theta, dphi, dv_r, dv_theta, zero, zero], axis=-1)

    def initial_state(self, x, p):
        """Mino-time velocities from the potentials, with signs taken from the
        BL contravariant momentum (kerr_bl.rs:176-223)."""
        r, theta = x[..., 1], x[..., 2]
        sign_r = jnp.where(p[..., 1] >= 0.0, 1.0, -1.0)
        sign_theta = jnp.where(p[..., 2] >= 0.0, 1.0, -1.0)
        r_pot = potential_r(r, self.radius, self.a, self.e, self.l_z, self.q)
        th_pot = potential_theta(theta, self.a, self.e, self.l_z, self.q)
        v_r = sign_r * _turning_safe_sqrt(r_pot)
        v_theta = sign_theta * _turning_safe_sqrt(th_pot)
        zero = jnp.zeros_like(v_r)
        return jnp.stack(
            [x[..., 0], r, theta, x[..., 3], v_r, v_theta, zero, zero], axis=-1
        )

    def momentum(self, y):
        """Affine-parameter momentum p^μ = (1/Σ) dx^μ/dλ (kerr_bl.rs:225-249)."""
        r, theta = y[..., 1], y[..., 2]
        sig = _sigma(r, self.a, theta)
        dt, dphi = self._dt_dphi(r, theta)
        return jnp.stack([dt, y[..., 4], y[..., 5], dphi], axis=-1) / sig[..., None]


class KerrBL(Geometry):
    radius: jnp.ndarray  # r_s = 2M
    a: jnp.ndarray
    horizon_epsilon: jnp.ndarray

    @property
    def chart(self):
        return charts.BOYER_LINDQUIST

    @property
    def spin(self):
        return self.a

    def signature(self):
        return (-1.0, 1.0, 1.0, 1.0)

    def metric(self, x):
        return metric_bl(self.radius, self.a, x[..., 1], x[..., 2])

    def tetrad(self, x):
        """ZAMO-based frame, Gram-Schmidt over (t, e_φ, e_θ, e_r) so that z =
        radial (camera looks inward by default), matching Schwarzschild
        (kerr_bl.rs:428-450)."""
        r, theta = x[..., 1], x[..., 2]
        u_t, u_phi = circular_orbit.zamo_killing_coefficients(self.radius, self.a, r, theta)
        zero = jnp.zeros_like(r)
        one = jnp.ones_like(r)
        e_t = jnp.stack([u_t, zero, zero, u_phi], axis=-1)
        e_ph = jnp.stack([zero, zero, zero, one], axis=-1)
        e_th = jnp.stack([zero, zero, one, zero], axis=-1)
        e_r = jnp.stack([zero, one, zero, zero], axis=-1)
        vectors = jnp.stack([e_t, e_ph, e_th, e_r], axis=-2)
        return gram_schmidt(self, x, vectors)

    def inside_horizon(self, x):
        m = 0.5 * self.radius
        rp = m + jnp.sqrt(jnp.maximum(m * m - self.a * self.a, 0.0))
        over_extremal = jnp.abs(self.a) > m
        return jnp.where(over_extremal, False, x[..., 1] <= rp + self.horizon_epsilon)

    def closed_orbit(self, x, step_index, max_steps):
        return (step_index == max_steps - 1) & (
            x[..., 1] < TRAPPED_ORBIT_RADIUS_FACTOR * self.radius
        )

    def radial_coordinate(self, x, chart):
        if chart == charts.CARTESIAN:
            return jnp.sqrt(
                charts.bl_radius_sq_from_cartesian(self.a, x[..., 1], x[..., 2], x[..., 3])
            )
        return x[..., 1]

    def stationary_velocity(self, x):
        r, theta = x[..., 1], x[..., 2]
        sig = _sigma(r, self.a, theta)
        ut = 1.0 / jnp.sqrt(1.0 - self.radius * r / sig)
        return jnp.zeros_like(x).at[..., 0].set(1.0) * ut[..., None]

    def zamo_velocity(self, x):
        r, theta = x[..., 1], x[..., 2]
        u_t, u_phi = circular_orbit.zamo_killing_coefficients(self.radius, self.a, r, theta)
        zero = jnp.zeros_like(r)
        return jnp.stack([u_t, zero, zero, u_phi], axis=-1)

    def orbit_coefficients_at_radius(self, r):
        return circular_orbit.killing_coefficients(self.radius, self.a, r)

    def axial_killing(self, x):
        return jnp.zeros_like(x).at[..., 3].set(1.0)

    def conserved_from_bl(self, x, p):
        """(E, L_z, Q) from a BL point and contravariant momentum
        (kerr_bl.rs:536-568)."""
        r, theta = x[..., 1], x[..., 2]
        g = metric_bl(self.radius, self.a, r, theta)
        p_cov = einsum("...ij,...j->...i", g, p)
        e = -p_cov[..., 0]
        l_z = p_cov[..., 3]
        p_theta = p_cov[..., 2]
        ct = jnp.cos(theta)
        sin2 = jnp.sin(theta) ** 2
        q = p_theta * p_theta + ct * ct * (
            l_z * l_z / jnp.maximum(sin2, SIN2_FLOOR) - self.a * self.a * e * e
        )
        return e, l_z, q

    def make_solver(self, x0, p0):
        e, l_z, q = self.conserved_from_bl(x0, p0)
        return KerrBLSolver(radius=self.radius, a=self.a, e=e, l_z=l_z, q=q)

    def constants_of_motion(self, x, p):
        e, l_z, q = self.conserved_from_bl(x, p)
        return {"E": e, "L_z": l_z, "Q": q}
