"""Equatorial circular-orbit scalars shared by the black-hole geometries.

Chart-independent functions of (r_s, a, r[, θ]) in Boyer-Lindquist terms.
Geometric units with Schwarzschild radius r_s = 2M; `a` signed (positive =
prograde for positive Ω).

Unlike the reference (src/geometry/circular_orbit.rs), nothing here raises:
functions that can fail (no timelike orbit inside the photon sphere) return
an `ok` mask alongside NaN-free masked values, so they vectorize over rays.
"""

from __future__ import annotations

import jax.numpy as jnp


def bl_metric_components_at(r_s, a, r, theta):
    """(g_tt, g_tφ, g_φφ) of the BL metric at (r, θ)
    (reference: circular_orbit.rs:39-46)."""
    ct = jnp.cos(theta)
    st = jnp.sin(theta)
    sigma = r * r + a * a * ct * ct
    sin2 = st * st
    g_tt = -(1.0 - r_s * r / sigma)
    g_tphi = -a * r_s * r * sin2 / sigma
    g_phiphi = (r * r + a * a + a * a * r_s * r * sin2 / sigma) * sin2
    return g_tt, g_tphi, g_phiphi


def bl_metric_components(r_s, a, r):
    """Equatorial (θ = π/2) BL metric components."""
    one = jnp.ones_like(r)
    sigma = r * r
    g_tt = -(1.0 - r_s * r / sigma)
    g_tphi = -a * r_s * r / sigma
    g_phiphi = r * r + a * a + a * a * r_s * r / sigma
    return g_tt, g_tphi, g_phiphi * one


def zamo_killing_coefficients(r_s, a, r, theta):
    """(u^t, u^φ) of the ZAMO (locally non-rotating frame) at (r, θ)
    (reference: circular_orbit.rs:59-72). Exists everywhere outside the
    horizon, including inside the ergosphere."""
    g_tt, g_tphi, g_phiphi = bl_metric_components_at(r_s, a, r, theta)
    omega = -g_tphi / g_phiphi
    norm = g_tt + 2.0 * g_tphi * omega + g_phiphi * omega * omega
    u_t = 1.0 / jnp.sqrt(-norm)
    return u_t, omega * u_t


def angular_velocity(r_s, a, r):
    """Ω = dφ/dt of a prograde circular orbit: √M / (r^1.5 + a√M)
    (reference: circular_orbit.rs:76-80, arXiv:1104.5499 eq. 36)."""
    sqrt_m = jnp.sqrt(0.5 * r_s)
    return sqrt_m / (jnp.power(r, 1.5) + a * sqrt_m)


def killing_coefficients(r_s, a, r):
    """(u^t, u^φ, ok) of the circular orbit at radius r; ok=False where no
    timelike orbit exists (ut_pre >= 0, reference: circular_orbit.rs:84-108).
    Masked-out entries are 0, never NaN."""
    omega = angular_velocity(r_s, a, r)
    g_tt, g_tphi, g_phiphi = bl_metric_components(r_s, a, r)
    ut_pre = g_tt + 2.0 * omega * g_tphi + omega * omega * g_phiphi
    ok = ut_pre < 0.0
    # Clamp away from the marginal orbit (ut_pre → 0⁻): u_t = 1/√(−ut_pre)
    # stays finite in f32 down to −ut_pre ~ 1e-38, but its DERIVATIVE
    # ~ (−ut_pre)^{-3/2} overflows long before that — a disc sample landing
    # within f32 noise of the marginal radius turned ∂shading/∂a into
    # inf → NaN through the masked branch (the 256² joint-fit knife edge).
    # Values are unchanged for any lane with −ut_pre > 1e-12 (u_t there is
    # ≤ 1e6, i.e. already beyond any physical emitter the scenes shade);
    # on the clamped side jnp.maximum routes a zero derivative.
    safe = jnp.where(ok, jnp.maximum(-ut_pre, 1e-12), 1.0)
    u_t = jnp.where(ok, 1.0 / jnp.sqrt(safe), 0.0)
    return u_t, omega * u_t, ok


def conserved_energy(r_s, a, r):
    """(E, ok): conserved specific energy E = −u_t(cov) of the circular orbit
    (reference: circular_orbit.rs:111-116)."""
    omega = angular_velocity(r_s, a, r)
    g_tt, g_tphi, _ = bl_metric_components(r_s, a, r)
    u_t, _, ok = killing_coefficients(r_s, a, r)
    return -(g_tt + g_tphi * omega) * u_t, ok


def conserved_angular_momentum(r_s, a, r):
    """(L, ok): conserved specific angular momentum L = u_φ(cov)
    (reference: circular_orbit.rs:119-124)."""
    omega = angular_velocity(r_s, a, r)
    _, g_tphi, g_phiphi = bl_metric_components(r_s, a, r)
    u_t, _, ok = killing_coefficients(r_s, a, r)
    return (g_tphi + g_phiphi * omega) * u_t, ok


def r_isco(r_s, a):
    """Prograde ISCO radius (Bardeen), reference: circular_orbit.rs:127-136."""
    a_s = 2.0 * a / r_s
    z1 = 1.0 + jnp.cbrt(1.0 - a_s * a_s) * (jnp.cbrt(1.0 + a_s) + jnp.cbrt(1.0 - a_s))
    z2 = jnp.sqrt(3.0 * a_s * a_s + z1 * z1)
    return (3.0 + z2 - jnp.sqrt((3.0 - z1) * (3.0 + z1 + 2.0 * z2))) * r_s / 2.0
