"""Coordinate charts and conversions.

Points and four-vectors are bare [..., 4] arrays; the chart they live in is
carried *statically* by the geometry object (trace-time Python metadata), not
per-element — all rays of one scene share a chart, so there is nothing to
dispatch on at runtime.

Charts (reference: src/geometry/point.rs:11-34):
  * CARTESIAN        (t, x, y, z)
  * SPHERICAL        (t, r, θ, φ) with x = r sinθ cosφ ...
  * BOYER_LINDQUIST  (t, r, θ, φ) with the Kerr-Schild embedding
        x = (r cosφ − a sinφ) sinθ
        y = (r sinφ + a cosφ) sinθ
        z = r cosθ
    (NOT the oblate-spheroidal x = √(r²+a²) sinθ cosφ convention).
"""

from __future__ import annotations

import jax.numpy as jnp

CARTESIAN = "cartesian"
SPHERICAL = "spherical"
BOYER_LINDQUIST = "boyer_lindquist"

PI = jnp.pi


def wrap_theta(theta):
    """Wrap an angle to [0, π) (reference: point.rs:79-81)."""
    return jnp.mod(theta, PI)


def wrap_phi(phi):
    """Wrap an angle to [−π, π) (reference: point.rs:84-86)."""
    return jnp.mod(phi + PI, 2.0 * PI) - PI


# ---------------------------------------------------------------------------
# Conversions. All take/return [..., 4] (t first).
# ---------------------------------------------------------------------------


def spherical_to_cartesian(x):
    t, r, theta, phi = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    return jnp.stack([t, r * st * cp, r * st * sp, r * ct], axis=-1)


def cartesian_to_spherical(p):
    t, x, y, z = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    r = jnp.sqrt(x * x + y * y + z * z)
    safe_r = jnp.where(r > 0.0, r, 1.0)
    theta = jnp.where(r > 0.0, jnp.arccos(jnp.clip(z / safe_r, -1.0, 1.0)), 0.0)
    phi = jnp.where(r > 0.0, jnp.arctan2(y, x), 0.0)
    return jnp.stack([t, r, theta, phi], axis=-1)


def bl_radius_sq_from_cartesian(a, x, y, z):
    """Boyer-Lindquist r² from Cartesian via the Kerr-Schild implicit relation
    r⁴ − (ρ² − a²) r² − a² z² = 0 (reference: kerr.rs:31-34)."""
    rho_sq = x * x + y * y + z * z
    d = rho_sq - a * a
    return 0.5 * (d + jnp.sqrt(d * d + 4.0 * a * a * z * z))


def bl_to_cartesian(a, p):
    t, r, theta, phi = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    x = (r * cp - a * sp) * st
    y = (r * sp + a * cp) * st
    z = r * ct
    return jnp.stack([t, x, y, z], axis=-1)


def cartesian_to_bl(a, p):
    """Cartesian -> BL with φ = atan2(ry − ax, rx + ay)
    (reference: spherical_coordinates_helper.rs:44-61)."""
    t, x, y, z = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    r = jnp.sqrt(bl_radius_sq_from_cartesian(a, x, y, z))
    safe_r = jnp.where(r > 0.0, r, 1.0)
    theta = jnp.where(r > 0.0, jnp.arccos(jnp.clip(z / safe_r, -1.0, 1.0)), 0.0)
    phi = jnp.arctan2(r * y - a * x, r * x + a * y)
    return jnp.stack([t, r, theta, phi], axis=-1)


def to_cartesian(x, chart, a=0.0):
    if chart == CARTESIAN:
        return x
    if chart == SPHERICAL:
        return spherical_to_cartesian(x)
    if chart == BOYER_LINDQUIST:
        return bl_to_cartesian(a, x)
    raise ValueError(f"unknown chart {chart!r}")


def from_cartesian(p, chart, a=0.0):
    if chart == CARTESIAN:
        return p
    if chart == SPHERICAL:
        return cartesian_to_spherical(p)
    if chart == BOYER_LINDQUIST:
        return cartesian_to_bl(a, p)
    raise ValueError(f"unknown chart {chart!r}")


def get_as_spherical(x, chart):
    """(r, θ, φ) triple view of a point, matching reference point.rs:172-188:
    Cartesian converts; spherical/BL return their own components with angle
    wrapping applied (θ -> [0, π), φ -> [−π, π))."""
    if chart == CARTESIAN:
        s = cartesian_to_spherical(x)
        return s[..., 1], s[..., 2], s[..., 3]
    return x[..., 1], wrap_theta(x[..., 2]), wrap_phi(x[..., 3])


def radial_distance_sq(x, chart):
    """Squared spatial radius in the point's own chart
    (reference: point.rs:190-200): Cartesian x²+y²+z²; spherical/BL r²."""
    if chart == CARTESIAN:
        return x[..., 1] ** 2 + x[..., 2] ** 2 + x[..., 3] ** 2
    return x[..., 1] ** 2


def spatial_vector_to_cartesian(position, vector, chart, a=0.0):
    """Contravariant spatial components of `vector` at `position`, pushed
    forward to the Cartesian frame; returns [..., 3].

    Used for the camera handedness triple product
    (reference: camera.rs:83-132). For spherical/BL charts the (r, θ, φ)
    triple of the *position* is taken via get_as_spherical.
    """
    if chart == CARTESIAN:
        return vector[..., 1:4]
    r, theta, phi = get_as_spherical(position, chart)
    dr, dtheta, dphi = vector[..., 1], vector[..., 2], vector[..., 3]
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    if chart == SPHERICAL:
        vx = st * cp * dr + r * ct * cp * dtheta - r * st * sp * dphi
        vy = st * sp * dr + r * ct * sp * dtheta + r * st * cp * dphi
        vz = ct * dr - r * st * dtheta
    else:  # BOYER_LINDQUIST — spatial part of the BL Jacobian (camera.rs:111-130)
        vx = st * cp * dr + (r * cp - a * sp) * ct * dtheta + (-r * sp - a * cp) * st * dphi
        vy = st * sp * dr + (r * sp + a * cp) * ct * dtheta + (r * cp - a * sp) * st * dphi
        vz = ct * dr - r * st * dtheta
    return jnp.stack([vx, vy, vz], axis=-1)


def jacobian_bl_to_cartesian(r_s, a, r, theta, phi):
    """Full 4×4 Jacobian ∂x^Cart/∂x^BL including the (ingoing) Kerr-Schild
    time/azimuth twist terms dt_KS = dt_BL + (r_s r/Δ) dr and
    dφ_KS = dφ_BL + (a/Δ) dr, so that Jᵀ g_KS J = g_BL exactly
    (reference: kerr_bl.rs:36-60). Inputs broadcast; returns [..., 4, 4].
    """
    st, ct = jnp.sin(theta), jnp.cos(theta)
    sp, cp = jnp.sin(phi), jnp.cos(phi)
    delta = r * r - r_s * r + a * a
    dx_dphi = (-r * sp - a * cp) * st
    dy_dphi = (r * cp - a * sp) * st
    zero = jnp.zeros_like(r)
    one = jnp.ones_like(r)
    rows = [
        [one, r_s * r / delta, zero, zero],
        [zero, st * cp + (a / delta) * dx_dphi, (r * cp - a * sp) * ct, dx_dphi],
        [zero, st * sp + (a / delta) * dy_dphi, (r * sp + a * cp) * ct, dy_dphi],
        [zero, ct, -r * st, zero],
    ]
    return jnp.stack([jnp.stack(row, axis=-1) for row in rows], axis=-2)
