"""f64 conserved-quantity extraction for kernel states — pure numpy.

The production march runs compiled f32 on the TPU; quantifying its
integration drift requires extracting the conserved quantities in HIGHER
precision than the states being judged. In a TPU process `jax_enable_x64`
is off (and cannot be turned on without breaking the f32 TPU path), so this
module mirrors the needed formulas in numpy float64:

  KS chart (geometry/kerr.py, ops/geodesic_pallas.py):
    * ks_hamiltonian  — 2H = g^{αβ} p_α p_β (null-condition violation)
    * ks_momentum_contra, ks_lz (axial Killing ξ·p)
  BL chart (geometry/kerr_bl.py, geometry/chart.py):
    * cartesian_to_bl, jacobian_bl_to_cartesian, metric_bl
    * conserved_from_bl — (E, L_z, Carter Q)
    * potential_r / potential_theta — Mino potentials

Every function is pinned BIT-CLOSE (≤1e-12 relative) to its jax twin on
CPU f64 by tests/test_invariants.py; any drift between the twins fails CI.

Main consumers: scripts/fastpath_accuracy.py --tpu (r2 verdict item 1) and
ad-hoc on-chip conservation checks.
"""

from __future__ import annotations

import numpy as np

SIN2_FLOOR = 1e-28


# ---------------------------------------------------------------------------
# Kerr-Schild (Cartesian chart, covariant-momentum state [N, 8])
# ---------------------------------------------------------------------------


def _ks_scalars(radius, a, x, y, z):
    rho_sq = x * x + y * y + z * z
    d = rho_sq - a * a
    r_sq = 0.5 * (d + np.sqrt(d * d + 4.0 * a * a * z * z))
    r = np.sqrt(r_sq)
    f = (r * r_sq * radius) / (r_sq * r_sq + a * a * z * z)
    denom = r_sq + a * a
    kx = (r * x + a * y) / denom
    ky = (r * y - a * x) / denom
    kz = z / np.maximum(r, 1e-300)
    return f, kx, ky, kz, r


def ks_hamiltonian(radius, a, y):
    """2H = g^{αβ} p_α p_β for state rows y [N, 8] (f64); exactly 0 on a
    null geodesic."""
    y = np.asarray(y, np.float64)
    f, kx, ky, kz, _ = _ks_scalars(radius, a, y[:, 1], y[:, 2], y[:, 3])
    p = y[:, 4:8]
    k_dot_p = -p[:, 0] + kx * p[:, 1] + ky * p[:, 2] + kz * p[:, 3]
    eta_pp = -p[:, 0] ** 2 + p[:, 1] ** 2 + p[:, 2] ** 2 + p[:, 3] ** 2
    return eta_pp - f * k_dot_p * k_dot_p


def ks_momentum_contra(radius, a, y):
    """p^μ [N, 4] from the covariant state rows [N, 8] (f64)."""
    y = np.asarray(y, np.float64)
    f, kx, ky, kz, _ = _ks_scalars(radius, a, y[:, 1], y[:, 2], y[:, 3])
    p = y[:, 4:8]
    k_dot_p = -p[:, 0] + kx * p[:, 1] + ky * p[:, 2] + kz * p[:, 3]
    return np.stack(
        [
            -p[:, 0] + f * k_dot_p,
            p[:, 1] - f * kx * k_dot_p,
            p[:, 2] - f * ky * k_dot_p,
            p[:, 3] - f * kz * k_dot_p,
        ],
        axis=-1,
    )


def ks_lz(y):
    """L_z = ξ·p with the axial Killing ξ = (0, −y, x, 0) and covariant p."""
    y = np.asarray(y, np.float64)
    return -y[:, 2] * y[:, 5] + y[:, 1] * y[:, 6]


# ---------------------------------------------------------------------------
# Boyer-Lindquist
# ---------------------------------------------------------------------------


def cartesian_to_bl(a, p):
    """[N, 4] Cartesian -> BL (chart.py:78-86)."""
    p = np.asarray(p, np.float64)
    t, x, y, z = p[:, 0], p[:, 1], p[:, 2], p[:, 3]
    rho_sq = x * x + y * y + z * z
    d = rho_sq - a * a
    r = np.sqrt(0.5 * (d + np.sqrt(d * d + 4.0 * a * a * z * z)))
    safe_r = np.where(r > 0.0, r, 1.0)
    theta = np.where(r > 0.0, np.arccos(np.clip(z / safe_r, -1.0, 1.0)), 0.0)
    phi = np.arctan2(r * y - a * x, r * x + a * y)
    return np.stack([t, r, theta, phi], axis=-1)


def jacobian_bl_to_cartesian(r_s, a, r, theta, phi):
    """[N, 4, 4] ∂x^Cart/∂x^BL incl. the Kerr-Schild twist terms
    (chart.py:152-171)."""
    r, theta, phi = (np.asarray(v, np.float64) for v in (r, theta, phi))
    st, ct = np.sin(theta), np.cos(theta)
    sp, cp = np.sin(phi), np.cos(phi)
    delta = r * r - r_s * r + a * a
    dx_dphi = (-r * sp - a * cp) * st
    dy_dphi = (r * cp - a * sp) * st
    zero = np.zeros_like(r)
    one = np.ones_like(r)
    rows = [
        [one, r_s * r / delta, zero, zero],
        [zero, st * cp + (a / delta) * dx_dphi, (r * cp - a * sp) * ct, dx_dphi],
        [zero, st * sp + (a / delta) * dy_dphi, (r * sp + a * cp) * ct, dy_dphi],
        [zero, ct, -r * st, zero],
    ]
    return np.stack([np.stack(row, axis=-1) for row in rows], axis=-2)


def metric_bl(r_s, a, r, theta):
    """[N, 4, 4] covariant BL metric (kerr_bl.py:39-55)."""
    r, theta = np.asarray(r, np.float64), np.asarray(theta, np.float64)
    sig = r * r + a * a * np.cos(theta) ** 2
    delta = r * r - r_s * r + a * a
    sin2 = np.sin(theta) ** 2
    g_tt = -(1.0 - r_s * r / sig)
    g_rr = sig / delta
    g_phph = (r * r + a * a + a * a * r_s * r * sin2 / sig) * sin2
    g_tph = -a * r_s * r * sin2 / sig
    zero = np.zeros_like(g_tt)
    rows = [
        [g_tt, zero, zero, g_tph],
        [zero, g_rr, zero, zero],
        [zero, zero, sig, zero],
        [g_tph, zero, zero, g_phph],
    ]
    return np.stack([np.stack(row, axis=-1) for row in rows], axis=-2)


def conserved_from_bl(r_s, a, x_bl, p_contra):
    """(E, L_z, Q) from BL point + contravariant momentum (kerr_bl.py:229-243)."""
    x_bl = np.asarray(x_bl, np.float64)
    p_contra = np.asarray(p_contra, np.float64)
    r, theta = x_bl[:, 1], x_bl[:, 2]
    g = metric_bl(r_s, a, r, theta)
    p_cov = np.einsum("nij,nj->ni", g, p_contra)
    e = -p_cov[:, 0]
    l_z = p_cov[:, 3]
    p_theta = p_cov[:, 2]
    ct = np.cos(theta)
    sin2 = np.sin(theta) ** 2
    q = p_theta * p_theta + ct * ct * (
        l_z * l_z / np.maximum(sin2, SIN2_FLOOR) - a * a * e * e
    )
    return e, l_z, q


def ks_carter(radius, a, y):
    """Carter Q of KS state rows [N, 8] via the BL conversion chain."""
    y = np.asarray(y, np.float64)
    x_bl = cartesian_to_bl(a, y[:, :4])
    p_contra = ks_momentum_contra(radius, a, y)
    jac = jacobian_bl_to_cartesian(radius, a, x_bl[:, 1], x_bl[:, 2], x_bl[:, 3])
    p_bl = np.linalg.solve(jac, p_contra[..., None])[..., 0]
    _, _, q = conserved_from_bl(radius, a, x_bl, p_bl)
    return q


def potential_r(r, r_s, a, e, l_z, q):
    """Mino radial potential R(r) (kerr_bl.py:80-84)."""
    r = np.asarray(r, np.float64)
    delta = r * r - r_s * r + a * a
    p_r = (r * r + a * a) * e - a * l_z
    return p_r * p_r - delta * ((l_z - a * e) ** 2 + q)


def potential_theta(theta, a, e, l_z, q):
    """Mino polar potential Θ(θ) (kerr_bl.py:92-99; unfloored like the
    source — pole rays are NaN-classified upstream)."""
    theta = np.asarray(theta, np.float64)
    ct, st = np.cos(theta), np.sin(theta)
    return q + a * a * e * e * ct * ct - l_z * l_z * ct * ct / (st * st)
