"""Geometry invariants: chart round-trips, tetrad orthonormality,
metric-inverse consistency, observer normalization, cross-chart constants.

Mirrors the reference's property tests (schwarzschild.rs:407-440,
kerr.rs:527-587, kerr_bl.rs:633-686/1036-1124, gram_schmidt.rs:47-151,
point.rs tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry import circular_orbit
from gr_raytracer_tpu.geometry.base import validate_tetrad
from gr_raytracer_tpu.geometry.euclidean import EuclideanSpace
from gr_raytracer_tpu.geometry.euclidean_spherical import EuclideanSpaceSpherical
from gr_raytracer_tpu.geometry.kerr import Kerr, kerr_metric, kerr_metric_contravariant
from gr_raytracer_tpu.geometry.kerr_bl import KerrBL, metric_bl, metric_bl_contravariant
from gr_raytracer_tpu.geometry.schwarzschild import Schwarzschild


def geometries():
    return [
        EuclideanSpace(),
        EuclideanSpaceSpherical(),
        Schwarzschild(radius=jnp.asarray(1.0), horizon_epsilon=jnp.asarray(1e-4)),
        Kerr(radius=jnp.asarray(1.0), a=jnp.asarray(0.45), horizon_epsilon=jnp.asarray(1e-4)),
        KerrBL(radius=jnp.asarray(1.0), a=jnp.asarray(0.45), horizon_epsilon=jnp.asarray(1e-4)),
    ]


def sample_points(geometry):
    cart = jnp.array(
        [
            [0.0, 10.0, 0.0, 0.8],
            [0.0, 3.0, -4.0, 2.0],
            [0.0, -6.0, 5.0, -3.0],
            [0.0, 2.0, 2.0, 2.0],
        ]
    )
    return charts.from_cartesian(cart, geometry.chart, geometry.spin)


# ---------------------------------------------------------------------------
# Charts
# ---------------------------------------------------------------------------


def test_spherical_roundtrip():
    p = jnp.array([0.0, 1.0, 2.0, 3.0])
    s = charts.cartesian_to_spherical(p)
    back = charts.spherical_to_cartesian(s)
    np.testing.assert_allclose(np.asarray(back), np.asarray(p), atol=1e-14)


def test_bl_to_cartesian_a_zero_matches_spherical():
    bl = jnp.array([0.0, 5.0, 1.2, 0.8])
    np.testing.assert_allclose(
        np.asarray(charts.bl_to_cartesian(0.0, bl)),
        np.asarray(charts.spherical_to_cartesian(bl)),
        atol=1e-12,
    )


def test_bl_to_cartesian_nonzero_a():
    # Oracle values from the reference test (point.rs:238-251).
    bl = jnp.array([0.0, 5.0, 1.2, 0.8])
    cart = np.asarray(charts.bl_to_cartesian(0.5, bl))
    np.testing.assert_allclose(cart[1], 2.91248746519832302226, atol=1e-10)
    np.testing.assert_allclose(cart[2], 3.66769851865865170737, atol=1e-10)
    np.testing.assert_allclose(cart[3], 1.81178877238336810684, atol=1e-10)


def test_bl_roundtrip():
    a = 0.49
    bl = jnp.array([0.0, 5.0, 1.2, 0.8])
    cart = charts.bl_to_cartesian(a, bl)
    back = charts.cartesian_to_bl(a, cart)
    np.testing.assert_allclose(np.asarray(back), np.asarray(bl), atol=1e-12)


# ---------------------------------------------------------------------------
# Metrics and tetrads
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("geometry", geometries(), ids=lambda g: type(g).__name__)
def test_tetrad_orthonormal(geometry):
    x = sample_points(geometry)
    tet = geometry.tetrad(x)
    validate_tetrad(geometry, x, tet, tol=1e-9)


@pytest.mark.parametrize("geometry", geometries(), ids=lambda g: type(g).__name__)
def test_metric_matches_inner_product(geometry):
    x = sample_points(geometry)
    v = jnp.array([0.3, -1.0, 0.2, 0.7])
    w = jnp.array([1.1, 0.5, -0.4, 0.9])
    g = geometry.metric(x)
    via_metric = jnp.einsum("...ij,i,j->...", g, v, w)
    vv = jnp.broadcast_to(v, x.shape)
    ww = jnp.broadcast_to(w, x.shape)
    np.testing.assert_allclose(
        np.asarray(geometry.inner_product(x, vv, ww)), np.asarray(via_metric), rtol=1e-12
    )


def test_kerr_analytic_inverse():
    x = jnp.array([[0.0, 3.0, -4.0, 2.0], [0.0, 1.5, 0.3, -0.8]])
    g = kerr_metric(1.0, 0.45, x)
    ginv = kerr_metric_contravariant(1.0, 0.45, x)
    prod = jnp.einsum("...ij,...jk->...ik", g, ginv)
    np.testing.assert_allclose(np.asarray(prod), np.broadcast_to(np.eye(4), prod.shape), atol=1e-12)


def test_kerr_bl_analytic_inverse():
    r = jnp.array([3.0, 5.0])
    theta = jnp.array([1.2, 0.4])
    g = metric_bl(1.0, 0.45, r, theta)
    ginv = metric_bl_contravariant(1.0, 0.45, r, theta)
    prod = jnp.einsum("...ij,...jk->...ik", g, ginv)
    np.testing.assert_allclose(np.asarray(prod), np.broadcast_to(np.eye(4), prod.shape), atol=1e-12)


def test_bl_jacobian_transforms_metric_exactly():
    """Jᵀ g_KS J = g_BL to machine precision (kerr_bl.rs:633-669) — pins the
    dt_KS/dr and dφ_KS/dr twist terms."""
    r_s, a = 1.0, 0.5
    for (r, theta, phi) in [(5.0, 1.2, 0.7), (8.0, 2.1, -1.3), (2.5, 0.4, 2.9)]:
        bl = jnp.array([0.0, r, theta, phi])
        cart = charts.bl_to_cartesian(a, bl)
        g_ks = kerr_metric(r_s, a, cart)
        j = charts.jacobian_bl_to_cartesian(r_s, a, jnp.asarray(r), jnp.asarray(theta), jnp.asarray(phi))
        g_bl = metric_bl(r_s, a, jnp.asarray(r), jnp.asarray(theta))
        transformed = j.T @ g_ks @ j
        np.testing.assert_allclose(np.asarray(transformed), np.asarray(g_bl), atol=1e-11)


# ---------------------------------------------------------------------------
# Observers / circular orbits
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "geometry",
    [g for g in geometries() if type(g).__name__ in ("Schwarzschild", "Kerr", "KerrBL")],
    ids=lambda g: type(g).__name__,
)
def test_observers_normalized(geometry):
    x = sample_points(geometry)
    s0 = geometry.signature()[0]
    for u in [geometry.stationary_velocity(x), geometry.zamo_velocity(x)]:
        norm = geometry.inner_product(x, u, u)
        np.testing.assert_allclose(np.asarray(norm), s0, atol=1e-10)


def test_zamo_has_zero_angular_momentum():
    geometry = KerrBL(radius=jnp.asarray(1.0), a=jnp.asarray(0.45), horizon_epsilon=jnp.asarray(1e-4))
    x = sample_points(geometry)
    u = geometry.zamo_velocity(x)
    axial = geometry.axial_killing(x)
    np.testing.assert_allclose(np.asarray(geometry.inner_product(x, u, axial)), 0.0, atol=1e-12)


def test_isco_known_values():
    # a=0: r_isco = 6M = 3 r_s; near-extremal prograde: -> M (circular_orbit.rs:150-157).
    np.testing.assert_allclose(float(circular_orbit.r_isco(1.0, 0.0)), 3.0, rtol=1e-12)
    assert float(circular_orbit.r_isco(1.0, 0.4999999)) == pytest.approx(0.5, rel=1e-2)


def test_no_timelike_orbit_inside_photon_sphere():
    # Schwarzschild photon sphere at 1.5 r_s: no timelike circular orbit below.
    _, _, ok = circular_orbit.killing_coefficients(1.0, 0.0, jnp.asarray([1.4, 1.6]))
    assert not bool(ok[0])
    assert bool(ok[1])


def test_circular_orbit_velocity_normalized():
    geometry = Schwarzschild(radius=jnp.asarray(1.0), horizon_epsilon=jnp.asarray(1e-4))
    x = jnp.array([[0.0, 4.0, jnp.pi / 2, 0.3], [0.0, 8.0, jnp.pi / 2, 1.0]])
    u, ok = geometry.circular_orbit_velocity(x)
    assert bool(jnp.all(ok))
    norm = geometry.inner_product(x, u, u)
    np.testing.assert_allclose(np.asarray(norm), 1.0, atol=1e-12)


def test_cross_chart_conserved_quantities():
    """KS-Cartesian and BL (E, L_z) agree for the same physical ray
    (kerr_bl.rs:930-1034)."""
    r_s, a = 1.0, 0.45
    kerr = Kerr(radius=jnp.asarray(r_s), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-4))
    kbl = KerrBL(radius=jnp.asarray(r_s), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-4))

    bl_x = jnp.array([0.0, 6.0, 1.1, 0.4])
    # A null-ish test vector in BL; exact nullness is irrelevant for E/L_z.
    p_bl = jnp.array([1.0, -0.3, 0.05, 0.02])
    cart_x = charts.bl_to_cartesian(a, bl_x)
    j = charts.jacobian_bl_to_cartesian(r_s, a, bl_x[1], bl_x[2], bl_x[3])
    p_cart = j @ p_bl

    c_bl = kbl.constants_of_motion(bl_x, p_bl)
    c_ks = kerr.constants_of_motion(cart_x, p_cart)
    np.testing.assert_allclose(float(c_bl["E"]), float(c_ks["E"]), atol=1e-10)
    np.testing.assert_allclose(float(c_bl["L_z"]), float(c_ks["L_z"]), atol=1e-10)


def test_over_extremal_spin_has_no_horizon():
    """|a| > M: no event horizon exists — inside_horizon is False everywhere,
    including at tiny radii (kerr.rs:120-137 / kerr_bl.rs over-extremal
    handling). Both charts, both spin signs."""
    from gr_raytracer_tpu.geometry.kerr import Kerr
    from gr_raytracer_tpu.geometry.kerr_bl import KerrBL

    for a in (0.7, -0.7):  # M = 0.5 (radius 1.0) -> |a| > M
        ks = Kerr(radius=jnp.asarray(1.0), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-4))
        x_cart = jnp.array([[0.0, 0.05, 0.0, 0.02], [0.0, 3.0, 0.0, 0.0]])
        assert not bool(jnp.any(ks.inside_horizon(x_cart)))
        bl = KerrBL(radius=jnp.asarray(1.0), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-4))
        x_bl = jnp.array([[0.0, 0.05, jnp.pi / 2, 0.0], [0.0, 3.0, 1.0, 0.0]])
        assert not bool(jnp.any(bl.inside_horizon(x_bl)))
    # Sub-extremal control: a point just outside r=0 IS inside the horizon.
    ks = Kerr(radius=jnp.asarray(1.0), a=jnp.asarray(0.3), horizon_epsilon=jnp.asarray(1e-4))
    assert bool(ks.inside_horizon(jnp.array([0.0, 0.4, 0.0, 0.1])))


def test_bl_potential_derivatives_match_autodiff():
    """The closed-form R'(r) and Θ'(θ) used by the Mino-time RHS agree with
    jax.grad of the potentials (kerr_bl.rs:86-118 'numerical' test, done
    exactly here)."""
    import jax

    from gr_raytracer_tpu.geometry import kerr_bl as kbl

    r_s, a, e, l_z, q = 1.0, 0.45, 1.1, -2.3, 3.7
    for r in (1.5, 3.0, 8.0, 20.0):
        got = float(kbl.potential_r_derivative(r, r_s, a, e, l_z, q))
        ref = float(jax.grad(lambda rr: kbl.potential_r(rr, r_s, a, e, l_z, q))(r))
        np.testing.assert_allclose(got, ref, rtol=1e-12)
    for theta in (0.3, 1.0, jnp.pi / 2, 2.5):
        got = float(kbl.potential_theta_derivative(theta, a, e, l_z, q))
        ref = float(jax.grad(lambda t: kbl.potential_theta(t, a, e, l_z, q))(float(theta)))
        np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_bl_potential_r_non_negative_on_trajectory():
    """R(r) >= 0 wherever a real null geodesic actually travels (the Mino
    v_r² = R(r) identity; kerr_bl.rs potential_r_non_negative test)."""
    from gr_raytracer_tpu.geometry.kerr_bl import KerrBL
    from gr_raytracer_tpu.geometry import kerr_bl as kbl
    from gr_raytracer_tpu.rendering import integrator as integ

    geometry = KerrBL(radius=jnp.asarray(1.0), a=jnp.asarray(0.45), horizon_epsilon=jnp.asarray(1e-3))
    x = jnp.asarray([[0.0, 10.0, jnp.pi / 2, 0.0]])
    p = jnp.asarray([[1.0, -0.8, 0.05, 0.03]])
    solver = geometry.make_solver(x, p)
    y0 = solver.initial_state(x, p)
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(50.0),
        step_size=jnp.asarray(0.01),
        epsilon=jnp.asarray(1e-8),
        max_steps=4000,
    )
    ys, ts, valid, stop = integ.integrate_trajectory(geometry, solver, cfg, y0, 4000)
    r_traj = np.asarray(ys)[np.asarray(valid)[:, 0], 0, 1]
    pot = kbl.potential_r(
        jnp.asarray(r_traj), 1.0, 0.45, solver.e[0], solver.l_z[0], solver.q[0]
    )
    # v_r² = R(r) >= 0 along the path (small negative FP noise tolerated).
    assert float(jnp.min(pot)) > -1e-8


def test_kerr_circular_orbit_velocity_exact():
    """Exact pinned Cartesian circular-orbit four-velocity at y = 3, a = 0,
    r_s = 1 (kerr.rs:768-779): u = (√2, −1/√3, 0, 0) — the prograde orbit
    moves in −x at +y with the axial Killing field (0, −y, x, 0)."""
    from gr_raytracer_tpu.geometry.kerr import Kerr

    geometry = Kerr(radius=jnp.asarray(1.0), a=jnp.asarray(0.0), horizon_epsilon=jnp.asarray(1e-4))
    x = jnp.array([0.0, 0.0, 3.0, 0.0])
    u, ok = geometry.circular_orbit_velocity(x)
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(u), [1.414213562373095, -0.5773502691896257, 0.0, 0.0], atol=1e-8
    )


# ---------------------------------------------------------------------------
# Killing decomposition identities (circular_orbit.rs:249-320)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "geometry,x,probes",
    [
        (
            Schwarzschild(radius=jnp.asarray(1.0), horizon_epsilon=jnp.asarray(1e-4)),
            jnp.array([0.0, 6.0, jnp.pi / 2, 1.1]),
            jnp.array([[1.0, -0.4, 0.02, 0.05], [-1.3, 0.2, 0.0, -0.08]]),
        ),
        (
            Kerr(radius=jnp.asarray(1.0), a=jnp.asarray(0.499), horizon_epsilon=jnp.asarray(1e-4)),
            jnp.array([0.0, 3.0, -4.0, 0.0]),
            jnp.array([[1.0, 0.3, -0.2, 0.1], [-0.8, -0.5, 0.4, 0.0]]),
        ),
        (
            KerrBL(radius=jnp.asarray(1.0), a=jnp.asarray(0.3), horizon_epsilon=jnp.asarray(1e-4)),
            jnp.array([0.0, 5.0, jnp.pi / 2, 0.7]),
            jnp.array([[1.0, -0.4, 0.02, 0.05], [-1.2, 0.1, -0.03, 0.09]]),
        ),
    ],
    ids=("Schwarzschild", "Kerr", "KerrBL"),
)
def test_killing_decomposition_identities(geometry, x, probes):
    """The circular-orbit four-velocity must be normalized (u·u = signature's
    time sign) and satisfy the emitter-energy identity u·p = u^t p_t + u^φ p_φ
    for arbitrary probe vectors, in every geometry/chart
    (circular_orbit.rs:249-320). This is the identity the transport-free
    redshift computer rests on."""
    u, ok = geometry.circular_orbit_velocity(x)
    assert bool(ok)
    time_sign = float(geometry.signature()[0])
    np.testing.assert_allclose(
        float(geometry.inner_product(x, u, u)), time_sign, atol=1e-10
    )

    u_t, u_phi, _ = geometry.circular_orbit_killing_coefficients(x)
    e_t = jnp.zeros_like(x).at[..., 0].set(1.0)
    axial = geometry.axial_killing(x)
    for p in probes:
        p_t = float(geometry.inner_product(x, e_t, p))
        p_phi = float(geometry.inner_product(x, axial, p))
        direct = float(geometry.inner_product(x, u, p))
        np.testing.assert_allclose(
            direct, float(u_t) * p_t + float(u_phi) * p_phi, atol=1e-10
        )


def test_schwarzschild_limit_matches_closed_forms():
    """a = 0 closed forms (circular_orbit.rs:160-171):
    Ω = √(M/r³) and u^t = 1/√(1 − 3M/r)."""
    r_s, r = 1.0, 5.0
    m = 0.5 * r_s
    np.testing.assert_allclose(
        float(circular_orbit.angular_velocity(r_s, 0.0, jnp.asarray(r))),
        np.sqrt(m / r**3),
        rtol=1e-14,
    )
    u_t, _, ok = circular_orbit.killing_coefficients(r_s, 0.0, jnp.asarray(r))
    assert bool(ok)
    np.testing.assert_allclose(float(u_t), 1.0 / np.sqrt(1.0 - 3.0 * m / r), rtol=1e-14)


def test_zamo_properties_across_charts():
    """ZAMO in both Kerr charts at the same physical point: normalized,
    zero angular momentum, chart-invariant Killing coefficients, and a = 0
    reduction to the static observer (circular_orbit.rs:183-243)."""
    r_s, a = 1.0, 0.499
    kerr = Kerr(radius=jnp.asarray(r_s), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-4))
    kbl = KerrBL(radius=jnp.asarray(r_s), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-4))

    # Same physical point: BL (r=5, θ=π/2, φ=0) ≙ Cartesian (5, a, 0).
    pos_bl = jnp.array([0.0, 5.0, jnp.pi / 2, 0.0])
    pos_ks = jnp.array([0.0, 5.0, a, 0.0])

    for geom, pos in ((kerr, pos_ks), (kbl, pos_bl)):
        zamo = geom.zamo_velocity(pos)
        axial = geom.axial_killing(pos)
        np.testing.assert_allclose(float(geom.inner_product(pos, zamo, zamo)), -1.0, atol=1e-9)
        np.testing.assert_allclose(float(geom.inner_product(pos, zamo, axial)), 0.0, atol=1e-9)

    # Chart-invariant coefficients: the BL components ARE (u^t, u^φ).
    u_t, u_phi = circular_orbit.zamo_killing_coefficients(r_s, a, 5.0, jnp.pi / 2)
    zamo_bl = kbl.zamo_velocity(pos_bl)
    np.testing.assert_allclose(float(zamo_bl[0]), float(u_t), rtol=1e-12)
    np.testing.assert_allclose(float(zamo_bl[3]), float(u_phi), rtol=1e-12)

    # a = 0: ZAMO reduces to the static observer.
    _, u_phi0 = circular_orbit.zamo_killing_coefficients(1.0, 0.0, 5.0, 1.1)
    np.testing.assert_allclose(float(u_phi0), 0.0, atol=1e-15)
    schw = Schwarzschild(radius=jnp.asarray(1.0), horizon_epsilon=jnp.asarray(1e-4))
    pos_s = jnp.array([0.0, 5.0, 1.1, 0.3])
    np.testing.assert_allclose(
        np.asarray(schw.zamo_velocity(pos_s)),
        np.asarray(schw.stationary_velocity(pos_s)),
        atol=1e-15,
    )


# ---------------------------------------------------------------------------
# BL chart accessors and solver structure (kerr_bl.rs:705-712, 808-840, 1576+)
# ---------------------------------------------------------------------------


def test_bl_metric_is_symmetric():
    g = np.asarray(metric_bl(1.0, 0.4, jnp.asarray(4.0), jnp.asarray(1.1)))
    np.testing.assert_allclose(g, g.T, atol=1e-15)


def test_bl_radial_coordinate_native_and_cartesian_input():
    """radial_coordinate gives BL r for both the native BL chart and the
    Cartesian embedding of the same physical point (kerr_bl.rs:808-840) —
    disc intersections hand it Cartesian points."""
    a = 0.5
    kbl = KerrBL(radius=jnp.asarray(1.0), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-4))
    bl = jnp.array([0.0, 7.5, jnp.pi / 2, 0.8])
    cart = charts.bl_to_cartesian(a, bl)
    np.testing.assert_allclose(float(kbl.radial_coordinate(bl, charts.BOYER_LINDQUIST)), 7.5)
    np.testing.assert_allclose(
        float(kbl.radial_coordinate(cart, charts.CARTESIAN)), 7.5, rtol=1e-10
    )
    # Off the equator too (the full implicit Kerr-Schild relation).
    bl2 = jnp.array([0.0, 7.5, 1.2, 0.8])
    cart2 = charts.bl_to_cartesian(a, bl2)
    np.testing.assert_allclose(
        float(kbl.radial_coordinate(cart2, charts.CARTESIAN)), 7.5, rtol=1e-10
    )


def test_bl_geodesic_rhs_structure():
    """Mino-time ODE layout (kerr_bl.rs:1576-1620): ẏ = (dt, v_r, v_θ, dφ,
    R'(r)/2, Θ'(θ)/2, 0, 0) — positions 4/5 are the velocities' own slots and
    the conserved tail stays frozen."""
    from gr_raytracer_tpu.geometry import kerr_bl as kbl

    r_s, a, e, l_z, q = 1.0, 0.5, 1.0, 3.0, 1.0
    solver = kbl.KerrBLSolver(
        radius=jnp.asarray(r_s),
        a=jnp.asarray(a),
        e=jnp.asarray(e),
        l_z=jnp.asarray(l_z),
        q=jnp.asarray(q),
    )
    y = jnp.array([0.0, 5.0, 1.2, 0.3, 0.1, -0.05, 0.0, 0.0])
    dy = solver.rhs(y)
    np.testing.assert_allclose(float(dy[1]), 0.1, rtol=1e-15)
    np.testing.assert_allclose(float(dy[2]), -0.05, rtol=1e-15)
    np.testing.assert_allclose(
        float(dy[4]), float(kbl.potential_r_derivative(5.0, r_s, a, e, l_z, q)) / 2.0, rtol=1e-14
    )
    np.testing.assert_allclose(
        float(dy[5]), float(kbl.potential_theta_derivative(1.2, a, e, l_z, q)) / 2.0, rtol=1e-14
    )
    np.testing.assert_allclose(float(dy[6]), 0.0, atol=0.0)
    np.testing.assert_allclose(float(dy[7]), 0.0, atol=0.0)


# ---------------------------------------------------------------------------
# Lorentz-boosted tetrads (kerr.rs:560-640, schwarzschild.rs:442-500)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "geometry,cart",
    [
        (
            Schwarzschild(radius=jnp.asarray(2.0), horizon_epsilon=jnp.asarray(1e-5)),
            jnp.array([2.0, 3.0, 4.0, 5.0]),
        ),
        (
            Kerr(radius=jnp.asarray(2.0), a=jnp.asarray(0.0), horizon_epsilon=jnp.asarray(1e-5)),
            jnp.array([2.0, 3.0, 4.0, 5.0]),
        ),
        (
            Kerr(radius=jnp.asarray(1.0), a=jnp.asarray(0.45), horizon_epsilon=jnp.asarray(1e-5)),
            jnp.array([0.0, 6.0, -2.0, 1.5]),
        ),
        (
            KerrBL(radius=jnp.asarray(1.0), a=jnp.asarray(0.45), horizon_epsilon=jnp.asarray(1e-5)),
            jnp.array([0.0, 6.0, -2.0, 1.5]),
        ),
    ],
    ids=("Schwarzschild", "Kerr-a0", "Kerr", "KerrBL"),
)
def test_lorentz_transformed_tetrad_orthonormal(geometry, cart):
    """Boosting the geometry tetrad to a static observer keeps it orthonormal,
    maps e_t onto the observer's four-velocity, and keeps t − z null
    (test_lorentz_transformed_tetrad_orthonormal, kerr.rs:560-640)."""
    x = charts.from_cartesian(cart, geometry.chart, geometry.spin)
    velocity = geometry.stationary_velocity(x)
    tet = geometry.tetrad(x)
    lam = geometry.lorentz_transformation(x, velocity)
    boosted = jnp.einsum("ij,kj->ki", lam, tet)

    validate_tetrad(geometry, x, boosted, tol=1e-9)
    np.testing.assert_allclose(np.asarray(boosted[0]), np.asarray(velocity), atol=1e-9)
    k = boosted[0] - boosted[3]
    np.testing.assert_allclose(float(geometry.inner_product(x, k, k)), 0.0, atol=1e-8)


def test_killing_coefficients_grad_finite_near_marginal_orbit():
    """∂u_t/∂a must stay finite arbitrarily close to the marginal orbit
    (ut_pre → 0⁻): u_t = 1/√(−ut_pre) is finite there but its unclamped
    derivative ~ (−ut_pre)^{-3/2} overflows f32 long before the value does —
    the knife edge that NaN'd the 256² joint fit (circular_orbit.py clamp)."""
    r_s, a = 1.0, 0.3513

    def u_t_at(aa, r):
        u_t, _, _ = circular_orbit.killing_coefficients(r_s, aa, r)
        return jnp.sum(u_t)

    def ut_pre(r):
        omega = circular_orbit.angular_velocity(r_s, a, r)
        g_tt, g_tphi, g_phiphi = circular_orbit.bl_metric_components(r_s, a, r)
        return float(g_tt + 2.0 * omega * g_tphi + omega * omega * g_phiphi)

    # Bisect (f64) a radius with −ut_pre ∈ (0, 1e-9): the derivative
    # (−ut_pre)^{-3/2} is ≥ 1e13 per unit cotangent there and grows without
    # bound toward the edge (past f32 max within its last few ulps of
    # ut_pre); the clamp caps it at eps^{-3/2} = 1e18 and routes exact
    # zeros on the clamped side. This pins finiteness on the steepest
    # approach representable without engineering subnormal ut_pre values.
    lo, hi = 1.0, 2.0
    assert ut_pre(lo) > 0.0 > ut_pre(hi)
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if ut_pre(mid) < 0.0:
            hi = mid
        else:
            lo = mid
    assert -1e-9 < ut_pre(hi) < 0.0
    for dtype in (jnp.float64, jnp.float32):
        for eps in (1e-3, 0.0, -1e-4):
            g = jax.grad(u_t_at)(
                jnp.asarray(a, dtype), jnp.asarray([hi + eps], dtype)
            )
            assert np.isfinite(float(g)), f"d(u_t)/da not finite at {dtype} eps={eps}"


def test_celestial_color_grad_in_a_finite_with_ring_singularity_lane():
    """∂(celestial color)/∂a must ignore captured lanes entirely: a captured
    lane's final state near the Kerr ring singularity (BL r → 0) makes the
    KS inverse metric inf − inf there, and before the input-side
    sanitization in scene._celestial_color its masked NaN leaked into the
    spin gradient as 0·NaN (the 256² joint-fit knife edge)."""
    from gr_raytracer_tpu import presets
    from gr_raytracer_tpu.rendering import integrator as integ
    from gr_raytracer_tpu.rendering import scene as scn
    from gr_raytracer_tpu.rendering.redshift import RayFrequencyData

    dtype = jnp.float64
    base = presets.kerr_flagship_params(dtype)
    a0 = jnp.asarray(0.44, dtype)

    n, k, w = 2, 1, 12
    # Lane 0: escaped, far field. Lane 1: captured, parked ON the ring
    # (rho = a, z = 0 → r = 0 exactly).
    def color_sum(a):
        scene = presets.build_kerr_flagship(dict(base, a=a), 4, 4, max_steps=100)
        y = jnp.asarray(
            [[0.0, 30.0, 4.0, 3.0, 1.0, -1.0, 0.1, 0.05],
             [0.0, float(a0), 0.0, 0.0, 1.0, -5.0, 3.0, 0.5]], dtype
        )
        res = integ.IntegrationResult(
            y=y,
            affine=jnp.zeros((n,), dtype),
            steps=jnp.asarray([40, 90], jnp.int32),
            stop_code=jnp.asarray([integ.CELESTIAL, integ.HORIZON], jnp.int32),
            ev_kind=jnp.full((n, k), -1, jnp.int32),
            ev_data=jnp.zeros((n, k, w), dtype),
            ev_count=jnp.zeros((n,), jnp.int32),
            ev_overflow=jnp.zeros((n,), jnp.bool_),
            kk_drift=jnp.zeros((n,), dtype),
            const_drift=jnp.zeros((n, 0), dtype),
            h=jnp.zeros((n,), dtype),
            retries=jnp.zeros((n,), jnp.int32),
        )
        freq = RayFrequencyData(
            observer_energy=jnp.ones((n,), dtype),
            p_t=jnp.full((n,), -1.0, dtype),
            p_phi=jnp.full((n,), 0.1, dtype),
        )
        solver = scene.geometry.make_solver(y[:, :4], y[:, 4:])
        c = scn._celestial_color(scene, freq, solver, res)
        return jnp.sum(c[..., :3])

    g = jax.grad(color_sum)(a0)
    assert np.isfinite(float(g)), f"d(celestial)/da = {float(g)}"
