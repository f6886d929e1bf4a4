"""Physics oracles: special-relativistic Doppler closed forms, gravitational
redshift, Luminet disc redshift, KS-vs-BL trajectory agreement, and the
independent u(φ) orbit-equation cross-check.

Mirrors the reference's analytic test suite (redshift.rs:115-397,
schwarzschild.rs:327-708, kerr_bl.rs:1126-1574)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry import circular_orbit
from gr_raytracer_tpu.geometry.euclidean import EuclideanSpace
from gr_raytracer_tpu.geometry.kerr import Kerr
from gr_raytracer_tpu.geometry.kerr_bl import KerrBL
from gr_raytracer_tpu.geometry.schwarzschild import Schwarzschild
from gr_raytracer_tpu.rendering import integrator as integ
from gr_raytracer_tpu.rendering.redshift import ray_frequency_data, killing_redshift

PI = float(np.pi)


# ---------------------------------------------------------------------------
# Doppler closed forms (redshift.rs:115-142)
# ---------------------------------------------------------------------------


def _doppler(emitter_velocity):
    geometry = EuclideanSpace()
    position = jnp.zeros(4)
    # Observer at +x, emitter toward -x; traced (past-directed) photon
    # momentum p = N - e_t with N = -x_hat.
    momentum = jnp.array([-1.0, -1.0, 0.0, 0.0])
    observer = jnp.array([1.0, 0.0, 0.0, 0.0])
    obs_e = geometry.inner_product(position, observer, momentum)
    emit_e = geometry.inner_product(position, emitter_velocity, momentum)
    return float(obs_e / emit_e)


def test_doppler_closed_forms():
    v = 0.5
    gamma = 1.0 / np.sqrt(1.0 - v * v)
    approaching = jnp.array([gamma, gamma * v, 0.0, 0.0])
    receding = jnp.array([gamma, -gamma * v, 0.0, 0.0])
    transverse = jnp.array([gamma, 0.0, gamma * v, 0.0])
    np.testing.assert_allclose(_doppler(approaching), 1.0 / (gamma * (1.0 - v)), rtol=1e-12)
    np.testing.assert_allclose(_doppler(receding), 1.0 / (gamma * (1.0 + v)), rtol=1e-12)
    np.testing.assert_allclose(_doppler(transverse), 1.0 / gamma, rtol=1e-12)


# ---------------------------------------------------------------------------
# Gravitational redshift (redshift.rs:233-277)
# ---------------------------------------------------------------------------


def test_gravitational_redshift_static_emitters():
    """g = sqrt(a_em / a_obs) for static emitter/observer, pure algebra."""
    r_s = 1.0
    geometry = Schwarzschild(radius=jnp.asarray(r_s), horizon_epsilon=jnp.asarray(1e-4))
    r_em, r_obs = 3.0, 20.0
    x_em = jnp.array([0.0, r_em, PI / 2, 0.0])
    x_obs = jnp.array([0.0, r_obs, PI / 2, 0.0])
    # Radial photon: conserved E = a v^t; any consistent null p works since
    # only p_t enters for static observers.
    a_em = 1.0 - r_s / r_em
    a_obs = 1.0 - r_s / r_obs
    p_em = jnp.array([1.0 / a_em, -1.0, 0.0, 0.0])  # null: a v_t^2 = v_r^2/a
    p_em = p_em.at[1].set(-np.sqrt(a_em * (1.0 / a_em) ** 2 * a_em))
    u_em = geometry.stationary_velocity(x_em)
    u_obs = geometry.stationary_velocity(x_obs)
    # E_em = <u_em, p(at emitter)>; conserved p_t means <u, p> = p_t u^t = E u^t/...
    # use Killing pairing: E_obs/E_em = u_obs^t p_t / (u_em^t p_t) = sqrt(a_em/a_obs).
    g = float(u_obs[0] / u_em[0])
    np.testing.assert_allclose(g, np.sqrt(a_em / a_obs), rtol=1e-12)


def test_gravitational_redshift_through_integration():
    """Trace a ray from a static camera to the celestial sphere and compare
    the stationary-emitter redshift with sqrt(a_cam/a_inf) ~ sqrt(a_cam)."""
    r_s = 1.0
    geometry = Schwarzschild(radius=jnp.asarray(r_s), horizon_epsilon=jnp.asarray(1e-4))
    from gr_raytracer_tpu.rendering import camera as cam

    position = jnp.array([0.0, 5.0, PI / 2, 0.0])
    velocity = geometry.stationary_velocity(position)
    # The default Schwarzschild tetrad faces radially outward (z = +r), so
    # the center ray escapes (the CLI needs --theta pi to face the hole).
    camera = cam.build_camera(geometry, position, velocity, PI / 4, 3, 3)
    x, p = cam.pixel_rays(camera, jnp.asarray([1.0]), jnp.asarray([1.0]))
    solver = geometry.make_solver(x, p)
    y0 = solver.initial_state(x, p)
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(5000.0),
        step_size=jnp.asarray(0.01),
        epsilon=jnp.asarray(1e-10),
        max_steps=100000,
    )
    res = integ.integrate_rays(geometry, solver, cfg, y0, integ.no_objects_segment_fn(1), 1)
    assert int(res.stop_code[0]) == integ.CELESTIAL
    freq = ray_frequency_data(geometry, x, p, camera.velocity)
    x_last = res.y[..., :4]
    p_last = solver.momentum(res.y)
    u_stat = geometry.stationary_velocity(x_last)
    emitter_energy = geometry.inner_product(x_last, u_stat, p_last)
    g = float(freq.observer_energy[0] / emitter_energy[0])
    # Emitter far out (a≈1), observer deep at r=5: infalling photon gains
    # energy, g = sqrt(a_em / a_obs) > 1 (blueshift).
    a_cam = 1.0 - r_s / 5.0
    a_far = 1.0 - r_s / float(x_last[0, 1])
    np.testing.assert_allclose(g, np.sqrt(a_far / a_cam), rtol=1e-6)


# ---------------------------------------------------------------------------
# Luminet (1979) disc redshift closed form (redshift.rs:173-230)
# ---------------------------------------------------------------------------


def test_luminet_disc_redshift():
    """For a circular-orbit emitter: 1+z = (1 - 3M/r)^{-1/2} (1 + Ω L/E)
    where (E, L) = photon's (−p_t, p_φ) — chart-independent Killing pairing."""
    r_s = 1.0
    m = r_s / 2.0
    geometry = Schwarzschild(radius=jnp.asarray(r_s), horizon_epsilon=jnp.asarray(1e-4))
    r = 4.0
    u_t, u_phi, ok = geometry.orbit_coefficients_at_radius(jnp.asarray(r))
    assert bool(ok)
    omega = float(circular_orbit.angular_velocity(r_s, 0.0, r))

    # Photon with conserved (p_t, p_phi) in (+,---): p_t = a v^t > 0,
    # p_phi = -r^2 v^phi (covariant). Emitter energy = u^t p_t + u^phi p_phi.
    for (p_t, p_phi) in [(1.0, 0.0), (1.0, 1.3), (1.0, -2.0)]:
        e_em = float(u_t) * p_t + float(u_phi) * p_phi
        # Static observer at infinity: E_obs = p_t.
        g = p_t / e_em
        # Closed form with u^t = (1 − 3M/r)^{-1/2} and u^φ = Ω u^t:
        #   1 + z = E_em/E_obs = (1 − 3M/r)^{-1/2} (1 + Ω p_φ / p_t)
        expected = 1.0 / (np.power(1.0 - 3.0 * m / r, -0.5) * (1.0 + omega * p_phi / p_t))
        np.testing.assert_allclose(g, expected, rtol=1e-12)


# ---------------------------------------------------------------------------
# Independent orbit-equation oracle (schwarzschild.rs:327-378, 667-708)
# ---------------------------------------------------------------------------


def _orbit_equation_trajectory(r0, du_dphi_sign, b, r_s, phi_max, n=200000):
    """Integrate d²u/dφ² = −u + (3 r_s / 2) u² with u = 1/r via RK4 in numpy —
    an independent formulation of Schwarzschild null geodesics.
    du_dphi_sign = +1 for an ingoing ray (u grows as φ advances)."""
    u = 1.0 / r0
    # From the impact parameter: (du/dφ)² = 1/b² − u²(1 − r_s u)
    du = du_dphi_sign * np.sqrt(max(1.0 / b**2 - u * u * (1.0 - r_s * u), 0.0))
    h = phi_max / n
    traj = [(0.0, u)]

    def f(state):
        u, du = state
        return np.array([du, -u + 1.5 * r_s * u * u])

    s = np.array([u, du])
    phi = 0.0
    for _ in range(n):
        k1 = f(s)
        k2 = f(s + 0.5 * h * k1)
        k3 = f(s + 0.5 * h * k2)
        k4 = f(s + h * k3)
        s = s + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
        phi += h
        traj.append((phi, s[0]))
        if s[0] <= 0.0 or 1.0 / max(s[0], 1e-30) > 1e4:
            break
    return np.array(traj)


def test_schwarzschild_trajectory_vs_orbit_equation():
    """Trace an equatorial ray with the production integrator and compare
    r(φ) against the independent u(φ) oracle (tolerance 0.1 as in the
    reference, schwarzschild.rs:667-708)."""
    r_s = 1.0
    geometry = Schwarzschild(radius=jnp.asarray(r_s), horizon_epsilon=jnp.asarray(1e-4))
    r0 = 10.0
    x0 = jnp.array([[0.0, r0, PI / 2, 0.0]])
    # Null ray in the equatorial plane with impact parameter b:
    # a v_t² = v_r²/a + r² v_φ²; choose v_φ, solve v_r (ingoing).
    b = 6.0
    a0 = 1.0 - r_s / r0
    v_t = 1.0 / a0  # E = 1
    v_phi = b / (r0 * r0)  # L = r² v_φ = b when E = 1
    v_r_sq = (a0 * v_t * v_t - r0 * r0 * v_phi * v_phi) * a0
    v_r = -np.sqrt(float(v_r_sq))
    p0 = jnp.array([[v_t, v_r, 0.0, v_phi]])

    solver = geometry.make_solver(x0, p0)
    y0 = solver.initial_state(x0, p0)
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(1000.0),
        step_size=jnp.asarray(0.01),
        epsilon=jnp.asarray(1e-10),
        max_steps=60000,
    )
    ys, ts, valid, stop = integ.integrate_trajectory(geometry, solver, cfg, y0, 4000)
    ys = np.asarray(ys[:, 0])
    ok = np.asarray(valid[:, 0])
    r_traj = ys[ok, 1]
    phi_traj = ys[ok, 3]

    oracle = _orbit_equation_trajectory(r0, +1.0, b, r_s, phi_max=float(phi_traj.max()))
    # Compare r at matching φ via interpolation.
    sel = (phi_traj > 0.05) & (phi_traj < oracle[-1, 0] * 0.95)
    u_interp = np.interp(phi_traj[sel], oracle[:, 0], oracle[:, 1])
    np.testing.assert_allclose(r_traj[sel], 1.0 / u_interp, atol=0.1)


# ---------------------------------------------------------------------------
# Cross-chart trajectory agreement (kerr_bl.rs:1126-1213, 1346-1574)
# ---------------------------------------------------------------------------


def _trace_to_stop(geometry, x0, p0, max_steps=200000, max_radius=100.0):
    solver = geometry.make_solver(x0, p0)
    y0 = solver.initial_state(x0, p0)
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(max_radius),
        step_size=jnp.asarray(0.01),
        epsilon=jnp.asarray(1e-10),
        max_steps=max_steps,
    )
    return solver, integ.integrate_rays(
        geometry, solver, cfg, y0, integ.no_objects_segment_fn(1), 1
    )


def test_kerr_bl_a0_matches_schwarzschild_endpoint():
    r_s = 1.0
    sch = Schwarzschild(radius=jnp.asarray(r_s), horizon_epsilon=jnp.asarray(1e-4))
    kbl = KerrBL(radius=jnp.asarray(r_s), a=jnp.asarray(0.0), horizon_epsilon=jnp.asarray(1e-4))

    x0 = jnp.array([[0.0, 8.0, PI / 2, 0.0]])
    b = 5.5
    a0 = 1.0 - r_s / 8.0
    v_t = 1.0 / a0
    v_phi = b / 64.0
    v_r = -float(np.sqrt((a0 * v_t**2 - 64.0 * v_phi**2) * a0))
    p0 = jnp.array([[v_t, v_r, 0.0, v_phi]])

    _, res_s = _trace_to_stop(sch, x0, p0)

    # Same ray in BL (identical coordinates at a=0, signature flip doesn't
    # change the geodesic — the momentum is the same contravariant vector).
    _, res_b = _trace_to_stop(kbl, x0, p0)

    assert int(res_s.stop_code[0]) == int(res_b.stop_code[0]) == integ.CELESTIAL
    # Compare escape direction (θ, φ) at the celestial sphere.
    np.testing.assert_allclose(
        float(res_s.y[0, 3]) % (2 * PI), float(res_b.y[0, 3]) % (2 * PI), atol=5e-3
    )
    np.testing.assert_allclose(float(res_s.y[0, 2]), float(res_b.y[0, 2]), atol=5e-3)


def test_kerr_ks_vs_bl_trajectory_endpoint():
    """The same physical photon traced in Kerr-Schild Cartesian and in BL
    escapes in the same direction (different time slicings make intermediate
    points differ; endpoints on the celestial sphere agree)."""
    r_s, a = 1.0, 0.45
    kerr = Kerr(radius=jnp.asarray(r_s), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-4))
    kbl = KerrBL(radius=jnp.asarray(r_s), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-4))

    bl_x = jnp.array([[0.0, 8.0, PI / 2, 0.0]])
    # Build a null BL momentum: pick v_phi, v_theta=0, solve v_t from nullness.
    g = kbl.metric(bl_x)[0]
    v_phi, v_r = 0.06, -0.9
    # g_tt v_t² + 2 g_tφ v_t v_φ + g_rr v_r² + g_φφ v_φ² = 0
    A = float(g[0, 0])
    B = 2.0 * float(g[0, 3]) * v_phi
    C = float(g[1, 1]) * v_r**2 + float(g[3, 3]) * v_phi**2
    v_t = (-B + np.sqrt(B * B - 4 * A * C)) / (2 * A)
    if v_t < 0:
        v_t = (-B - np.sqrt(B * B - 4 * A * C)) / (2 * A)
    p_bl = jnp.array([[v_t, v_r, 0.0, v_phi]])

    _, res_b = _trace_to_stop(kbl, bl_x, p_bl, max_radius=200.0)

    cart_x = charts.bl_to_cartesian(a, bl_x)
    j = charts.jacobian_bl_to_cartesian(r_s, a, bl_x[0, 1], bl_x[0, 2], bl_x[0, 3])
    p_cart = (j @ p_bl[0])[None, :]
    _, res_k = _trace_to_stop(kerr, cart_x, p_cart, max_radius=200.0)

    assert int(res_b.stop_code[0]) == int(res_k.stop_code[0]) == integ.CELESTIAL
    # BL and KS azimuths differ by the finite chart twist ∫ a/Δ dr along the
    # path (the reference's cross-chart trajectory test likewise uses a
    # "physically-reasoned tolerance", kerr_bl.rs:1126-1213). θ and r are
    # chart-invariant here and must agree tightly; the Cartesian escape
    # direction agrees to within the twist scale.
    r_b, th_b = float(res_b.y[0, 1]), float(res_b.y[0, 2])
    ks_bl = charts.cartesian_to_bl(a, res_k.y[0, :4])
    np.testing.assert_allclose(th_b % PI, float(ks_bl[2]) % PI, atol=1e-3)
    d_b = np.array(charts.bl_to_cartesian(a, res_b.y[0, :4]))[1:]
    d_k = np.array(res_k.y[0, 1:4])
    d_b = d_b / np.linalg.norm(d_b)
    d_k = d_k / np.linalg.norm(d_k)
    twist_budget = float(a) * (1.0 / 8.0)  # upper bound on ∫ a/Δ dr
    assert np.arccos(np.clip(np.dot(d_b, d_k), -1, 1)) < 1.5 * twist_budget
    # Conserved (E, L_z) along both charts agree exactly (tested in
    # test_geometry.test_cross_chart_conserved_quantities).


def test_null_condition_preserved_kerr_bl():
    """k·k stays < 1e-4 along a KerrBL ray (kerr_bl.rs:1300-1343)."""
    r_s, a = 1.0, 0.45
    kbl = KerrBL(radius=jnp.asarray(r_s), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-4))
    bl_x = jnp.array([[0.0, 8.0, 1.2, 0.3]])
    g = kbl.metric(bl_x)[0]
    v_phi, v_r, v_th = 0.05, -0.8, 0.05
    A = float(g[0, 0])
    B = 2.0 * float(g[0, 3]) * v_phi
    C = float(g[1, 1]) * v_r**2 + float(g[2, 2]) * v_th**2 + float(g[3, 3]) * v_phi**2
    v_t = (-B + np.sqrt(B * B - 4 * A * C)) / (2 * A)
    if v_t < 0:
        v_t = (-B - np.sqrt(B * B - 4 * A * C)) / (2 * A)
    p_bl = jnp.array([[v_t, v_r, v_th, v_phi]])

    solver = kbl.make_solver(bl_x, p_bl)
    y0 = solver.initial_state(bl_x, p_bl)
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(100.0),
        step_size=jnp.asarray(0.01),
        epsilon=jnp.asarray(1e-10),
        max_steps=100000,
        track_invariants=True,
    )
    res = integ.integrate_rays(kbl, solver, cfg, y0, integ.no_objects_segment_fn(1), 1)
    assert float(res.kk_drift[0]) < 1e-4
    assert float(jnp.max(res.const_drift)) < 1e-4


# ---------------------------------------------------------------------------
# Rotational symmetry of trajectories (schwarzschild.rs:604-646)
# ---------------------------------------------------------------------------


def test_trajectories_equal_with_rotated_momentum():
    """Two camera rays whose momenta are 90°-rotated copies of each other
    produce trajectories that are the same rotation of each other, step by
    step (spherical symmetry of Schwarzschild)."""
    from gr_raytracer_tpu.rendering import camera as cam

    radius = 2.0
    geometry = Schwarzschild(radius=jnp.asarray(radius), horizon_epsilon=jnp.asarray(1e-4))
    r0 = 10.0
    a = 1.0 - radius / r0
    position = jnp.array([2.0, r0, PI / 2, 0.0])
    velocity = jnp.array([1.0 / a, -np.sqrt(radius / r0), 0.0, 0.0])  # freely falling
    camera = cam.build_camera(geometry, position, velocity, PI / 2, 11, 11)

    rows = jnp.asarray([5.0, 0.0])
    cols = jnp.asarray([10.0, 5.0])
    x, p = cam.pixel_rays(camera, rows, cols)

    # Precondition: the two momenta are 90°-rotated (θ and φ components swap).
    np.testing.assert_allclose(float(p[0, 2]), float(p[1, 3]), atol=1e-12)
    np.testing.assert_allclose(float(p[0, 3]), float(p[1, 2]), atol=1e-12)

    solver = geometry.make_solver(x, p)
    y0 = solver.initial_state(x, p)
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(1000.0),
        step_size=jnp.asarray(0.01),
        epsilon=jnp.asarray(1e-5),
        max_steps=3000,
    )
    ys, ts, valid, stop = integ.integrate_trajectory(geometry, solver, cfg, y0, 3000)
    ys = np.asarray(ys)          # [S, 2, 8]
    valid = np.asarray(valid)    # [S, 2]

    # Accepted steps only, per lane (the SIMD retry loop interleaves
    # rejections differently per lane).
    steps_a = ys[valid[:, 0], 0]
    steps_b = ys[valid[:, 1], 1]
    assert steps_a.shape[0] == steps_b.shape[0]  # equal step counts (reference asserts ==)

    cart_a = np.asarray(charts.to_cartesian(jnp.asarray(steps_a[:, :4]), charts.SPHERICAL))
    cart_b = np.asarray(charts.to_cartesian(jnp.asarray(steps_b[:, :4]), charts.SPHERICAL))
    # Rotation mapping from the reference: x_a = x_b, y_a = -z_b, z_a = -y_b.
    np.testing.assert_allclose(cart_a[:, 1], cart_b[:, 1], atol=1e-5)
    np.testing.assert_allclose(cart_a[:, 2], -cart_b[:, 3], atol=1e-5)
    np.testing.assert_allclose(cart_a[:, 3], -cart_b[:, 2], atol=1e-5)


# ---------------------------------------------------------------------------
# SR Doppler through real camera rays (redshift.rs:280-347)
# ---------------------------------------------------------------------------


def _flat_space_redshift_for(emitter_velocity):
    """Reference flat_space_redshift_for: static camera at x = +10 shoots its
    CENTER ray toward an emitter at x = +5 moving with the given velocity;
    redshift from the actual camera-produced momentum."""
    from gr_raytracer_tpu.rendering import camera as cam
    from gr_raytracer_tpu.rendering.redshift import ray_frequency_data, redshift_from_energies

    geometry = EuclideanSpace()
    position = jnp.array([0.0, 10.0, 0.0, 0.0])
    camera = cam.build_camera(
        geometry, position, jnp.array([1.0, 0.0, 0.0, 0.0]), PI / 2, 11, 11
    )
    x, p = cam.pixel_rays(camera, jnp.asarray([5.0]), jnp.asarray([5.0]))
    assert float(p[0, 1]) < 0.0  # marches toward the emitter (-x)
    freq = ray_frequency_data(geometry, x, p, camera.velocity)
    emitter_position = jnp.array([0.0, 5.0, 0.0, 0.0])
    emitter_energy = geometry.inner_product(
        emitter_position, jnp.broadcast_to(emitter_velocity, p.shape), p
    )
    return float(redshift_from_energies(emitter_energy, freq.observer_energy)[0])


def test_camera_ray_doppler_closed_forms():
    v = 0.2
    gamma = 1.0 / np.sqrt(1.0 - v * v)
    # At rest: no shift.
    np.testing.assert_allclose(
        _flat_space_redshift_for(jnp.array([1.0, 0.0, 0.0, 0.0])), 1.0, rtol=1e-12
    )
    # Toward the camera (+x): blueshift 1/(γ(1−v)).
    np.testing.assert_allclose(
        _flat_space_redshift_for(jnp.array([gamma, gamma * v, 0.0, 0.0])),
        1.0 / (gamma * (1.0 - v)),
        rtol=1e-12,
    )
    # Away (−x): redshift 1/(γ(1+v)).
    np.testing.assert_allclose(
        _flat_space_redshift_for(jnp.array([gamma, -gamma * v, 0.0, 0.0])),
        1.0 / (gamma * (1.0 + v)),
        rtol=1e-12,
    )
    # Transverse: time dilation only, 1/γ.
    np.testing.assert_allclose(
        _flat_space_redshift_for(jnp.array([gamma, 0.0, gamma * v, 0.0])),
        1.0 / gamma,
        rtol=1e-12,
    )


def test_redshift_is_invariant_under_momentum_negation():
    """g must not depend on the traced ray's time orientation: negating the
    photon momentum flips both energies and the ratio cancels
    (redshift.rs:148-168)."""
    geometry = EuclideanSpace()
    from gr_raytracer_tpu.rendering.redshift import redshift_from_energies

    position = jnp.zeros(4)
    observer = jnp.array([1.0, 0.0, 0.0, 0.0])
    v = 0.2
    gamma = 1.0 / np.sqrt(1.0 - v * v)
    emitter = jnp.array([gamma, gamma * v, 0.0, 0.0])
    momentum = jnp.array([-1.0, -1.0, 0.0, 0.0])

    def g_for(p):
        return float(
            redshift_from_energies(
                geometry.inner_product(position, emitter, p),
                geometry.inner_product(position, observer, p),
            )
        )

    np.testing.assert_allclose(g_for(momentum), g_for(-momentum), rtol=1e-15)


def test_carter_constant_conserved_along_ks_trajectory():
    """Killing-tensor oracle BEYOND the reference's test set: the Carter
    constant Q is conserved along a geodesic integrated ENTIRELY in the
    Kerr-Schild Cartesian chart (generic Hamiltonian solver, no knowledge of
    Q) — extracted post-hoc at each step by converting state and momentum to
    Boyer-Lindquist (kerr_bl.rs:536-568 formula). Pins the KS integrator,
    the chart conversion, AND the BL Jacobian simultaneously."""
    from gr_raytracer_tpu.geometry import chart as charts
    from gr_raytracer_tpu.geometry.kerr import Kerr
    from gr_raytracer_tpu.geometry.kerr_bl import KerrBL
    from gr_raytracer_tpu.rendering import integrator as integ

    r_s, a = 1.0, 0.45
    kerr = Kerr(radius=jnp.asarray(r_s), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-3))
    kbl = KerrBL(radius=jnp.asarray(r_s), a=jnp.asarray(a), horizon_epsilon=jnp.asarray(1e-3))

    # An inclined, non-equatorial ray (nonzero Q) aimed to pass near the hole.
    x0 = jnp.asarray([[0.0, -12.0, 1.5, 2.0]])
    sp = jnp.asarray([0.5, 0.2, 0.9])
    g = kerr.metric(x0[0])
    # Null-normalize the time component against the spatial direction.
    spat = jnp.concatenate([jnp.zeros(1), sp])
    a_t = g[0, 0]
    b_t = 2.0 * (g[0, 1:] @ sp)
    c_t = spat[1:] @ g[1:, 1:] @ sp
    pt = (-b_t - jnp.sqrt(b_t * b_t - 4 * a_t * c_t)) / (2 * a_t)  # future root
    p0 = jnp.concatenate([pt[None], sp])[None, :]
    np.testing.assert_allclose(float(kerr.inner_product(x0[0], p0[0], p0[0])), 0.0, atol=1e-12)

    solver = kerr.make_solver(x0, p0)
    y0 = solver.initial_state(x0, p0)
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(40.0),
        step_size=jnp.asarray(0.02),
        epsilon=jnp.asarray(1e-10),
        max_steps=4000,
    )
    ys, ts, valid, stop = integ.integrate_trajectory(kerr, solver, cfg, y0, 4000)
    ys = np.asarray(ys)[np.asarray(valid)[:, 0], 0]
    assert ys.shape[0] > 80

    qs = []
    for row in ys[:: max(len(ys) // 40, 1)]:
        x_cart = jnp.asarray(row[:4])
        p_cart = solver.momentum(jnp.asarray(row)[None, :])[0]  # contravariant
        x_bl = charts.cartesian_to_bl(a, x_cart)
        j = charts.jacobian_bl_to_cartesian(r_s, a, x_bl[1], x_bl[2], x_bl[3])
        p_bl = jnp.linalg.solve(j, p_cart)
        e, l_z, q = kbl.conserved_from_bl(x_bl, p_bl)
        qs.append(float(q))
    qs = np.asarray(qs)
    assert qs[0] > 0.1  # genuinely non-equatorial
    np.testing.assert_allclose(qs, qs[0], rtol=2e-5)
