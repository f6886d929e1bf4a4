"""RKF45 + integrator tests (reference: runge_kutta.rs:184-239,
integrator.rs:277-330)."""

import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry.base import Solver
from gr_raytracer_tpu.geometry.euclidean import EuclideanSpace
from gr_raytracer_tpu.geometry.schwarzschild import Schwarzschild
from gr_raytracer_tpu.rendering import integrator as integ
from gr_raytracer_tpu.rendering import rkf45


class _ConstantAccel(Solver):
    """d²y/dt² = 2 with y(0) = 1, y'(0) = 2 — closed form
    y = t² + 2t + 1 (runge_kutta.rs:190-212)."""

    @property
    def chart(self):
        return charts.CARTESIAN

    def rhs(self, y):
        out = jnp.zeros_like(y)
        out = out.at[..., 0].set(y[..., 1])
        out = out.at[..., 1].set(2.0)
        return out


def test_rkf45_matches_closed_form():
    solver = _ConstantAccel()
    y = jnp.array([[1.0, 2.0]])
    t = jnp.zeros((1,))
    h = jnp.full((1,), 1e-7)
    for _ in range(200):
        y_new, err = rkf45.rkf45_step(solver.rhs, y, h)
        accept, h_acc, h_rej = rkf45.controller(h, err, jnp.asarray(1e-10))
        t = jnp.where(accept, t + h, t)
        y = jnp.where(accept[:, None], y_new, y)
        h = jnp.where(accept, h_acc, h_rej)
        if float(t[0]) > 25.0:
            break
    tt = float(t[0])
    np.testing.assert_allclose(float(y[0, 0]), tt * tt + 2 * tt + 1, atol=1e-5)
    np.testing.assert_allclose(float(y[0, 1]), 2 * tt + 2, atol=1e-5)


def _simple_cfg(**kw):
    defaults = dict(
        max_radius=jnp.asarray(100.0),
        step_size=jnp.asarray(0.01),
        epsilon=jnp.asarray(1e-8),
        max_steps=2000,
        max_events=4,
    )
    defaults.update(kw)
    return integ.IntegrationConfig(**defaults)


def test_straight_ray_reaches_celestial_sphere():
    geometry = EuclideanSpace()
    x0 = jnp.array([[0.0, 10.0, 0.0, 0.0]])
    p0 = jnp.array([[-1.0, 1.0, 0.0, 0.0]])  # outward
    solver = geometry.make_solver(x0, p0)
    y0 = solver.initial_state(x0, p0)
    res = integ.integrate_rays(
        geometry, solver, _simple_cfg(), y0, integ.no_objects_segment_fn(1), 1
    )
    assert int(res.stop_code[0]) == integ.CELESTIAL
    assert float(res.y[0, 1]) > 100.0


def test_schwarzschild_radial_ray_hits_horizon():
    geometry = Schwarzschild(radius=jnp.asarray(1.0), horizon_epsilon=jnp.asarray(1e-4))
    x0 = jnp.array([[0.0, 10.0, jnp.pi / 2, 0.0]])
    # Ingoing null ray: a v_t² = v_r²/a -> v_r = -a v_t, past-directed v_t < 0
    a = 1.0 - 1.0 / 10.0
    p0 = jnp.array([[-1.0 / a, -1.0, 0.0, 0.0]])
    solver = geometry.make_solver(x0, p0)
    y0 = solver.initial_state(x0, p0)
    res = integ.integrate_rays(
        geometry, solver, _simple_cfg(max_steps=20000), y0, integ.no_objects_segment_fn(1), 1
    )
    assert int(res.stop_code[0]) == integ.HORIZON
    assert float(res.y[0, 1]) <= 1.0 + 1e-3


def test_stop_priority_celestial_over_nan_momentum():
    """A ray that escaped past max_radius with diverging momentum is Escaped,
    not NaN (integrator.rs:277-303)."""
    geometry = EuclideanSpace()
    # Start just inside max_radius moving out fast; inject inf momentum via a
    # custom solver that blows up the momentum after the position escapes.
    class _Blowup(Solver):
        @property
        def chart(self):
            return charts.CARTESIAN

        def rhs(self, y):
            # Position advances at a fixed rate (decoupled from momentum so
            # the position stays finite); the momentum diverges once the ray
            # is past max_radius — mimicking a far-out coordinate singularity.
            dx = jnp.zeros_like(y[..., :4]).at[..., 1].set(1.0)
            escaped = y[..., 1] > 100.0
            dp = jnp.where(escaped[..., None], jnp.inf, 0.0) * jnp.ones_like(y[..., 4:8])
            return jnp.concatenate([dx, dp], axis=-1)

    solver = _Blowup()
    y0 = jnp.array([[0.0, 99.9999, 0.0, 0.0, -1.0, 1.0, 0.0, 0.0]])
    res = integ.integrate_rays(
        geometry, solver, _simple_cfg(), y0, integ.no_objects_segment_fn(1), 1
    )
    assert int(res.stop_code[0]) == integ.CELESTIAL


def test_invariant_drift_small_schwarzschild():
    """k·k and (E, L_z) drift < 1e-4 along a lensed ray
    (integrator.rs:91-146 debug monitor)."""
    geometry = Schwarzschild(radius=jnp.asarray(1.0), horizon_epsilon=jnp.asarray(1e-4))
    from gr_raytracer_tpu.rendering import camera as cam

    position = jnp.array([0.0, 10.0, jnp.pi / 2, 0.0])
    velocity = geometry.stationary_velocity(position)
    camera = cam.build_camera(geometry, position, velocity, jnp.pi / 4, 9, 9)
    x, p = cam.full_grid_rays(camera)
    solver = geometry.make_solver(x, p)
    y0 = solver.initial_state(x, p)
    cfg = _simple_cfg(
        max_radius=jnp.asarray(1000.0),
        epsilon=jnp.asarray(1e-8),
        max_steps=30000,
        track_invariants=True,
    )
    res = integ.integrate_rays(geometry, solver, cfg, y0, integ.no_objects_segment_fn(1), 1)
    assert float(jnp.max(res.kk_drift)) < 1e-4
    assert float(jnp.max(res.const_drift)) < 1e-4


def test_kerr_bl_pole_ray_classified_not_crashed():
    """A ray aimed at the polar axis in BL coordinates diverges (Θ potential
    ~ 1/sin²θ); it must be *classified* (NaN -> captured-black semantics),
    never poison other lanes (kerr_bl.rs:156-163 / integrator NaN stop)."""
    import jax.numpy as jnp
    import numpy as np

    from gr_raytracer_tpu.geometry.kerr_bl import KerrBL
    from gr_raytracer_tpu.rendering import integrator as integ

    geometry = KerrBL(
        radius=jnp.asarray(1.0), a=jnp.asarray(0.3), horizon_epsilon=jnp.asarray(1e-3)
    )
    # Lane 0: straight up the axis (L_z = 0, heading to theta -> 0).
    # Lane 1: ordinary escaping ray.
    x = jnp.asarray([[0.0, 8.0, jnp.pi / 2, 0.0], [0.0, 8.0, jnp.pi / 2, 0.0]])
    p_polar = jnp.asarray([1.2, 0.0, -0.15, 0.0])   # toward the pole
    p_out = jnp.asarray([1.0, 1.0, 0.0, 0.01])
    p = jnp.stack([p_polar, p_out])
    solver = geometry.make_solver(x, p)
    y0 = solver.initial_state(x, p)
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(50.0),
        step_size=jnp.asarray(0.01),
        epsilon=jnp.asarray(1e-7),
        max_steps=20000,
    )
    res = integ.integrate_rays(
        geometry, solver, cfg, y0, integ.no_objects_segment_fn(1), 1
    )
    stops = np.asarray(res.stop_code)
    # The ordinary lane escapes cleanly regardless of its neighbor.
    assert stops[1] == integ.CELESTIAL
    # The polar lane terminates with a *classification*, not a hang/poison.
    assert stops[0] in (integ.NAN, integ.CELESTIAL, integ.BUDGET, integ.STEP_FAILED)
    assert bool(np.isfinite(np.asarray(res.y)[1]).all())


def _cli_default_cfg():
    """The CLI's default IntegrationConfiguration (cli/cli.rs:10-20)."""
    return integ.IntegrationConfig(
        max_radius=jnp.asarray(15000.0),
        step_size=jnp.asarray(0.01),
        epsilon=jnp.asarray(1e-5),
        max_steps=20000,
        max_events=4,
    )


def test_celestial_sphere_reachable_with_cli_default_budget():
    """Regression (schwarzschild.rs:875-899): an outward radial background ray
    must reach max_radius=15000 within the default 20000-step budget instead
    of exhausting it (H_MAX alone would need 15000 steps)."""
    radius = 2.0
    geometry = Schwarzschild(radius=jnp.asarray(radius), horizon_epsilon=jnp.asarray(1e-5))
    r0 = 18.0
    a = 1.0 - radius / r0
    x0 = jnp.array([[0.0, r0, jnp.pi / 2, 0.0]])
    # Outward radial null photon: p_t = 1, p_r = a (from -a p_t^2 + p_r^2/a = 0).
    p0 = jnp.array([[1.0, a, 0.0, 0.0]])
    solver = geometry.make_solver(x0, p0)
    y0 = solver.initial_state(x0, p0)
    res = integ.integrate_rays(
        geometry, solver, _cli_default_cfg(), y0, integ.no_objects_segment_fn(1), 1
    )
    assert int(res.stop_code[0]) == integ.CELESTIAL


def test_celestial_sphere_reachable_for_grazing_ray_with_cli_default_budget():
    """Worst realistic budget case (schwarzschild.rs:901-939): a ray at
    1.001x the critical impact parameter swings past the photon sphere and
    must still reach the celestial sphere within the default budget."""
    radius = 2.0
    geometry = Schwarzschild(radius=jnp.asarray(radius), horizon_epsilon=jnp.asarray(1e-5))
    r0 = 18.0
    a0 = 1.0 - radius / r0
    r_ph = 1.5 * radius
    a_crit = 1.0 - radius / r_ph
    b = (r_ph / np.sqrt(a_crit)) * 1.001
    e = 1.0
    l = b * e
    p_t = e / a0
    p_r = -np.sqrt(max(e * e - a0 * l * l / (r0 * r0), 0.0))  # ingoing initially
    x0 = jnp.array([[0.0, r0, jnp.pi / 2, 0.0]])
    p0 = jnp.array([[p_t, p_r, 0.0, l / (r0 * r0)]])
    solver = geometry.make_solver(x0, p0)
    y0 = solver.initial_state(x0, p0)
    res = integ.integrate_rays(
        geometry, solver, _cli_default_cfg(), y0, integ.no_objects_segment_fn(1), 1
    )
    assert int(res.stop_code[0]) == integ.CELESTIAL
