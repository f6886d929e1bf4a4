"""utils/invariants.py (the numpy-f64 mirrors used for on-chip drift
extraction) must agree with the jax implementations they mirror to f64
round-off — any divergence silently corrupts the committed accuracy study
(docs/fastpath_accuracy.json)."""

import jax
import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry import kerr_bl as kblmod
from gr_raytracer_tpu.geometry.kerr_bl import KerrBL
from gr_raytracer_tpu.ops import geodesic_pallas as gp
from gr_raytracer_tpu.utils import invariants as inv

R_S, A = 1.0, 0.45


def _states(n=64, seed=0):
    rng = np.random.default_rng(seed)
    y = np.zeros((n, 8))
    y[:, 0] = rng.uniform(-5, 5, n)
    y[:, 1] = rng.uniform(1.5, 20, n)
    y[:, 2] = rng.uniform(-10, 10, n)
    y[:, 3] = rng.uniform(-4, 4, n)
    y[:, 4] = -rng.uniform(0.5, 2.0, n)
    y[:, 5:8] = rng.standard_normal((n, 3)) * 0.7
    return y


def test_ks_hamiltonian_and_momentum_match_jax():
    y = _states()
    h_np = inv.ks_hamiltonian(R_S, A, y)
    h_jx = 2.0 * np.asarray(
        gp._hamiltonian(R_S, A, jnp.asarray(y[:, 1:4].T), jnp.asarray(y[:, 4:8].T))
    )
    np.testing.assert_allclose(h_np, h_jx, rtol=1e-12, atol=1e-12)
    p_np = inv.ks_momentum_contra(R_S, A, y)
    p_jx = np.asarray(gp._momentum_contra(R_S, A, jnp.asarray(y.T))).T
    np.testing.assert_allclose(p_np, p_jx, rtol=1e-12, atol=1e-12)


def test_bl_conversion_chain_matches_jax():
    y = _states(seed=1)
    x_np = inv.cartesian_to_bl(A, y[:, :4])
    x_jx = np.asarray(jax.vmap(lambda p: charts.cartesian_to_bl(A, p))(jnp.asarray(y[:, :4])))
    np.testing.assert_allclose(x_np, x_jx, rtol=1e-12, atol=1e-12)

    jac_np = inv.jacobian_bl_to_cartesian(R_S, A, x_np[:, 1], x_np[:, 2], x_np[:, 3])
    jac_jx = np.asarray(
        jax.vmap(lambda xb: charts.jacobian_bl_to_cartesian(R_S, A, xb[1], xb[2], xb[3]))(
            jnp.asarray(x_np)
        )
    )
    np.testing.assert_allclose(jac_np, jac_jx, rtol=1e-12, atol=1e-12)

    g_np = inv.metric_bl(R_S, A, x_np[:, 1], x_np[:, 2])
    g_jx = np.asarray(kblmod.metric_bl(R_S, A, jnp.asarray(x_np[:, 1]), jnp.asarray(x_np[:, 2])))
    np.testing.assert_allclose(g_np, g_jx, rtol=1e-12, atol=1e-12)


def test_conserved_and_potentials_match_jax():
    y = _states(seed=2)
    x_bl = inv.cartesian_to_bl(A, y[:, :4])
    p_contra = inv.ks_momentum_contra(R_S, A, y)
    jac = inv.jacobian_bl_to_cartesian(R_S, A, x_bl[:, 1], x_bl[:, 2], x_bl[:, 3])
    p_bl = np.linalg.solve(jac, p_contra[..., None])[..., 0]

    e_np, lz_np, q_np = inv.conserved_from_bl(R_S, A, x_bl, p_bl)
    kbl = KerrBL(radius=jnp.asarray(R_S), a=jnp.asarray(A), horizon_epsilon=jnp.asarray(1e-3))
    e_jx, lz_jx, q_jx = (
        np.asarray(v)
        for v in jax.vmap(lambda xb, pb: kbl.conserved_from_bl(xb, pb))(
            jnp.asarray(x_bl), jnp.asarray(p_bl)
        )
    )
    np.testing.assert_allclose(e_np, e_jx, rtol=1e-12)
    np.testing.assert_allclose(lz_np, lz_jx, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(q_np, q_jx, rtol=1e-11, atol=1e-11)

    r = np.asarray(x_bl[:, 1])
    th = np.asarray(x_bl[:, 2])
    np.testing.assert_allclose(
        inv.potential_r(r, R_S, A, e_np, lz_np, q_np),
        np.asarray(kblmod.potential_r(jnp.asarray(r), R_S, A, jnp.asarray(e_np), jnp.asarray(lz_np), jnp.asarray(q_np))),
        rtol=1e-12, atol=1e-10,
    )
    np.testing.assert_allclose(
        inv.potential_theta(th, A, e_np, lz_np, q_np),
        np.asarray(kblmod.potential_theta(jnp.asarray(th), A, jnp.asarray(e_np), jnp.asarray(lz_np), jnp.asarray(q_np))),
        rtol=1e-12, atol=1e-10,
    )


def test_ks_lz_is_killing_momentum():
    """L_z from the Cartesian Killing form equals p_φ from the BL chain."""
    y = _states(seed=3)
    lz_cart = inv.ks_lz(y)
    x_bl = inv.cartesian_to_bl(A, y[:, :4])
    p_contra = inv.ks_momentum_contra(R_S, A, y)
    jac = inv.jacobian_bl_to_cartesian(R_S, A, x_bl[:, 1], x_bl[:, 2], x_bl[:, 3])
    p_bl = np.linalg.solve(jac, p_contra[..., None])[..., 0]
    _, lz_bl, _ = inv.conserved_from_bl(R_S, A, x_bl, p_bl)
    np.testing.assert_allclose(lz_cart, lz_bl, rtol=1e-9, atol=1e-9)


def test_carter_conserved_on_integrated_ks_trajectory():
    """End-to-end: Q extracted by the numpy chain is conserved along an
    f64 KS geodesic (same setup as test_physics's Killing-tensor oracle)."""
    from gr_raytracer_tpu.geometry.kerr import Kerr
    from gr_raytracer_tpu.rendering import integrator as integ

    kerr = Kerr(radius=jnp.asarray(R_S), a=jnp.asarray(A), horizon_epsilon=jnp.asarray(1e-3))
    x0 = jnp.asarray([[0.0, -12.0, 1.5, 2.0]])
    sp = jnp.asarray([0.5, 0.2, 0.9])
    g = kerr.metric(x0[0])
    spat = jnp.concatenate([jnp.zeros(1), sp])
    a_t = g[0, 0]
    b_t = 2.0 * (g[0, 1:] @ sp)
    c_t = spat[1:] @ g[1:, 1:] @ sp
    pt = (-b_t - jnp.sqrt(b_t * b_t - 4 * a_t * c_t)) / (2 * a_t)
    p0 = jnp.concatenate([pt[None], sp])[None, :]
    solver = kerr.make_solver(x0, p0)
    y0 = solver.initial_state(x0, p0)
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(40.0), step_size=jnp.asarray(0.02),
        epsilon=jnp.asarray(1e-10), max_steps=2000,
    )
    ys, _, valid, _ = integ.integrate_trajectory(kerr, solver, cfg, y0, 2000)
    rows = np.asarray(ys)[np.asarray(valid)[:, 0], 0]
    q = inv.ks_carter(R_S, A, rows[:: max(len(rows) // 20, 1)])
    assert q[0] > 0.1
    np.testing.assert_allclose(q, q[0], rtol=1e-6)
