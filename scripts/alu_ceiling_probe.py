"""Pure-ALU march ceiling: what steps/s can the KS RK4 step expression reach
with NO events, stops, or masked-lane waste? (r2 verdict item 2a: tie the
production kernel's measured rate to a hardware ceiling.)

Variants, all marching a synthetic full-occupancy state block:

  A  4x _rhs + 2x _ks_scalars (the pre-r3 kernel computed the radius twice
     per step — once for h, once for the stop check)
  B  4x _rhs + 1x lean radius (carry r between iterations)
  C  4x _rhs_opt + 1x lean radius — rsqrt forms + fused reciprocal
     (transcendental count per RHS: 2 sqrt + 4 div -> 2 rsqrt + 1 div)
  D  C + the full stop-determination logic + isfinite checks + event-free
     while_loop (approximates the production kernel on a block whose lanes
     never stop)

NOTE: the r3 session moved variants B/C INTO the production kernel
(geodesic_pallas._rhs now carries the rsqrt/fused-reciprocal forms and the
march carries r between iterations), so gp._rhs == _rhs_opt; variant A's
baseline arithmetic survives only as the measured history below. Measured
(TPU v5e, 2026-08-19, n=131072, steps=2000, M lane-steps/s):
    A: 1331/1440/1623 @ tile 1024/2048/4096
    B: 1340/1561/1594    C: 1444/1595/1666    D: 1176/1483/1570

Usage: python scripts/alu_ceiling_probe.py [--steps N] [--tiles 1024,2048,4096]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gr_raytracer_tpu.ops import geodesic_pallas as gp

RADIUS, A, H0, R_REF, H_MIN_FRAC, HORIZON_EPS = 1.0, 0.499, 1.0, 10.0, 0.01, 1e-4
MAX_RADIUS = 40.0
SUB = 8


def _ks_radius(radius, a, x, y, z):
    """Kerr-Schild r only (the h rule and stop check need nothing else)."""
    rho_sq = x * x + y * y + z * z
    d = rho_sq - a * a
    s = jnp.sqrt(d * d + 4.0 * a * a * z * z)
    return jnp.sqrt(0.5 * (d + s))


def _rhs_opt(radius, a, y):
    """_rhs with rsqrt forms and a fused reciprocal: 2 rsqrt + 1 div per
    eval instead of 2 sqrt + 4 div. Same math (see test in test_pallas)."""
    x, yy, z = y[1], y[2], y[3]
    p = y[4:8]
    a2 = a * a
    rho_sq = x * x + yy * yy + z * z
    d = rho_sq - a2
    dd4 = d * d + 4.0 * a2 * z * z
    inv_s = jax.lax.rsqrt(dd4)
    s = dd4 * inv_s
    r_sq = 0.5 * (d + s)
    inv_r = jax.lax.rsqrt(r_sq)
    r = r_sq * inv_r
    D = r_sq * r_sq + a2 * z * z
    denom = r_sq + a2
    inv_Dd = 1.0 / (D * denom)
    inv_D = inv_Dd * denom
    inv_denom = inv_Dd * D
    f = radius * r * r_sq * inv_D
    kx = (r * x + a * yy) * inv_denom
    ky = (r * yy - a * x) * inv_denom
    kz = z * inv_r

    k_dot_p = -p[0] + kx * p[1] + ky * p[2] + kz * p[3]
    xdot_t = -p[0] + f * k_dot_p
    xdot_x = p[1] - f * kx * k_dot_p
    xdot_y = p[2] - f * ky * k_dot_p
    xdot_z = p[3] - f * kz * k_dot_p

    common = 1.0 + d * inv_s
    dr2_x = x * common
    dr2_y = yy * common
    dr2_z = z * common + 2.0 * a2 * z * inv_s
    half_inv_r = 0.5 * inv_r
    dr_x = dr2_x * half_inv_r
    dr_y = dr2_y * half_inv_r
    dr_z = dr2_z * half_inv_r

    cf = radius * r_sq * inv_D * inv_D
    t1 = 3.0 * a2 * z * z - r_sq * r_sq
    df_x = cf * t1 * dr_x
    df_y = cf * t1 * dr_y
    df_z = cf * (t1 * dr_z - 2.0 * a2 * z * r)

    dkx_x = (dr_x * x + r - kx * dr2_x) * inv_denom
    dkx_y = (dr_y * x + a - kx * dr2_y) * inv_denom
    dkx_z = (dr_z * x - kx * dr2_z) * inv_denom
    dky_x = (dr_x * yy - a - ky * dr2_x) * inv_denom
    dky_y = (dr_y * yy + r - ky * dr2_y) * inv_denom
    dky_z = (dr_z * yy - ky * dr2_z) * inv_denom
    zir2 = z * inv_r * inv_r
    dkz_x = -zir2 * dr_x
    dkz_y = -zir2 * dr_y
    dkz_z = inv_r - zir2 * dr_z

    dkp_x = p[1] * dkx_x + p[2] * dky_x + p[3] * dkz_x
    dkp_y = p[1] * dkx_y + p[2] * dky_y + p[3] * dkz_y
    dkp_z = p[1] * dkx_z + p[2] * dky_z + p[3] * dkz_z

    kp2 = k_dot_p * k_dot_p
    fkp = f * k_dot_p
    pdot_x = 0.5 * df_x * kp2 + fkp * dkp_x
    pdot_y = 0.5 * df_y * kp2 + fkp * dkp_y
    pdot_z = 0.5 * df_z * kp2 + fkp * dkp_z

    return jnp.stack(
        [xdot_t, xdot_x, xdot_y, xdot_z, jnp.zeros_like(xdot_t), pdot_x, pdot_y, pdot_z],
        axis=0,
    )


def _kernel(y_ref, out_ref, *, steps, variant):
    y0 = y_ref[:, :, :]
    radius, a = RADIUS, A
    m = 0.5 * radius
    r_plus = m + np.sqrt(max(m * m - A * A, 0.0))
    inv_rref = 1.0 / R_REF

    rhs = _rhs_opt if variant in ("C", "D") else gp._rhs

    def rk4(y, h):
        k1 = rhs(radius, a, y)
        k2 = rhs(radius, a, y + 0.5 * h * k1)
        k3 = rhs(radius, a, y + 0.5 * h * k2)
        k4 = rhs(radius, a, y + h * k3)
        return y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)

    if variant == "A":
        def body(i, y):
            _, _, _, _, r = gp._ks_scalars(radius, a, y[1], y[2], y[3])
            h = H0 * jnp.clip((r - r_plus) * inv_rref, H_MIN_FRAC, 1.0)
            y_new = rk4(y, h)
            _, _, _, _, _r_new = gp._ks_scalars(radius, a, y_new[1], y_new[2], y_new[3])
            # keep the stop-check radius live
            return y_new + 0.0 * _r_new[None]

        y = jax.lax.fori_loop(0, steps, body, y0)
    elif variant in ("B", "C"):
        def body(i, c):
            y, r = c
            h = H0 * jnp.clip((r - r_plus) * inv_rref, H_MIN_FRAC, 1.0)
            y_new = rk4(y, h)
            r_new = _ks_radius(radius, a, y_new[1], y_new[2], y_new[3])
            return y_new, r_new

        r0 = _ks_radius(radius, a, y0[1], y0[2], y0[3])
        y, _ = jax.lax.fori_loop(0, steps, body, (y0, r0))
    else:  # D: full stop logic, lanes never stop
        tile = y0.shape[1:]

        def cond(c):
            _, _, stop, it = c
            return jnp.logical_and(jnp.any(stop == 0), it < steps)

        def body(c):
            y, r, stop, it = c
            active = stop == 0
            h = H0 * jnp.clip((r - r_plus) * inv_rref, H_MIN_FRAC, 1.0)
            y_new = rk4(y, h)
            y_new = jnp.where(active[None], y_new, y)
            pos_finite = (
                jnp.isfinite(y_new[0]) & jnp.isfinite(y_new[1])
                & jnp.isfinite(y_new[2]) & jnp.isfinite(y_new[3])
            )
            mom_finite = (
                jnp.isfinite(y_new[4]) & jnp.isfinite(y_new[5])
                & jnp.isfinite(y_new[6]) & jnp.isfinite(y_new[7])
            )
            r_new = _ks_radius(radius, a, y_new[1], y_new[2], y_new[3])
            horizon = r_new <= r_plus + HORIZON_EPS
            rho_sq = y_new[1] ** 2 + y_new[2] ** 2 + y_new[3] ** 2
            escaped = rho_sq > MAX_RADIUS * MAX_RADIUS
            code = jnp.zeros(tile, jnp.int32)
            code = jnp.where(~mom_finite, 5, code)
            code = jnp.where(escaped, 2, code)
            code = jnp.where(horizon, 1, code)
            code = jnp.where(~pos_finite, 5, code)
            stop_new = jnp.where(active, code, stop)
            r_new = jnp.where(active, r_new, r)
            return y_new, r_new, stop_new, it + 1

        r0 = _ks_radius(radius, a, y0[1], y0[2], y0[3])
        stop0 = jnp.zeros(tile, jnp.int32)
        y, _, _, _ = jax.lax.while_loop(cond, body, (y0, r0, stop0, jnp.zeros((), jnp.int32)))

    out_ref[:, :, :] = y


def synthetic_state(n):
    """Near-circular photon-ish lanes at r~10 (stable for thousands of small
    steps; actual values only need to stay finite for a timing probe)."""
    rng = np.random.default_rng(0)
    x = 10.0 + 0.1 * rng.standard_normal(n)
    yv = 0.1 * rng.standard_normal(n)
    z = 0.1 * rng.standard_normal(n)
    y0 = np.zeros((8, n), np.float32)
    y0[1], y0[2], y0[3] = x, yv, z
    y0[4] = -1.0  # p_t
    y0[6] = 0.27  # tangential p_y ~ circular-ish
    y0[5] = 0.02 * rng.standard_normal(n)
    return y0


def run(variant, tile, n, steps, repeats=3):
    lane = tile // SUB
    grid = (n // tile,)
    spec = pl.BlockSpec((8, SUB, lane), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    y = jnp.asarray(synthetic_state(n)).reshape(8, n // lane, lane)
    fn = jax.jit(
        lambda a: pl.pallas_call(
            functools.partial(_kernel, steps=steps, variant=variant),
            grid=grid,
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((8, n // lane, lane), jnp.float32),
        )(a)
    )
    t0 = time.perf_counter()
    jax.device_get(fn(y))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(fn(y))
        best = min(best, time.perf_counter() - t0)
    rate = n * steps / best
    print(
        f"variant={variant} tile={tile:5d} compile={compile_s:6.1f}s "
        f"march={best*1e3:8.2f} ms  {rate/1e6:9.1f} M lane-steps/s",
        flush=True,
    )
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--tiles", default="1024,2048,4096")
    ap.add_argument("--variants", default="A,B,C,D")
    args = ap.parse_args()
    print(f"backend={jax.default_backend()} n={args.n} steps={args.steps}")
    rates = {}
    for v in args.variants.split(","):
        for tile in (int(t) for t in args.tiles.split(",")):
            rates[(v, tile)] = run(v, tile, args.n, args.steps)
    if ("A", 1024) in rates and ("C", 1024) in rates:
        print(f"C/A at 1024: {rates[('C',1024)] / rates[('A',1024)]:.2f}x")


if __name__ == "__main__":
    main()
