"""Pallas TPU kernel: fixed-step RK4 Kerr-Schild geodesic march.

The speed-of-light path for the headline Kerr benchmark (SURVEY.md stage 12).
Where the lax.while_loop RKF45 integrator re-reads its whole carry
(state + event buffer, ~100 B/ray) from HBM every iteration, this kernel
keeps each ray block resident in VMEM for the entire march: HBM traffic is
one load of y0 and one store of the results per ray, regardless of step
count.

Layout: SoA, state (8, N//128, 128) blocked as (8, 8, 128) — every state
component occupies a FULL (8, 128) f32 VPU tile (sublanes × lanes), so each
elementwise op in the march saturates the unit. A rank-1 (T,) row layout
measures 1.64× slower on an identical ALU march (scripts/layout_probe.py):
Mosaic lays lane vectors across lane tiles only, idling 7/8 sublanes.
Each 1024-ray block stays VMEM-resident for the whole march; each program marches
its block with an in-kernel lax.while_loop that exits as soon as every lane
in the block has stopped — blocks of early-terminating rays (horizon
plunges, quick escapes) finish early instead of padding to the global
worst case (the compaction SURVEY.md §5 asks for, expressed as blocking).

Step size: adaptive-lite h = h0 · clip(r/r_ref, h_min_frac, 1) — small near
the hole where curvature is strong, capped far away (the reference's H_MAX
rationale, runge_kutta.rs:61-76). RK4 instead of embedded RKF45: no
accept/reject divergence between lanes, 4 RHS evals per step.

Events: equatorial thin-disc crossings (z sign change within radial bounds)
are recorded into a K-slot per-lane buffer with the same 12-wide payload as
the lax path (point3 | p_contra4 | uv2 | seg_dir3), so the deferred shading
and fold are shared verbatim.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gr_raytracer_tpu.rendering import integrator as integ

LANE_TILE = int(__import__("os").environ.get("GR_LANE_TILE", "1024"))  # rays per block
# GR_EVENT_GATE=0 disables the lax.cond gate around event stores (stores run
# unconditionally every step, the pre-gating behavior) — trace-time escape
# hatch in case the in-kernel cond hits a Mosaic lowering gap on some
# toolchain; parity is unaffected either way (the gate is semantics-exact).
EVENT_GATE = __import__("os").environ.get("GR_EVENT_GATE", "1") != "0"
SUB = 8  # f32/i32 sublane tile — every per-ray variable is a (SUB, LANE) tile
LANE = LANE_TILE // SUB
assert LANE_TILE % (SUB * 128) == 0, "block must be a multiple of the 8x128 VPU tile"
MAX_EVENTS = 8  # matches the lax path's IntegrationConfig.max_events default
EVENT_WIDTH = 12


def _eta():
    return (-1.0, 1.0, 1.0, 1.0)


def _atan(x):
    """arctan from primitives (neither atan nor atan2 lowers on Pallas TPU).

    Range-reduce: |x| > 1 via atan(x) = π/2 − atan(1/x), then two half-angle
    reductions z ← z/(1+√(1+z²)) bring the argument under 0.199 where a
    degree-11 odd Taylor term is exact to ~6e-11 — far beyond f32 needs.

    The reciprocal guard floors at 1.0, not a tiny eps: the branch is only
    SELECTED when ax > 1 (where max(ax, 1) = ax — primal identical), and a
    tiny floor makes the untaken branch's VJP square a ~1e30 intermediate —
    inf in f32, whose 0·inf = NaN poisons reverse mode through the where
    (the adjoint kernel differentiates through this, geodesic_adjoint.py)."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1.0), ax)
    z = z / (1.0 + jnp.sqrt(1.0 + z * z))
    z = z / (1.0 + jnp.sqrt(1.0 + z * z))
    z2 = z * z
    p = z * (
        1.0
        + z2
        * (-1.0 / 3.0 + z2 * (0.2 + z2 * (-1.0 / 7.0 + z2 * (1.0 / 9.0 - z2 / 11.0))))
    )
    r = 4.0 * p
    half_pi = jnp.asarray(jnp.pi / 2, x.dtype)
    r = jnp.where(inv, half_pi - r, r)
    return jnp.where(x < 0.0, -r, r)


def _atan2(y, x):
    """atan2 built from _atan. x == 0, y != 0 rides on atan(±inf) = ±π/2;
    the x < 0 half-plane is shifted by ±π with the y >= 0 tie going to +π
    (libm). The origin (0, 0) returns 0 like libm — without the guard
    0/0 = NaN would poison the UV payload of an event exactly on the axis
    (reachable via a volumetric cap crossing at x = y = 0)."""
    safe_x = jnp.where((x == 0.0) & (y == 0.0), 1.0, x)
    r = _atan(y / safe_x)
    pi = jnp.asarray(jnp.pi, y.dtype)
    shift = jnp.where(y >= 0.0, pi, -pi)
    return jnp.where(x < 0.0, r + shift, r)


def _ks_radius(a, x, y, z):
    """Kerr-Schild r alone (the step rule and the horizon test need nothing
    else; the march carries it between iterations so the radius is computed
    ONCE per step instead of twice)."""
    rho_sq = x * x + y * y + z * z
    d = rho_sq - a * a
    s = jnp.sqrt(d * d + 4.0 * a * a * z * z)
    return jnp.sqrt(0.5 * (d + s))


def _ks_scalars(radius, a, x, y, z):
    """f and k (covariant) for Kerr-Schild, componentwise over [T] lanes."""
    rho_sq = x * x + y * y + z * z
    d = rho_sq - a * a
    r_sq = 0.5 * (d + jnp.sqrt(d * d + 4.0 * a * a * z * z))
    r = jnp.sqrt(r_sq)
    f = (r * r_sq * radius) / (r_sq * r_sq + a * a * z * z)
    denom = r_sq + a * a
    kx = (r * x + a * y) / denom
    ky = (r * y - a * x) / denom
    kz = z / jnp.maximum(r, 1e-30)
    return f, kx, ky, kz, r


def _hamiltonian(radius, a, pos, p):
    """H = ½ g^{μν} p_μ p_ν with g^inv = η^inv − f k♯ k♯.
    pos: [3, T] spatial; p: [4, T] covariant."""
    f, kx, ky, kz, _ = _ks_scalars(radius, a, pos[0], pos[1], pos[2])
    # k♯ = (−k_t, k_x, k_y, k_z) for this η.
    k_dot_p = -p[0] + kx * p[1] + ky * p[2] + kz * p[3]
    eta_pp = -p[0] * p[0] + p[1] * p[1] + p[2] * p[2] + p[3] * p[3]
    return 0.5 * (eta_pp - f * k_dot_p * k_dot_p)


def _rhs_autodiff(radius, a, y):
    """dy/dλ via jax.grad of the Hamiltonian — the specification the analytic
    _rhs below is tested against (test_pallas.py); not used in the kernel."""
    pos = y[1:4]
    p = y[4:8]
    f, kx, ky, kz, _ = _ks_scalars(radius, a, pos[0], pos[1], pos[2])
    k_dot_p = -p[0] + kx * p[1] + ky * p[2] + kz * p[3]
    # xdot^μ = g^{μν} p_ν = η^{μν} p_ν − f k♯^μ (k♯·p)
    xdot_t = -p[0] + f * k_dot_p  # η^{tt} p_t − f(−k_t)(k·p), k_t = 1
    xdot_x = p[1] - f * kx * k_dot_p
    xdot_y = p[2] - f * ky * k_dot_p
    xdot_z = p[3] - f * kz * k_dot_p

    def total_h(spatial):
        return jnp.sum(_hamiltonian(radius, a, spatial, p))

    dH = jax.grad(total_h)(pos)  # [3, T]
    return jnp.concatenate(
        [
            xdot_t[None],
            xdot_x[None],
            xdot_y[None],
            xdot_z[None],
            jnp.zeros_like(xdot_t)[None],  # p_t conserved (stationary metric)
            -dH,
        ],
        axis=0,
    )


def _rhs(radius, a, y):
    """dy/dλ for y = [x4 | p_cov4] as [8, T], with a hand-derived ∂H/∂x.

    Same math as _rhs_autodiff (ṗ_μ = −½ ∂_μ g^{αβ} p_α p_β, kerr.rs:162-186
    — where the reference uses finite differences), but the Kerr-Schild
    derivative chain written out: 137 flops/eval vs 251 through jax.grad
    (XLA cost analysis) — a 25% cut of the whole RK4 step, the kernel's
    dominant cost. Agreement with _rhs_autodiff: ≤7e-13 relative in f64.

    Transcendental budget (the VPU's multi-pass ops): rsqrt forms give s and
    1/s (and r and 1/r) from ONE rsqrt + a multiply, and the two remaining
    reciprocals share one divide via 1/(D·denom) — 2 rsqrt + 1 div per eval
    instead of the naive 2 sqrt + 4 div (measured on the pure-ALU march
    probe, scripts/alu_ceiling_probe.py)."""
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

    # ∂r²/∂xi = xi(1 + d/s) + 2a²z δiz/s ;  ∂r = ∂r²/(2r)
    common = 1.0 + d * inv_s
    dr2_x = x * common
    dr2_y = yy * common
    dr2_z = z * common + 2.0 * a2 * z * inv_s
    half_inv_r = 0.5 * inv_r
    dr_x = dr2_x * half_inv_r
    dr_y = dr2_y * half_inv_r
    dr_z = dr2_z * half_inv_r

    # ∂f/∂xi = R r² [(3D − 4r⁴) ∂r_i − 2a²z r δiz] / D²; 3D − 4r⁴ = 3a²z² − r⁴
    cf = radius * r_sq * inv_D * inv_D
    t1 = 3.0 * a2 * z * z - r_sq * r_sq
    df_x = cf * t1 * dr_x
    df_y = cf * t1 * dr_y
    df_z = cf * (t1 * dr_z - 2.0 * a2 * z * r)

    # ∂k/∂xi via the quotient rule on (r·x+a·y)/(r²+a²) etc.
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
    # ṗ_i = −∂H/∂xi = ½ ∂f_i (k·p)² + f (k·p) ∂(k·p)_i
    pdot_x = 0.5 * df_x * kp2 + fkp * dkp_x
    pdot_y = 0.5 * df_y * kp2 + fkp * dkp_y
    pdot_z = 0.5 * df_z * kp2 + fkp * dkp_z

    return jnp.stack(
        [
            xdot_t,
            xdot_x,
            xdot_y,
            xdot_z,
            jnp.zeros_like(xdot_t),  # p_t conserved (stationary metric)
            pdot_x,
            pdot_y,
            pdot_z,
        ],
        axis=0,
    )


def _momentum_contra(radius, a, y):
    """p^μ from the covariant state, [4, T]."""
    pos = y[1:4]
    p = y[4:8]
    f, kx, ky, kz, _ = _ks_scalars(radius, a, pos[0], pos[1], pos[2])
    k_dot_p = -p[0] + kx * p[1] + ky * p[2] + kz * p[3]
    return jnp.stack(
        [
            -p[0] + f * k_dot_p,
            p[1] - f * kx * k_dot_p,
            p[2] - f * ky * k_dot_p,
            p[3] - f * kz * k_dot_p,
        ],
        axis=0,
    )


class DiscSpec(NamedTuple):
    """Static per-disc radial bounds for in-kernel crossing detection."""

    inner: float
    outer: float
    kind: int  # object index in the scene


class SphereSpec(NamedTuple):
    """Static sphere for in-kernel surface-crossing detection."""

    radius: float
    cx: float
    cy: float
    cz: float
    kind: int


class VolSpec(NamedTuple):
    """Static bounding volume of an axis-aligned (z) volumetric disc:
    inner/outer cylinders clipped to ±cap_h caps (volumetric_disc.rs:442-494).
    The kernel records the BOUNDARY-CROSSING event; the raymarch shading runs
    in the driver's compacted split pass exactly as for the lax path."""

    inner: float
    outer: float
    cap_h: float
    kind: int


MIN_INTERSECTION_T = 1e-9  # matches objects/volumetric_disc.py


def _push_event(kind_val, hit, payload, ev_kind, ev_data, ev_count, ev_ovf):
    """Append one event per hitting lane into the K-slot SoA buffers.
    hit/ev_count/ev_ovf: (SUB, LANE) tiles; ev_kind: (MAX_EVENTS, SUB, LANE);
    payload: (EVENT_WIDTH, SUB, LANE); ev_data: (MAX_EVENTS·EVENT_WIDTH, SUB,
    LANE)."""
    tile = hit.shape
    store = hit & (ev_count < MAX_EVENTS)
    slot = jax.lax.broadcasted_iota(jnp.int32, (MAX_EVENTS,) + tile, 0)
    sel = (slot == ev_count[None]) & store[None]
    ev_kind = jnp.where(sel, kind_val, ev_kind)
    comp = jax.lax.broadcasted_iota(jnp.int32, (MAX_EVENTS * EVENT_WIDTH,) + tile, 0)
    sel_data = (comp // EVENT_WIDTH == ev_count[None]) & store[None]
    tiled = jnp.tile(payload, (MAX_EVENTS, 1, 1))
    ev_data = jnp.where(sel_data, tiled, ev_data)
    ev_count = ev_count + store.astype(jnp.int32)
    ev_ovf = ev_ovf | (hit & (~store)).astype(jnp.int32)
    return ev_kind, ev_data, ev_count, ev_ovf


def _store_vol_events(
    vols, active, s3, e3, p_prev, p_new, ev_kind, ev_data, ev_count, ev_ovf
):
    """First bounding-volume boundary crossing of each step segment
    (6 candidate roots: 2 per cylinder + 2 caps; volumetric_disc.rs:348-494,
    mirrored by objects/volumetric_disc.py _candidate_ts for axis = z).
    Root-finding candidates cannot tunnel: any segment that crosses the
    boundary has a root in (MIN_T, 1] regardless of step size."""
    d = e3 - s3
    d_dot = jnp.sum(d * d, axis=0)
    a_cyl = d[0] * d[0] + d[1] * d[1]
    b_half = s3[0] * d[0] + s3[1] * d[1]
    ss_xy = s3[0] * s3[0] + s3[1] * s3[1]
    for vs in vols:
        best_t = jnp.full_like(ss_xy, jnp.inf)
        for radius in (vs.outer, vs.inner):
            c = ss_xy - radius * radius
            disc = b_half * b_half - a_cyl * c
            ok_base = (a_cyl >= 1e-10 * d_dot) & (disc >= 0.0)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            safe_a = jnp.where(a_cyl > 0.0, a_cyl, 1.0)
            for sign in (-1.0, 1.0):
                tt = (-b_half + sign * sq) / safe_a
                z_at = s3[2] + tt * d[2]
                ok = (
                    ok_base
                    & (tt > MIN_INTERSECTION_T)
                    & (tt <= 1.0)
                    & (jnp.abs(z_at) <= vs.cap_h)
                )
                best_t = jnp.where(ok & (tt < best_t), tt, best_t)
        dz_ok = jnp.abs(d[2]) > 1e-10
        safe_dz = jnp.where(dz_ok, d[2], 1.0)
        for zc in (vs.cap_h, -vs.cap_h):
            tt = (zc - s3[2]) / safe_dz
            px_ = s3[0] + tt * d[0]
            py_ = s3[1] + tt * d[1]
            r2 = px_ * px_ + py_ * py_
            ok = (
                dz_ok
                & (tt > MIN_INTERSECTION_T)
                & (tt <= 1.0)
                & (r2 <= vs.outer * vs.outer)
                & (r2 >= vs.inner * vs.inner)
            )
            best_t = jnp.where(ok & (tt < best_t), tt, best_t)

        hit = active & (best_t < jnp.inf)
        t_ev = jnp.where(hit, best_t, 0.0)
        point = s3 + t_ev[None, :] * d
        rr = jnp.sqrt(point[0] * point[0] + point[1] * point[1])
        phi = _atan2(point[1], point[0])
        r_norm = (rr - vs.inner) / (vs.outer - vs.inner)
        u = 0.5 + 0.5 * r_norm * jnp.cos(phi)
        v = 0.5 + 0.5 * r_norm * jnp.sin(phi)
        p_interp = p_prev + t_ev[None, :] * (p_new - p_prev)
        payload = jnp.concatenate([point, p_interp, u[None], v[None], d], axis=0)
        ev_kind, ev_data, ev_count, ev_ovf = _push_event(
            vs.kind, hit, payload, ev_kind, ev_data, ev_count, ev_ovf
        )
    return ev_kind, ev_data, ev_count, ev_ovf


def _store_sphere_events(
    spheres, active, s3, e3, p_prev, p_new, ev_kind, ev_data, ev_count, ev_ovf
):
    """Segment-vs-sphere with the reference's surface-crossing precondition
    (sphere.rs:62-128): endpoint radii straddle the surface; prefer the +
    root; local-frame spherical UV; world-space point.
    s3/e3: [3, SUB, LANE] segment endpoints (spatial Cartesian)."""
    d = e3 - s3
    for sp in spheres:
        # Componentwise with Python-scalar center offsets — Pallas kernels
        # cannot capture array constants.
        s_loc = jnp.stack([s3[0] - sp.cx, s3[1] - sp.cy, s3[2] - sp.cz], axis=0)
        e_loc = jnp.stack([e3[0] - sp.cx, e3[1] - sp.cy, e3[2] - sp.cz], axis=0)
        r2 = sp.radius * sp.radius
        rs = jnp.sum(s_loc * s_loc, axis=0)
        re = jnp.sum(e_loc * e_loc, axis=0)
        crossing = ((rs >= r2) & (re <= r2)) | ((rs <= r2) & (re >= r2))

        a = jnp.sum(d * d, axis=0)
        b = 2.0 * jnp.sum(s_loc * d, axis=0)
        c = rs - r2
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        safe_a = jnp.where(a != 0.0, a, 1.0)
        t1 = (-b + sq) / (2.0 * safe_a)
        t2 = (-b - sq) / (2.0 * safe_a)
        t1_ok = (t1 >= 0.0) & (t1 <= 1.0)
        t2_ok = (t2 >= 0.0) & (t2 <= 1.0)
        t = jnp.where(t1_ok, t1, t2)
        hit = active & crossing & (disc >= 0.0) & (t1_ok | t2_ok) & (a != 0.0)

        local = s_loc + t[None, :] * d
        r_loc = jnp.sqrt(jnp.maximum(jnp.sum(local * local, axis=0), 1e-30))
        cos_th = jnp.clip(local[2] / r_loc, -1.0, 1.0)
        # acos via atan2 (no acos lowering): θ = atan2(√(1−c²), c).
        theta = _atan2(jnp.sqrt(jnp.maximum(1.0 - cos_th * cos_th, 0.0)), cos_th)
        phi = _atan2(local[1], local[0])
        u = 1.0 - (jnp.pi + phi) / (2.0 * jnp.pi)
        v = theta / jnp.pi
        world = jnp.stack(
            [local[0] + sp.cx, local[1] + sp.cy, local[2] + sp.cz], axis=0
        )
        p_interp = p_prev + t[None, :] * (p_new - p_prev)

        payload = jnp.concatenate([world, p_interp, u[None], v[None], d], axis=0)
        ev_kind, ev_data, ev_count, ev_ovf = _push_event(
            sp.kind, hit, payload, ev_kind, ev_data, ev_count, ev_ovf
        )
    return ev_kind, ev_data, ev_count, ev_ovf


def _store_disc_events(
    discs, crossing, px, py, p_interp, seg, ev_kind, ev_data, ev_count, ev_ovf
):
    """Fold equatorial-plane crossings into the per-lane event buffer.
    px/py: crossing point in the equatorial plane (Cartesian); p_interp:
    [4, T] interpolated contravariant momentum; seg: [3, T] segment dir.
    ev_kind [K, SUB, LANE], ev_data [K·12, SUB, LANE], ev_count [SUB, LANE]."""
    rr = jnp.sqrt(px * px + py * py)
    phi = _atan2(py, px)
    for disc in discs:
        hit = crossing & (rr >= disc.inner) & (rr <= disc.outer)
        r_norm = (rr - disc.inner) / (disc.outer - disc.inner)
        u = 0.5 + 0.5 * r_norm * jnp.cos(phi)
        v = 0.5 + 0.5 * r_norm * jnp.sin(phi)
        payload = jnp.concatenate(
            [
                px[None],
                py[None],
                jnp.zeros_like(px)[None],
                p_interp,
                u[None],
                v[None],
                seg,
            ],
            axis=0,
        )  # [12, T]
        ev_kind, ev_data, ev_count, ev_ovf = _push_event(
            disc.kind, hit, payload, ev_kind, ev_data, ev_count, ev_ovf
        )
    return ev_kind, ev_data, ev_count, ev_ovf


# Merged int32 per-lane metadata rows (Mosaic rejects [1, T] vectors mixed
# with [8, T] in a while carry — "invalid relayout"; one tile-aligned
# [META_ROWS, T] i32 array avoids the replication mismatch entirely).
META_STOP = 0
META_STEPS = 1
META_COUNT = 2
META_KIND0 = 3  # rows 3..3+MAX_EVENTS-1
META_OVF = META_KIND0 + MAX_EVENTS  # 1 where an event was DROPPED (buffer full)
META_ROWS = 16  # sublane-tile-aligned (int32 tile is 8 rows)


def _march_kernel(
    y_ref,
    meta_in_ref,  # resume metadata (fresh init rows for a new march)
    ev_in_ref,  # resume event payloads (zeros for a new march)
    param_ref,  # SMEM [8,1]: radius, a, horizon_eps, h0, max_radius, h_min_frac, r_ref, _
    y_out_ref,
    meta_ref,
    ev_data_ref,
    *maybe_ckpt,  # [ckpt_ref (S, 8, SUB, LANE)] when ckpt_every > 0
    attempts: int,
    budget_steps: int,
    discs: tuple,
    spheres: tuple = (),
    vols: tuple = (),
    r_safe: float = 0.0,
    opaque_stop: bool = False,
    finalize: bool = True,
    ckpt_every: int = 0,
    compensated: bool = False,
):
    radius = param_ref[0, 0]
    a = param_ref[1, 0]
    horizon_eps = param_ref[2, 0]
    h0 = param_ref[3, 0]
    max_radius = param_ref[4, 0]
    h_min_frac = param_ref[5, 0]
    r_ref_scale = param_ref[6, 0]

    y0 = y_ref[:, :, :]  # (8, SUB, LANE): each component a native VPU tile
    tile = y0.shape[1:]
    m = 0.5 * radius
    r_plus = m + jnp.sqrt(jnp.maximum(m * m - a * a, 0.0))
    max_radius_sq = max_radius * max_radius

    # Per-lane steps / stop / event buffers RESUME from the inputs: a caller
    # can march `attempts` iterations, checkpoint the output tuple, and feed
    # it straight back in to continue — bit-identical to one uninterrupted
    # march (tests/test_pallas.py::test_kernel_march_resume_*).
    carry0 = (
        y0,
        _ks_radius(a, y0[1], y0[2], y0[3]),
        meta_in_ref[:, :, :],
        ev_in_ref[:, :, :],
        jnp.zeros((), jnp.int32),  # iteration within THIS phase
        jnp.zeros_like(y0),  # Kahan compensation (unused unless compensated)
    )

    def cond(c):
        meta, it = c[2], c[4]
        return jnp.logical_and(
            jnp.any(meta[META_STOP] == integ.RUNNING), it < attempts
        )

    ckpt_ref = maybe_ckpt[0] if maybe_ckpt else None

    def body(c):
        y, r_here, meta, ev_data, it, comp = c
        stop = meta[META_STOP]
        steps = meta[META_STEPS]
        ev_count = meta[META_COUNT]
        ev_kind = meta[META_KIND0 : META_KIND0 + MAX_EVENTS]
        ev_ovf = meta[META_OVF]
        active = stop == integ.RUNNING

        if ckpt_ref is not None:
            # Reverse-sweep checkpoint (ops/geodesic_adjoint.py): the PRE-step
            # state every ckpt_every iterations. Stale rows past a block's
            # last active iteration are never read back (the backward gates
            # each segment on seg·K < max(steps)).
            @pl.when(it % ckpt_every == 0)
            def _():
                ckpt_ref[it // ckpt_every] = y

        # Distance-above-horizon scaling: photon-ring orbits (r ~ r₊) need a
        # much finer step than the r/r_ref rule gives; far-field rays stay at
        # the h0 cap (the H_MAX rationale, runge_kutta.rs:61-76). r_here is
        # carried from the previous iteration's stop check (one radius
        # evaluation per step, not two).
        h = h0 * jnp.clip((r_here - r_plus) / r_ref_scale, h_min_frac, 1.0)

        k1 = _rhs(radius, a, y)
        if r_safe > 0.0:
            # Far-field escape acceleration: beyond r_safe (2× the outermost
            # object extent) an OUTWARD-moving ray can take a step covering
            # half its remaining gap — geometric growth reaches max_radius in
            # O(log) steps instead of max_radius/H_MAX. The half-gap bound
            # means one step can never re-enter the object region (no
            # tunneling, the only reason H_MAX exists — runge_kutta.rs:61-76),
            # and inbound lanes keep the exact H_MAX cadence so photon-ring
            # accuracy is untouched.
            rho = jnp.sqrt(y[1] * y[1] + y[2] * y[2] + y[3] * y[3])
            speed = jnp.sqrt(k1[1] ** 2 + k1[2] ** 2 + k1[3] ** 2)
            outward = (y[1] * k1[1] + y[2] * k1[2] + y[3] * k1[3]) > 0.0
            # rho/8 cap: residual deflection scales as r_s/rho², so keeping
            # the step proportional to the local curvature scale bounds the
            # per-step bending error (asymptotic direction within ~1e-3 of
            # the H_MAX cadence) while preserving geometric growth (~1.125×
            # per step → ~40 steps to max_radius instead of max_radius/H_MAX).
            h_far = (
                jnp.minimum(0.5 * (rho - r_safe), 0.125 * rho)
                / jnp.maximum(speed, 1e-12)
            )
            h = jnp.where(outward & (rho > r_safe), jnp.maximum(h, h_far), h)
        k2 = _rhs(radius, a, y + 0.5 * h * k1)
        k3 = _rhs(radius, a, y + 0.5 * h * k2)
        k4 = _rhs(radius, a, y + h * k3)
        delta = (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        if compensated:
            # Kahan accumulation of y += delta: removes the O(√N·eps·|y|)
            # random-walk summation rounding over deep (1e6-step) marches.
            # The remaining drift is the f32 rounding inside the RHS evals,
            # which no summation scheme can touch. Enabled by the driver for
            # deep budgets (fast_path.DEEP_BUDGET_COMPENSATION).
            adj = delta - comp
            t_sum = y + adj
            comp_new = (t_sum - y) - adj
            y_new = jnp.where(active[None, :], t_sum, y)
            comp = jnp.where(active[None, :], comp_new, comp)
        else:
            y_new = jnp.where(active[None, :], y + delta, y)

        # --- stop determination (priority per integrator.rs:203-268) -----
        pos_finite = (
            jnp.isfinite(y_new[0])
            & jnp.isfinite(y_new[1])
            & jnp.isfinite(y_new[2])
            & jnp.isfinite(y_new[3])
        )
        mom_finite = (
            jnp.isfinite(y_new[4])
            & jnp.isfinite(y_new[5])
            & jnp.isfinite(y_new[6])
            & jnp.isfinite(y_new[7])
        )
        r_new = _ks_radius(a, y_new[1], y_new[2], y_new[3])
        horizon = r_new <= r_plus + horizon_eps
        rho_sq = y_new[1] ** 2 + y_new[2] ** 2 + y_new[3] ** 2
        escaped = rho_sq > max_radius_sq
        steps_new = steps + active.astype(jnp.int32)
        trapped = (steps_new >= budget_steps - 1) & (r_new < 5.0 * radius)
        budget = steps_new >= budget_steps - 1

        code = jnp.full(tile, integ.RUNNING, jnp.int32)
        code = jnp.where(~mom_finite, integ.NAN, code)
        code = jnp.where(escaped, integ.CELESTIAL, code)
        code = jnp.where(trapped, integ.TRAPPED, code)
        code = jnp.where(horizon, integ.HORIZON, code)
        code = jnp.where(~pos_finite, integ.NAN, code)
        code = jnp.where((code == integ.RUNNING) & budget, integ.BUDGET, code)
        stop_new = jnp.where(active, code, stop)

        # --- object crossing events --------------------------------------
        # Cheap candidate tests (a handful of tile ops, strict supersets of
        # each store's hit condition) gate the expensive store path — the
        # contravariant momenta, root finding and the K-slot buffer scatter
        # run only on the rare block-steps where some lane might cross.
        if discs or spheres or vols:
            z_prev, z_new = y[3], y_new[3]
            cand = jnp.zeros_like(active)
            if discs:
                cand = cand | ((z_prev * z_new < 0.0) & active)
            if spheres:
                for sp in spheres:
                    r2 = sp.radius * sp.radius
                    rs = (
                        (y[1] - sp.cx) ** 2 + (y[2] - sp.cy) ** 2 + (y[3] - sp.cz) ** 2
                    )
                    re_ = (
                        (y_new[1] - sp.cx) ** 2
                        + (y_new[2] - sp.cy) ** 2
                        + (y_new[3] - sp.cz) ** 2
                    )
                    cand = cand | (active & ((rs - r2) * (re_ - r2) <= 0.0))
            if vols:
                # z-band overlap + closest-approach of the chord's xy
                # projection to the axis (exact quadratic minimum) vs the
                # outer cylinder: necessary for ANY of the 6 boundary roots.
                dx = y_new[1] - y[1]
                dy = y_new[2] - y[2]
                a_c = dx * dx + dy * dy
                b_h = y[1] * dx + y[2] * dy
                rho0 = y[1] * y[1] + y[2] * y[2]
                t_star = jnp.clip(-b_h / jnp.maximum(a_c, 1e-20), 0.0, 1.0)
                rho_min2 = rho0 + (2.0 * b_h + a_c * t_star) * t_star
                zmin = jnp.minimum(z_prev, z_new)
                zmax = jnp.maximum(z_prev, z_new)
                for vs in vols:
                    cand = cand | (
                        active
                        & (zmin <= vs.cap_h)
                        & (zmax >= -vs.cap_h)
                        & (rho_min2 <= vs.outer * vs.outer)
                    )

            def _do_stores(ev):
                ev_kind, ev_data, ev_count, ev_ovf = ev
                p_prev = _momentum_contra(radius, a, y)
                p_new = _momentum_contra(radius, a, y_new)
                if discs:
                    crossing = (z_prev * z_new < 0.0) & active
                    frac = z_prev / (
                        z_prev - z_new + jnp.where(z_prev == z_new, 1.0, 0.0)
                    )
                    px = y[1] + frac * (y_new[1] - y[1])
                    py = y[2] + frac * (y_new[2] - y[2])
                    p_interp = p_prev + frac[None] * (p_new - p_prev)
                    seg = y_new[1:4] - y[1:4]
                    ev_kind, ev_data, ev_count, ev_ovf = _store_disc_events(
                        discs, crossing, px, py, p_interp, seg,
                        ev_kind, ev_data, ev_count, ev_ovf,
                    )
                if spheres:
                    ev_kind, ev_data, ev_count, ev_ovf = _store_sphere_events(
                        spheres, active, y[1:4], y_new[1:4], p_prev, p_new,
                        ev_kind, ev_data, ev_count, ev_ovf,
                    )
                if vols:
                    # Boundary-crossing events only; never stops the lane
                    # (the volumetric fold has alpha < 1, so opaque_stop is
                    # statically off — fast_path.scene_kernel_spec).
                    ev_kind, ev_data, ev_count, ev_ovf = _store_vol_events(
                        vols, active, y[1:4], y_new[1:4], p_prev, p_new,
                        ev_kind, ev_data, ev_count, ev_ovf,
                    )
                return ev_kind, ev_data, ev_count, ev_ovf

            ev = (ev_kind, ev_data, ev_count, ev_ovf)
            if EVENT_GATE:
                ev = jax.lax.cond(jnp.any(cand), _do_stores, lambda e: e, ev)
            else:
                ev = _do_stores(ev)
            ev_kind, ev_data, ev_count, ev_ovf = ev
        if opaque_stop and (discs or spheres):
            # Every object texture is opaque (alpha 1): the first event zeroes
            # the fold transmittance, so nothing recorded or marched after it
            # can be visible — stop the lane (exact for color and ray class;
            # see integrator.SATURATED).
            stop_new = jnp.where(
                (stop_new == integ.RUNNING) & (ev_count > 0),
                integ.SATURATED,
                stop_new,
            )

        meta_new = jnp.concatenate(
            [
                stop_new[None],
                steps_new[None],
                ev_count[None],
                ev_kind,
                ev_ovf[None],
                meta[META_OVF + 1 :],
            ],
            axis=0,
        )
        # Frozen lanes keep their carried radius consistent with their
        # (unchanged) state.
        r_carry = jnp.where(active, r_new, r_here)
        return (y_new, r_carry, meta_new, ev_data, it + 1, comp)

    y_f, _, meta_f, ev_data_f, _, _ = jax.lax.while_loop(cond, body, carry0)
    if finalize:
        stop_f = jnp.where(
            meta_f[META_STOP] == integ.RUNNING, integ.BUDGET, meta_f[META_STOP]
        )
        meta_f = jnp.concatenate([stop_f[None], meta_f[1:]], axis=0)
    y_out_ref[:, :, :] = y_f
    meta_ref[:, :, :] = meta_f
    ev_data_ref[:, :, :] = ev_data_f


def _init_meta_ev(n, dtype, resume):
    """[META_ROWS, n] metadata + [K·W, n] event payloads: fresh buffers, or
    rebuilt from a previous march's output tuple (kernel-level requeue)."""
    if resume is None:
        meta = jnp.concatenate(
            [
                jnp.zeros((3, n), jnp.int32),  # stop, steps, count
                jnp.full((MAX_EVENTS, n), -1, jnp.int32),  # ev kinds
                jnp.zeros((META_ROWS - 3 - MAX_EVENTS, n), jnp.int32),
            ],
            axis=0,
        )
        ev = jnp.zeros((MAX_EVENTS * EVENT_WIDTH, n), dtype)
        return meta, ev
    _, stop, steps, ev_kind, ev_data, ev_count, ev_ovf = resume
    meta = jnp.concatenate(
        [
            stop[None].astype(jnp.int32),
            steps[None].astype(jnp.int32),
            ev_count[None].astype(jnp.int32),
            ev_kind.T.astype(jnp.int32),
            ev_ovf[None].astype(jnp.int32),
            jnp.zeros((META_ROWS - 4 - MAX_EVENTS, n), jnp.int32),
        ],
        axis=0,
    )
    ev = ev_data.reshape(n, MAX_EVENTS * EVENT_WIDTH).T
    return meta, ev


def kerr_rk4_march(
    radius,
    a,
    horizon_epsilon,
    y0,  # [N, 8] state (covariant momentum), N multiple of LANE_TILE
    h0: float,
    max_steps: int,
    max_radius: float,
    discs: tuple = (),
    spheres: tuple = (),
    vols: tuple = (),
    h_min_frac: float = 0.01,
    r_ref_scale: float = 10.0,
    r_safe: float = 0.0,
    opaque_stop: bool = False,
    interpret: bool = False,
    attempts: int | None = None,
    resume=None,
    finalize: bool = True,
    ckpt_every: int = 0,
    compensated: bool = False,
):
    """March N rays; returns an integrator.IntegrationResult-compatible
    tuple of numpy-friendly arrays (see integrator.py for field meaning).

    r_safe > 0 enables far-field escape acceleration (geometric half-gap
    steps for outward lanes beyond r_safe); opaque_stop stops a lane at its
    first recorded event (exact when every object texture is opaque).

    Checkpoint/resume: `attempts` bounds THIS call's in-kernel iterations
    (default: the full max_steps budget); `resume` is a previous call's
    output tuple to continue from (per-lane steps/events/stop carry over,
    and max_steps stays the TOTAL per-lane classification budget);
    finalize=False leaves unfinished lanes RUNNING instead of BUDGET.

    ckpt_every > 0 additionally returns an 8th element: the pre-step state
    every ckpt_every iterations, [S, 8, N] with S = ceil(attempts/K) — the
    reverse-sweep checkpoints for the custom VJP (ops/geodesic_adjoint.py)."""
    n = y0.shape[0]
    assert n % LANE_TILE == 0, f"N must be a multiple of {LANE_TILE}"
    dtype = y0.dtype
    if attempts is None:
        attempts = max_steps
    if resume is not None:
        y0 = resume[0]
    # [N, 8] → (8, N//LANE, LANE): middle-axis rows of 8 form one (SUB, LANE)
    # tile per component per 1024-ray block; ray order stays contiguous per
    # block so the driver's cost sort keeps grouping slow lanes together.
    y_t = y0.T.reshape(8, n // LANE, LANE)
    meta_in, ev_in = _init_meta_ev(n, dtype, resume)
    meta_in = meta_in.reshape(META_ROWS, n // LANE, LANE)
    ev_in = ev_in.reshape(MAX_EVENTS * EVENT_WIDTH, n // LANE, LANE)

    params = jnp.array(
        [
            [radius],
            [a],
            [horizon_epsilon],
            [h0],
            [max_radius],
            [h_min_frac],
            [r_ref_scale],
            [0.0],
        ],
        dtype,
    )

    grid = (n // LANE_TILE,)
    lane_spec = lambda rows: pl.BlockSpec(
        (rows, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(
        _march_kernel,
        attempts=int(attempts),
        budget_steps=max_steps,
        discs=tuple(discs),
        spheres=tuple(spheres),
        vols=tuple(vols),
        r_safe=float(r_safe),
        opaque_stop=bool(opaque_stop),
        finalize=bool(finalize),
        ckpt_every=int(ckpt_every),
        compensated=bool(compensated),
    )
    out_specs = [
        lane_spec(8),
        lane_spec(META_ROWS),
        lane_spec(MAX_EVENTS * EVENT_WIDTH),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((8, n // LANE, LANE), dtype),
        jax.ShapeDtypeStruct((META_ROWS, n // LANE, LANE), jnp.int32),
        jax.ShapeDtypeStruct((MAX_EVENTS * EVENT_WIDTH, n // LANE, LANE), dtype),
    ]
    if ckpt_every:
        n_seg = -(-int(attempts) // int(ckpt_every))
        out_specs.append(
            pl.BlockSpec(
                (n_seg, 8, SUB, LANE), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((n_seg, 8, n // LANE, LANE), dtype))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec(8),
            lane_spec(META_ROWS),
            lane_spec(MAX_EVENTS * EVENT_WIDTH),
            pl.BlockSpec((8, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(y_t, meta_in, ev_in, params)
    y_f, meta, ev_data = outs[:3]

    y_f = y_f.reshape(8, n)
    meta = meta.reshape(META_ROWS, n)
    ev_data = ev_data.reshape(MAX_EVENTS * EVENT_WIDTH, n)
    result = (
        y_f.T,  # [N, 8]
        meta[META_STOP],
        meta[META_STEPS],
        meta[META_KIND0 : META_KIND0 + MAX_EVENTS].T,  # [N, K]
        ev_data.T.reshape(n, MAX_EVENTS, EVENT_WIDTH),
        meta[META_COUNT],
        meta[META_OVF] != 0,
    )
    if ckpt_every:
        return result + (outs[3].reshape(-1, 8, n),)
    return result


# ---------------------------------------------------------------------------
# KerrBL: Carter-separated Mino-time march
# ---------------------------------------------------------------------------


def _bl_rhs(r_s, a, e, l_z, q, y):
    """Mino-time RHS for y = (t, r, θ, φ, v_r, v_θ, 0, 0) as [8, T];
    (e, l_z, q) are per-lane conserved scalars [T]. ~20 flops/lane
    (kerr_bl.rs:140-174).

    The three reciprocals (1/Δ, 1/sin²θ, 1/sin³θ) share ONE divide via
    1/(Δ·sin²θ): 1/Δ = inv·sin², 1/sin² = inv·Δ, 1/sin³ = sinθ·(1/sin²)².
    Semantics at the pole are unchanged — sin θ = 0 exactly yields a
    non-finite RHS either way, the documented NaN-as-classification stop
    (kerr_bl.rs:156-163); the product Δ·sin²θ cannot underflow for any f32
    θ distinct from the pole (|sin θ| ≥ ulp(π) ≈ 6e-8 there)."""
    r, theta = y[1], y[2]
    delta = r * r - r_s * r + a * a
    p_r = (r * r + a * a) * e - a * l_z
    st = jnp.sin(theta)
    ct = jnp.cos(theta)
    sin2 = st * st
    inv_ds = 1.0 / (delta * sin2)
    inv_delta = inv_ds * sin2
    inv_sin2 = inv_ds * delta
    dt = (r * r + a * a) * inv_delta * p_r + a * (l_z - a * e * sin2)
    dphi = a * inv_delta * p_r + l_z * inv_sin2 - a * e
    carter_term = (l_z - a * e) ** 2 + q
    dv_r = 0.5 * (4.0 * r * e * p_r - (2.0 * r - r_s) * carter_term)
    inv_st3 = st * inv_sin2 * inv_sin2
    dv_theta = 0.5 * (-2.0 * a * a * e * e * ct * st + 2.0 * l_z * l_z * ct * inv_st3)
    zero = jnp.zeros_like(dt)
    return jnp.stack([dt, y[4], y[5], dphi, dv_r, dv_theta, zero, zero], axis=0)


def _bl_momentum(r_s, a, e, l_z, y):
    """p^μ = (1/Σ)(dt, v_r, v_θ, dφ), [4, T] (kerr_bl.rs:225-249)."""
    r, theta = y[1], y[2]
    sig = r * r + a * a * jnp.cos(theta) ** 2
    delta = r * r - r_s * r + a * a
    p_r = (r * r + a * a) * e - a * l_z
    sin2 = jnp.sin(theta) ** 2
    dt = (r * r + a * a) / delta * p_r + a * (l_z - a * e * sin2)
    dphi = a / delta * p_r + l_z / sin2 - a * e
    return jnp.stack([dt, y[4], y[5], dphi], axis=0) / sig[None, :]


def _bl_march_kernel(
    y_ref,
    consts_ref,  # VMEM [3 (padded to 8), TILE]: E, L_z, Q per lane
    meta_in_ref,  # resume metadata (fresh init rows for a new march)
    ev_in_ref,  # resume event payloads (zeros for a new march)
    param_ref,  # SMEM [8,1]: radius, a, horizon_eps, h0, max_radius, h_min_frac, r_ref, _
    y_out_ref,
    meta_ref,
    ev_data_ref,
    *maybe_ckpt,  # [ckpt_ref (S, 8, SUB, LANE)] when ckpt_every > 0
    attempts: int,
    budget_steps: int,
    discs: tuple,
    spheres: tuple = (),
    vols: tuple = (),
    opaque_stop: bool = False,
    finalize: bool = True,
    compensated: bool = False,
    ckpt_every: int = 0,
):
    radius = param_ref[0, 0]
    a = param_ref[1, 0]
    horizon_eps = param_ref[2, 0]
    h0 = param_ref[3, 0]
    max_radius = param_ref[4, 0]
    h_min_frac = param_ref[5, 0]
    r_ref_scale = param_ref[6, 0]
    ckpt_ref = maybe_ckpt[0] if maybe_ckpt else None

    y0 = y_ref[:, :, :]  # (8, SUB, LANE)
    e = consts_ref[0]
    l_z = consts_ref[1]
    q = consts_ref[2]
    tile = y0.shape[1:]
    m = 0.5 * radius
    r_plus = m + jnp.sqrt(jnp.maximum(m * m - a * a, 0.0))
    max_radius_sq = max_radius * max_radius

    # Mino-time step: dr/dλ = v_r ~ E r² far out, so h ∝ 1/(|E|(1+r²/r_ref))
    # gives a ~constant far-field spatial step ~ h0·r_ref; the same
    # distance-above-horizon shrink as the KS kernel handles photon-ring
    # orbits.
    inv_e = 1.0 / jnp.maximum(jnp.abs(e), 1e-12)

    carry0 = (
        y0,
        meta_in_ref[:, :, :],
        ev_in_ref[:, :, :],
        jnp.zeros((), jnp.int32),  # iteration within THIS phase
        jnp.zeros_like(y0),  # Kahan compensation (unused unless compensated)
    )

    def cond(c):
        meta, it = c[1], c[3]
        return jnp.logical_and(
            jnp.any(meta[META_STOP] == integ.RUNNING), it < attempts
        )

    def body(c):
        y, meta, ev_data, it, comp = c
        stop = meta[META_STOP]
        steps = meta[META_STEPS]
        ev_count = meta[META_COUNT]
        ev_kind = meta[META_KIND0 : META_KIND0 + MAX_EVENTS]
        ev_ovf = meta[META_OVF]
        active = stop == integ.RUNNING

        if ckpt_ref is not None:
            # Reverse-sweep checkpoint (ops/geodesic_adjoint.py): the
            # PRE-step state every ckpt_every iterations, exactly as in the
            # KS kernel.
            @pl.when(it % ckpt_every == 0)
            def _():
                ckpt_ref[it // ckpt_every] = y

        r_here = y[1]
        h = (
            h0
            * inv_e
            / (1.0 + (r_here / r_ref_scale) ** 2)
            * jnp.clip((r_here - r_plus) / r_ref_scale, h_min_frac, 1.0)
        )

        # No far-field lever here (unlike the KS kernel): dr/dλ = v_r ~ E r²
        # far out, so the fixed-Mino-step march already advances a ~constant
        # spatial distance per step (the 1/(1+(r/r_ref)²) factor above), and
        # huge Mino steps wreck the RK4 accuracy of the t/φ quadratures whose
        # integrands grow with r (wrong celestial UV — measured 0.15
        # tone-mapped error on escape lanes).
        k1 = _bl_rhs(radius, a, e, l_z, q, y)
        k2 = _bl_rhs(radius, a, e, l_z, q, y + 0.5 * h * k1)
        k3 = _bl_rhs(radius, a, e, l_z, q, y + 0.5 * h * k2)
        k4 = _bl_rhs(radius, a, e, l_z, q, y + h * k3)
        delta = (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        if compensated:
            # Kahan accumulation (see the KS kernel) — covers the v_r/v_θ
            # Mino quadratures whose deep-march drift the r3 accuracy run
            # flagged (docs/fastpath_accuracy_tpu.md BL tables).
            adj = delta - comp
            t_sum = y + adj
            comp_new = (t_sum - y) - adj
            y_new = jnp.where(active[None, :], t_sum, y)
            comp = jnp.where(active[None, :], comp_new, comp)
        else:
            y_new = jnp.where(active[None, :], y + delta, y)

        pos_finite = (
            jnp.isfinite(y_new[0])
            & jnp.isfinite(y_new[1])
            & jnp.isfinite(y_new[2])
            & jnp.isfinite(y_new[3])
        )
        mom_finite = jnp.isfinite(y_new[4]) & jnp.isfinite(y_new[5])
        r_new = y_new[1]
        horizon = r_new <= r_plus + horizon_eps
        escaped = r_new * r_new > max_radius_sq
        steps_new = steps + active.astype(jnp.int32)
        trapped = (steps_new >= budget_steps - 1) & (r_new < 5.0 * radius)
        budget = steps_new >= budget_steps - 1

        code = jnp.full(tile, integ.RUNNING, jnp.int32)
        code = jnp.where(~mom_finite, integ.NAN, code)
        code = jnp.where(escaped, integ.CELESTIAL, code)
        code = jnp.where(trapped, integ.TRAPPED, code)
        code = jnp.where(horizon, integ.HORIZON, code)
        code = jnp.where(~pos_finite, integ.NAN, code)
        code = jnp.where((code == integ.RUNNING) & budget, integ.BUDGET, code)
        stop_new = jnp.where(active, code, stop)

        if discs or spheres or vols:
            # Cheap candidate tests in BL coordinates gate the expensive
            # path (momenta, the 8-transcendental KS embedding, root
            # finding, buffer scatter) — each is a strict superset of the
            # corresponding store's hit condition, so gating is exact.
            half_pi = jnp.asarray(jnp.pi / 2, y.dtype)
            z0 = y[1] * jnp.cos(y[2])  # z = r cosθ (exact embedding z)
            z1 = y_new[1] * jnp.cos(y_new[2])
            cand = jnp.zeros_like(active)
            if discs:
                cand = cand | (((y[2] - half_pi) * (y_new[2] - half_pi) < 0.0) & active)
            if spheres:
                # |p| from the embedding: |p|² = (r²+a²)sin²θ + r²cos²θ
                # = r² + a² sin²θ. An endpoint inside a sphere requires
                # ||p| − |c|| <= R (reverse triangle inequality).
                n0 = jnp.sqrt(y[1] * y[1] + a * a * jnp.sin(y[2]) ** 2)
                n1 = jnp.sqrt(y_new[1] * y_new[1] + a * a * jnp.sin(y_new[2]) ** 2)
                for sphere in spheres:
                    c_norm = math.sqrt(
                        sphere.cx**2 + sphere.cy**2 + sphere.cz**2
                    )
                    near = (jnp.abs(n0 - c_norm) <= sphere.radius) | (
                        jnp.abs(n1 - c_norm) <= sphere.radius
                    )
                    cand = cand | (active & near)
            if vols:
                # The embedded chord's z is linear between z0 and z1, so
                # band overlap at the endpoints is exact & necessary for
                # every boundary root (caps and walls all lie in |z|<=cap).
                zmin = jnp.minimum(z0, z1)
                zmax = jnp.maximum(z0, z1)
                for vs in vols:
                    cand = cand | (active & (zmin <= vs.cap_h) & (zmax >= -vs.cap_h))

            def _do_stores(ev):
                ev_kind, ev_data, ev_count, ev_ovf = ev
                p_prev = _bl_momentum(radius, a, e, l_z, y)
                p_new = _bl_momentum(radius, a, e, l_z, y_new)
                # Per-step KS Cartesian embedding of the segment endpoints —
                # crossing tests run on the embedded chord, exactly like the
                # lax path's per-segment conversion (integrator.py/chart.py).
                sp0, cp0 = jnp.sin(y[3]), jnp.cos(y[3])
                sp1, cp1 = jnp.sin(y_new[3]), jnp.cos(y_new[3])
                st0, ct0 = jnp.sin(y[2]), jnp.cos(y[2])
                st1, ct1 = jnp.sin(y_new[2]), jnp.cos(y_new[2])
                s3 = jnp.stack(
                    [
                        (y[1] * cp0 - a * sp0) * st0,
                        (y[1] * sp0 + a * cp0) * st0,
                        y[1] * ct0,
                    ],
                    axis=0,
                )
                e3 = jnp.stack(
                    [
                        (y_new[1] * cp1 - a * sp1) * st1,
                        (y_new[1] * sp1 + a * cp1) * st1,
                        y_new[1] * ct1,
                    ],
                    axis=0,
                )
                if discs:
                    # Equatorial crossing in BL: θ through π/2 (z = r cosθ).
                    d_prev = y[2] - half_pi
                    d_new = y_new[2] - half_pi
                    crossing = (d_prev * d_new < 0.0) & active
                    frac = d_prev / (
                        d_prev - d_new + jnp.where(d_prev == d_new, 1.0, 0.0)
                    )
                    r_c = y[1] + frac * (y_new[1] - y[1])
                    phi_c = y[3] + frac * (y_new[3] - y[3])
                    sp = jnp.sin(phi_c)
                    cp = jnp.cos(phi_c)
                    px = r_c * cp - a * sp  # KS embedding at θ = π/2
                    py = r_c * sp + a * cp
                    p_interp = p_prev + frac[None] * (p_new - p_prev)
                    seg = e3 - s3
                    ev_kind, ev_data, ev_count, ev_ovf = _store_disc_events(
                        discs, crossing, px, py, p_interp, seg,
                        ev_kind, ev_data, ev_count, ev_ovf,
                    )
                if spheres:
                    ev_kind, ev_data, ev_count, ev_ovf = _store_sphere_events(
                        spheres, active, s3, e3, p_prev, p_new,
                        ev_kind, ev_data, ev_count, ev_ovf,
                    )
                if vols:
                    # Bounding-volume boundary crossings only (never stops
                    # the lane; volumetric scenes run with opaque_stop off).
                    ev_kind, ev_data, ev_count, ev_ovf = _store_vol_events(
                        vols, active, s3, e3, p_prev, p_new,
                        ev_kind, ev_data, ev_count, ev_ovf,
                    )
                return ev_kind, ev_data, ev_count, ev_ovf

            ev = (ev_kind, ev_data, ev_count, ev_ovf)
            if EVENT_GATE:
                ev = jax.lax.cond(jnp.any(cand), _do_stores, lambda e: e, ev)
            else:
                ev = _do_stores(ev)
            ev_kind, ev_data, ev_count, ev_ovf = ev
        if opaque_stop and (discs or spheres):
            # All textures opaque: first event saturates the fold (see the KS
            # kernel and integrator.SATURATED).
            stop_new = jnp.where(
                (stop_new == integ.RUNNING) & (ev_count > 0),
                integ.SATURATED,
                stop_new,
            )

        meta_new = jnp.concatenate(
            [
                stop_new[None],
                steps_new[None],
                ev_count[None],
                ev_kind,
                ev_ovf[None],
                meta[META_OVF + 1 :],
            ],
            axis=0,
        )
        return (y_new, meta_new, ev_data, it + 1, comp)

    y_f, meta_f, ev_data_f, _, _ = jax.lax.while_loop(cond, body, carry0)
    if finalize:
        stop_f = jnp.where(
            meta_f[META_STOP] == integ.RUNNING, integ.BUDGET, meta_f[META_STOP]
        )
        meta_f = jnp.concatenate([stop_f[None], meta_f[1:]], axis=0)
    y_out_ref[:, :, :] = y_f
    meta_ref[:, :, :] = meta_f
    ev_data_ref[:, :, :] = ev_data_f


def kerr_bl_rk4_march(
    radius,
    a,
    horizon_epsilon,
    y0,  # [N, 8] Mino state (t, r, θ, φ, v_r, v_θ, 0, 0)
    e,
    l_z,
    q,  # [N] conserved scalars
    h0: float,
    max_steps: int,
    max_radius: float,
    discs: tuple = (),
    spheres: tuple = (),
    vols: tuple = (),
    h_min_frac: float = 0.02,
    r_ref_scale: float = 10.0,
    opaque_stop: bool = False,
    interpret: bool = False,
    attempts: int | None = None,
    resume=None,
    finalize: bool = True,
    compensated: bool = False,
    ckpt_every: int = 0,
):
    """Carter-separated Mino-time RK4 march (the reference's fast geometry,
    ~8-9× cheaper RHS than the KS Hamiltonian). attempts/resume/finalize:
    march checkpoint/resume, see kerr_rk4_march. ckpt_every > 0 appends an
    8th return element with the pre-step state every ckpt_every iterations
    ([S, 8, N]) — the reverse-sweep input of ops/geodesic_adjoint.py."""
    n = y0.shape[0]
    assert n % LANE_TILE == 0, f"N must be a multiple of {LANE_TILE}"
    dtype = y0.dtype
    if attempts is None:
        attempts = max_steps
    if resume is not None:
        y0 = resume[0]
    y_t = y0.T.reshape(8, n // LANE, LANE)
    meta_in, ev_in = _init_meta_ev(n, dtype, resume)
    meta_in = meta_in.reshape(META_ROWS, n // LANE, LANE)
    ev_in = ev_in.reshape(MAX_EVENTS * EVENT_WIDTH, n // LANE, LANE)
    consts = jnp.concatenate(
        [e[None, :], l_z[None, :], q[None, :], jnp.zeros((5, n), dtype)], axis=0
    ).reshape(8, n // LANE, LANE)

    params = jnp.array(
        [
            [radius],
            [a],
            [horizon_epsilon],
            [h0],
            [max_radius],
            [h_min_frac],
            [r_ref_scale],
            [0.0],
        ],
        dtype,
    )

    grid = (n // LANE_TILE,)
    lane_spec = lambda rows: pl.BlockSpec(
        (rows, SUB, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _bl_march_kernel,
        attempts=int(attempts),
        budget_steps=max_steps,
        discs=tuple(discs),
        spheres=tuple(spheres),
        vols=tuple(vols),
        opaque_stop=bool(opaque_stop),
        finalize=bool(finalize),
        compensated=bool(compensated),
        ckpt_every=int(ckpt_every),
    )
    out_specs = [
        lane_spec(8),
        lane_spec(META_ROWS),
        lane_spec(MAX_EVENTS * EVENT_WIDTH),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((8, n // LANE, LANE), dtype),
        jax.ShapeDtypeStruct((META_ROWS, n // LANE, LANE), jnp.int32),
        jax.ShapeDtypeStruct((MAX_EVENTS * EVENT_WIDTH, n // LANE, LANE), dtype),
    ]
    if ckpt_every:
        n_seg = -(-int(attempts) // int(ckpt_every))
        out_specs.append(
            pl.BlockSpec(
                (n_seg, 8, SUB, LANE), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
            )
        )
        out_shape.append(jax.ShapeDtypeStruct((n_seg, 8, n // LANE, LANE), dtype))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            lane_spec(8),
            lane_spec(8),
            lane_spec(META_ROWS),
            lane_spec(MAX_EVENTS * EVENT_WIDTH),
            pl.BlockSpec((8, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(y_t, consts, meta_in, ev_in, params)
    y_f, meta, ev_data = outs[:3]

    y_f = y_f.reshape(8, n)
    meta = meta.reshape(META_ROWS, n)
    ev_data = ev_data.reshape(MAX_EVENTS * EVENT_WIDTH, n)
    result = (
        y_f.T,
        meta[META_STOP],
        meta[META_STEPS],
        meta[META_KIND0 : META_KIND0 + MAX_EVENTS].T,
        ev_data.T.reshape(n, MAX_EVENTS, EVENT_WIDTH),
        meta[META_COUNT],
        meta[META_OVF] != 0,
    )
    if ckpt_every:
        return result + (outs[3].reshape(-1, 8, n),)
    return result
