"""Pallas TPU kernel: volumetric-disc constant-step raymarch.

The single most expensive workload in the reference's scene set
(volumetric_disc.rs:199-328 — 50,000 steps × step_size 0.0002 per
disc-entering ray at the hero 1500×1500 config). The lax raymarch
(objects/volumetric_disc.py) re-reads its carry from HBM every step; here
each lane block stays VMEM-resident for the whole march, like the geodesic
kernel (ops/geodesic_pallas.py). The driver's exit-distance sort feeds block
assignment, so blocks of short marches exit early together.

Everything per sample is pure ALU:
  * density — hash-Perlin fBm (ops/noise.py lane-wise variants; the hash is
    uint32 multiply-xor-shift, no tables);
  * redshift — transport-free Killing coefficients at the BL radius
    (circular_orbit.rs / volumetric_disc.rs:252-258), closed form;
  * temperature — the Novikov-Thorne radial LUT is replaced by a Chebyshev
    fit of the SMOOTH quantity T⁴(r) (flux is ~linear near the ISCO where
    T ∝ (r−r_isco)^¼ has an infinite slope), evaluated by a static-
    coefficient Clenshaw recurrence, then two sqrt;
  * blackbody texture — the log₁₀T color LUT is replaced by Chebyshev fits
    of log₁₀X/Y/Z(log₁₀T) (smooth, slowly varying), exponentiated in-kernel.

Chebyshev degrees are chosen so the fits match the lax LUT path to ~1e-4
relative over their domains (validated by tests/test_volumetric_pallas.py);
kernels cannot capture array constants, so coefficients enter as static
Python floats unrolled into the Clenshaw recurrence.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gr_raytracer_tpu.objects.volumetric_disc import SATURATION_EPS
from gr_raytracer_tpu.ops import noise
from gr_raytracer_tpu.ops.geodesic_pallas import _atan2

IN_VARS = 11  # ro3 | rd3 | obs_e | p_t | p_phi | exit_d | active
OUT_VARS = 4  # xyz | alpha
SUB = 8  # f32 sublane count — each per-ray variable is a (SUB, LANE) tile
LANE = 128
BLOCK = SUB * LANE  # rays per kernel block
TEMP_DEG = 32
# Blackbody log-XYZ fits are split at log₁₀T = 3.8 into two lower-degree
# Chebyshev domains evaluated by ONE Clenshaw recurrence over per-lane
# selected coefficients: deg (16, 12) matches the single deg-48 fit to
# ≤2e-5 relative (scan in scripts/vol_ceiling_probe.py history) while
# cutting the Clenshaw FMAs ~3x — the texture was ~14% of the per-sample
# cost (docs/vol_roofline.json).
BB_SPLIT = 3.8
BB_DEG_LO = 16  # [lo, BB_SPLIT] — the steep Wien-tail side
BB_DEG_HI = 12  # [BB_SPLIT, hi]
BB_LOG_FLOOR = -120.0  # log10 of "no emission" (f64 min ~1e-308; f32 flushes)
# March-loop unroll: samples per while-loop iteration. Each sub-sample
# carries its own exact live mask (d < d_hi, not yet saturated), so any
# factor is bit-equivalent to the rolled loop; the win is amortizing the
# per-iteration while_loop overhead (~44% of the per-sample time at the
# `advance` floor, docs/vol_roofline.json).
UNROLL = int(__import__("os").environ.get("GR_VOL_UNROLL", "4"))


# ---------------------------------------------------------------------------
# Host-side Chebyshev fitting (static kernel constants)
# ---------------------------------------------------------------------------


def cheb_fit(fn, lo: float, hi: float, deg: int):
    """Chebyshev interpolation coefficients of fn over [lo, hi] (numpy,
    host side). Returns a tuple of deg+1 Python floats (c0 ... c_deg)."""
    k = np.arange(deg + 1)
    nodes = np.cos(np.pi * (k + 0.5) / (deg + 1))  # Chebyshev points in [-1, 1]
    x = 0.5 * (hi + lo) + 0.5 * (hi - lo) * nodes
    f = np.asarray(fn(x), np.float64)
    # c_j = 2/N * sum_k f(x_k) T_j(t_k), halved for j = 0.
    tk = np.arccos(nodes)
    c = []
    n = deg + 1
    for j in range(n):
        cj = 2.0 / n * np.sum(f * np.cos(j * tk))
        c.append(float(cj))
    c[0] *= 0.5
    return tuple(c)


def cheb_eval(coeffs, lo, hi, x):
    """Clenshaw evaluation with STATIC coefficients (Python floats) — safe
    inside a Pallas kernel; unrolls to deg fused multiply-adds."""
    t = (2.0 * x - (lo + hi)) / (hi - lo)
    t2 = 2.0 * t
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for c in reversed(coeffs[1:]):
        b1, b2 = t2 * b1 - b2 + c, b1
    return t * b1 - b2 + coeffs[0]


def cheb_eval_dual(c_lo, c_hi, lo, split, hi, in_hi, x):
    """Split-domain Clenshaw: one recurrence over per-lane SELECTED static
    coefficients (the two coefficient tuples are zero-padded to a common
    degree). `in_hi` selects the [split, hi] domain; the domain affine map
    is selected the same way. Cost: max(deg)+1 selects + max(deg) FMAs
    instead of a single high-degree fit's FMAs."""
    n = max(len(c_lo), len(c_hi))
    c_lo = tuple(c_lo) + (0.0,) * (n - len(c_lo))
    c_hi = tuple(c_hi) + (0.0,) * (n - len(c_hi))
    t = jnp.where(
        in_hi,
        (2.0 * x - (split + hi)) / (hi - split),
        (2.0 * x - (lo + split)) / (split - lo),
    )
    t2 = 2.0 * t
    b1 = jnp.zeros_like(x)
    b2 = jnp.zeros_like(x)
    for a, b in zip(reversed(c_lo[1:]), reversed(c_hi[1:])):
        c = jnp.where(in_hi, b, a) if a != b else a
        b1, b2 = t2 * b1 - b2 + c, b1
    c0 = jnp.where(in_hi, c_hi[0], c_lo[0])
    return t * b1 - b2 + c0


class TempSpec(NamedTuple):
    """Static temperature model: constant, or Chebyshev fit of T⁴(r)."""

    kind: str  # "const" | "cheb"
    value: float = 0.0
    lo: float = 0.0
    hi: float = 1.0
    coeffs: tuple = ()


class TexSpec(NamedTuple):
    """Static texture: blackbody (split-domain log-XYZ Chebyshev fits,
    cx/cy/cz over [lo, split] and cx2/cy2/cz2 over [split, hi]) or
    checker."""

    kind: str  # "blackbody" | "checker"
    beaming: float = 0.0
    lo: float = 0.0
    hi: float = 1.0
    split: float = 1.0
    cx: tuple = ()
    cy: tuple = ()
    cz: tuple = ()
    cx2: tuple = ()
    cy2: tuple = ()
    cz2: tuple = ()
    c1: tuple = ()  # checker XYZA
    c2: tuple = ()
    width: float = 1.0
    height: float = 1.0


class VolSpec(NamedTuple):
    """Static kernel parameters extracted from a CONCRETE VolumetricDisc +
    geometry (everything the march needs, as Python scalars)."""

    inner: float
    outer: float
    thickness: float
    density_multiplier: float
    brightness_ref: float
    absorption: float
    scattering: float
    noise_scale: tuple  # (3,)
    noise_offset: float
    step_size: float
    max_steps: int
    num_octaves: int
    key: int
    axis: tuple  # (3,)
    e1: tuple
    e2: tuple
    r_s: float
    a: float
    temp: TempSpec
    tex: TexSpec
    # Octave truncation (kernel-only lever): drop the smallest-amplitude fBm
    # octaves (amplitude 0.5^k of a unit-amplitude stack — octave 7 moves the
    # density ≤0.8%). Parity vs the untruncated lax path is measured by the
    # kernel parity tests / fastpath accuracy runs; default 0 = exact stack.
    drop_octaves: int = 0


def build_temp_spec(model, emit_lo=None, emit_hi=None) -> TempSpec:
    """Fit the concrete temperature model over the disc's EMITTING radial
    range [emit_lo, emit_hi] (density is zero outside, so the temperature
    value there never contributes). Fitting T⁴ (≈ flux, smooth) rather than
    T avoids the (r−r_isco)^¼ cusp; restricting the domain away from the
    ISCO keeps the LUT interpolant polynomial-friendly."""
    from gr_raytracer_tpu.rendering.temperature import ConstantTemperature

    if isinstance(model, ConstantTemperature):
        return TempSpec(kind="const", value=float(model.value))
    radii = np.asarray(model.radii, np.float64)
    lo = float(radii[0]) if emit_lo is None else max(float(radii[0]), float(emit_lo))
    hi = float(radii[-1]) if emit_hi is None else min(float(radii[-1]), float(emit_hi))
    if not hi > lo:
        lo, hi = float(radii[0]), float(radii[-1])

    def t4(r):
        t = np.asarray(jax.device_get(model.at(jnp.asarray(r))), np.float64)
        return t**4

    return TempSpec(kind="cheb", lo=lo, hi=hi, coeffs=cheb_fit(t4, lo, hi, TEMP_DEG))


def build_tex_spec(texture) -> TexSpec:
    from gr_raytracer_tpu.rendering.texture import BlackBodyMap, CheckerMap

    if isinstance(texture, CheckerMap):
        return TexSpec(
            kind="checker",
            beaming=float(texture.beaming_exponent),
            c1=tuple(float(v) for v in np.asarray(texture.c1)),
            c2=tuple(float(v) for v in np.asarray(texture.c2)),
            width=float(texture.width),
            height=float(texture.height),
        )
    assert isinstance(texture, BlackBodyMap)
    from gr_raytracer_tpu.rendering import blackbody

    log_t = np.asarray(texture.log_t, np.float64)
    # Fit log₁₀XYZ of the SMOOTH Planck×CIE integral — split at BB_SPLIT
    # into deg (16, 12) domains, ≤2e-5 relative vs the integral — not the
    # 1000-point linear LUT: the LUT's own error vs the integral is ~1% at
    # the steep low-T end (the reference budgets 2%, texture.rs LUT test),
    # so the kernel is strictly MORE accurate than the lax LUT path; parity
    # tests budget that 1%. Below ~400 K (lo = 2.6) the radiance underflows
    # even f64 — the kernel returns 0 there.
    lo = max(float(log_t[0]), 2.6)
    hi = float(log_t[-1])
    split = min(max(BB_SPLIT, lo + 0.1), hi - 0.1)

    def chan(c):
        def f(l):
            v = np.asarray(
                jax.device_get(blackbody.blackbody_xyz(jnp.asarray(10.0**l)))
            )[:, c]
            return np.log10(np.maximum(v, 10.0**BB_LOG_FLOOR))

        return f

    return TexSpec(
        kind="blackbody",
        beaming=float(texture.beaming_exponent),
        lo=lo,
        hi=hi,
        split=split,
        cx=cheb_fit(chan(0), lo, split, BB_DEG_LO),
        cy=cheb_fit(chan(1), lo, split, BB_DEG_LO),
        cz=cheb_fit(chan(2), lo, split, BB_DEG_LO),
        cx2=cheb_fit(chan(0), split, hi, BB_DEG_HI),
        cy2=cheb_fit(chan(1), split, hi, BB_DEG_HI),
        cz2=cheb_fit(chan(2), split, hi, BB_DEG_HI),
    )


def build_vol_spec(obj, geometry) -> VolSpec:
    """Static spec from a concrete VolumetricDisc + geometry."""
    return VolSpec(
        inner=float(obj.inner_radius),
        outer=float(obj.outer_radius),
        thickness=float(obj.thickness),
        density_multiplier=float(obj.density_multiplier),
        brightness_ref=float(obj.brightness_reference_temperature),
        absorption=float(obj.absorption),
        scattering=float(obj.scattering),
        noise_scale=tuple(float(v) for v in np.asarray(obj.noise_scale)),
        noise_offset=float(obj.noise_offset),
        step_size=float(obj.step_size),
        max_steps=int(obj.max_steps),
        num_octaves=int(obj.num_octaves),
        key=int(np.asarray(obj.perm)),
        axis=tuple(float(v) for v in np.asarray(obj.axis)),
        e1=tuple(float(v) for v in np.asarray(obj.e1)),
        e2=tuple(float(v) for v in np.asarray(obj.e2)),
        r_s=float(geometry.radius),
        a=float(getattr(geometry, "a", 0.0)),
        temp=build_temp_spec(
            obj.temperature_model, float(obj.inner_radius), float(obj.outer_radius)
        ),
        tex=build_tex_spec(obj.texture),
        drop_octaves=int(__import__("os").environ.get("GR_VOL_DROP_OCTAVES", "0")),
    )


def march_length(obj, ro, rd, exit_d):
    """Host-side clipped march length per lane (numpy [N]): the same
    |h|-band ∩ r<outer interval math as the kernel prologue. The right
    block-assignment sort key — two lanes with equal exit_d can differ 50×
    in clipped samples when one crosses the slab steeply."""
    axis = np.asarray(obj.axis, np.float64)
    ro = np.asarray(ro, np.float64)
    rd = np.asarray(rd, np.float64)
    exit_d = np.asarray(exit_d, np.float64)
    d_s = float(obj.step_size)
    h_cut = float(obj.thickness) * math.sqrt(math.log(1.0 / DENSITY_VERTICAL_CUTOFF))
    h0 = ro @ axis
    dh = rd @ axis
    big = np.inf
    flat = np.abs(dh) <= 1e-12
    safe_dh = np.where(flat, 1.0, dh)
    ta = (-h_cut - h0) / safe_dh
    tb = (h_cut - h0) / safe_dh
    in_band = np.abs(h0) <= h_cut
    h_lo = np.where(flat, np.where(in_band, 0.0, big), np.minimum(ta, tb))
    h_hi = np.where(flat, np.where(in_band, big, -big), np.maximum(ta, tb))
    qa = 1.0 - dh * dh
    qb = 2.0 * (np.sum(ro * rd, axis=-1) - h0 * dh)
    qc = np.sum(ro * ro, axis=-1) - h0 * h0 - float(obj.outer_radius) ** 2
    qdisc = qb * qb - 4.0 * qa * qc
    degen = qa <= 1e-8
    sq = np.sqrt(np.maximum(qdisc, 0.0))
    safe_qa = np.where(degen, 1.0, qa)
    miss = (~degen) & (qdisc < 0.0)
    r_lo = np.where(degen, 0.0, np.where(miss, big, (-qb - sq) / (2.0 * safe_qa)))
    r_hi = np.where(degen, big, np.where(miss, -big, (-qb + sq) / (2.0 * safe_qa)))
    d_budget = float(obj.max_steps) * d_s
    d_lo = np.maximum(np.maximum(h_lo, r_lo), 0.0)
    d_hi = np.minimum(np.minimum(h_hi, r_hi) + d_s, np.minimum(exit_d, d_budget))
    # Subtract the inner-hole crossing the kernel now jumps over (same
    # quadratic with inner²) so the sort key tracks actual marched samples.
    qc_i = qc + float(obj.outer_radius) ** 2 - float(obj.inner_radius) ** 2
    qd_i = qb * qb - 4.0 * qa * qc_i
    enters = (~degen) & (qd_i > 0.0)
    sq_i = np.sqrt(np.maximum(qd_i, 0.0))
    i_lo = np.where(enters, (-qb - sq_i) / (2.0 * safe_qa), big)
    i_hi = np.where(enters, (-qb + sq_i) / (2.0 * safe_qa), -big)
    hole = np.maximum(np.minimum(i_hi, d_hi) - np.maximum(i_lo, d_lo), 0.0)
    return np.maximum(d_hi - d_lo - hole, 0.0)


def march_length_jnp(obj, ro, rd, exit_d):
    """Device-side twin of march_length (jnp, [N] lanes): the block-
    assignment sort key for the fused split tracer
    (fast_path.make_fast_vol_fused_tracer), so the sort no longer forces a
    host round-trip. Same |h|-band ∩ r<outer ∩ hole-subtraction math;
    parity vs the numpy version is pinned by tests/test_volumetric_pallas."""
    axis = jnp.asarray(obj.axis, ro.dtype)
    d_s = obj.step_size
    h_cut = obj.thickness * math.sqrt(math.log(1.0 / DENSITY_VERTICAL_CUTOFF))
    h0 = ro @ axis
    dh = rd @ axis
    big = jnp.asarray(jnp.inf, ro.dtype)
    flat = jnp.abs(dh) <= 1e-12
    safe_dh = jnp.where(flat, 1.0, dh)
    ta = (-h_cut - h0) / safe_dh
    tb = (h_cut - h0) / safe_dh
    in_band = jnp.abs(h0) <= h_cut
    h_lo = jnp.where(flat, jnp.where(in_band, 0.0, big), jnp.minimum(ta, tb))
    h_hi = jnp.where(flat, jnp.where(in_band, big, -big), jnp.maximum(ta, tb))
    qa = 1.0 - dh * dh
    qb = 2.0 * (jnp.sum(ro * rd, axis=-1) - h0 * dh)
    qc = jnp.sum(ro * ro, axis=-1) - h0 * h0 - obj.outer_radius**2
    qdisc = qb * qb - 4.0 * qa * qc
    degen = qa <= 1e-8
    sq = jnp.sqrt(jnp.maximum(qdisc, 0.0))
    safe_qa = jnp.where(degen, 1.0, qa)
    miss = (~degen) & (qdisc < 0.0)
    r_lo = jnp.where(degen, 0.0, jnp.where(miss, big, (-qb - sq) / (2.0 * safe_qa)))
    r_hi = jnp.where(degen, big, jnp.where(miss, -big, (-qb + sq) / (2.0 * safe_qa)))
    d_budget = obj.max_steps * d_s
    d_lo = jnp.maximum(jnp.maximum(h_lo, r_lo), 0.0)
    d_hi = jnp.minimum(jnp.minimum(h_hi, r_hi) + d_s, jnp.minimum(exit_d, d_budget))
    qc_i = qc + (obj.outer_radius**2 - obj.inner_radius**2)
    qd_i = qb * qb - 4.0 * qa * qc_i
    enters = (~degen) & (qd_i > 0.0)
    sq_i = jnp.sqrt(jnp.maximum(qd_i, 0.0))
    i_lo = jnp.where(enters, (-qb - sq_i) / (2.0 * safe_qa), big)
    i_hi = jnp.where(enters, (-qb + sq_i) / (2.0 * safe_qa), -big)
    hole = jnp.maximum(jnp.minimum(i_hi, d_hi) - jnp.maximum(i_lo, d_lo), 0.0)
    return jnp.maximum(d_hi - d_lo - hole, 0.0)


def supports(obj, geometry) -> bool:
    """Kernel coverage: Kerr/KerrBL/Schwarzschild geometry (one BL-radius
    formula covers all three at their own spin), blackbody or checker
    texture, constant or Novikov-Thorne temperature."""
    from gr_raytracer_tpu.geometry.kerr import Kerr
    from gr_raytracer_tpu.geometry.kerr_bl import KerrBL
    from gr_raytracer_tpu.geometry.schwarzschild import Schwarzschild
    from gr_raytracer_tpu.rendering.temperature import ConstantTemperature, TemperatureLUT
    from gr_raytracer_tpu.rendering.texture import BlackBodyMap, CheckerMap

    return (
        isinstance(geometry, (Kerr, KerrBL, Schwarzschild))
        and isinstance(obj.texture, (BlackBodyMap, CheckerMap))
        and isinstance(obj.temperature_model, (ConstantTemperature, TemperatureLUT))
    )


# ---------------------------------------------------------------------------
# In-kernel sample math (componentwise over [T] lanes)
# ---------------------------------------------------------------------------

DENSITY_VERTICAL_CUTOFF = 1e-3


class MedParams(NamedTuple):
    """Traced medium parameters for the differentiable raymarch
    (ops/volumetric_adjoint.py): the spec statics a gradient pass treats as
    leaves. `None` fields fall back to the spec's static value, so the
    production kernel is untouched."""

    dm: object = None  # density_multiplier
    off: object = None  # noise_offset
    sa: object = None  # absorption
    ss: object = None  # scattering
    br: object = None  # brightness_reference_temperature


def _med_or(spec: VolSpec, med):
    """(dm, off, br) — traced values when given, spec statics otherwise."""
    if med is None:
        return spec.density_multiplier, spec.noise_offset, spec.brightness_ref
    return (
        spec.density_multiplier if med.dm is None else med.dm,
        spec.noise_offset if med.off is None else med.off,
        spec.brightness_ref if med.br is None else med.br,
    )


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _cross3(ax, ay, az, bx, by, bz):
    return ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx


def _density(spec: VolSpec, px, py, pz, med=None):
    """volumetric_disc.rs:97-152 / objects/volumetric_disc.py density()."""
    dm, off, _ = _med_or(spec, med)
    axx, axy, axz = spec.axis
    h = jnp.abs(px * axx + py * axy + pz * axz)
    cx, cy, cz = _cross3(px, py, pz, axx, axy, axz)
    r = jnp.sqrt(jnp.maximum(cx * cx + cy * cy + cz * cz, 1e-30))
    inside = (r > spec.inner) & (r < spec.outer)

    vertical = jnp.exp(-((h / spec.thickness) ** 2))
    inside = inside & (vertical >= DENSITY_VERTICAL_CUTOFF)

    # Envelope radius floored at inner/2: density is IDENTICALLY zero for
    # r <= inner (the `inside` mask), so every consumer of the clamped
    # branch is masked there and the forward is bit-identical — but the
    # VJP of (inner/r)^1.5 is ∝ 1/r^2.5, which f32-overflows below
    # r ~ 1e-8 (an on-axis sample — e.g. a padded/garbage event lane at
    # the origin — sits at r = 1e-15), and inf·0 through the where-mask
    # poisons the whole adjoint block (ops/volumetric_adjoint.py).
    safe_r = jnp.maximum(r, jnp.maximum(0.5 * spec.inner, 1e-3))
    t_ratio = spec.inner / safe_r
    radial_base = t_ratio * jnp.sqrt(t_ratio)  # (inner/r)^1.5
    # exp(a)·exp(b) = exp(a+b): one transcendental for both edge falloffs.
    boundary = jnp.exp(
        -1.0 / jnp.maximum((spec.outer - safe_r) ** 2, 1e-4)
        - 1.0 / jnp.maximum((safe_r - spec.inner) ** 2, 1e-4)
    )

    e1x, e1y, e1z = spec.e1
    e2x, e2y, e2z = spec.e2
    x_loc = px * e1x + py * e1y + pz * e1z
    y_loc = px * e2x + py * e2y + pz * e2z
    # cos/sin of the in-plane azimuth DIRECTLY: (e1, e2, axis) orthonormal ⇒
    # |p × axis| = √(x_loc² + y_loc²) = r, so cosφ = x_loc/r, sinφ = y_loc/r —
    # replaces atan2 + cos + sin per sample with two multiplies.
    inv_rin = 1.0 / safe_r
    cphi = x_loc * inv_rin
    sphi = y_loc * inv_rin
    key = jnp.uint32(spec.key)
    n = noise.fbm_lanes(
        key,
        r * spec.noise_scale[0],
        cphi * spec.noise_scale[1],
        sphi * spec.noise_scale[1],
        max(1, spec.num_octaves - spec.drop_octaves),
        0.5,
    )
    n = n + 0.5 * noise.perlin3_lanes(key, r * 0.5, h * spec.noise_scale[2], cphi)
    n = jnp.maximum(n + off, 0.0) * dm
    return jnp.where(inside, n * radial_base * vertical * boundary, 0.0), r, cphi, sphi


def _killing_coefficients(r_s, a, r):
    """(u^t, u^φ, ok) of the prograde circular orbit at BL radius r
    (circular_orbit.rs:76-108), componentwise."""
    sqrt_m = (0.5 * r_s) ** 0.5
    omega = sqrt_m / (r * jnp.sqrt(r) + a * sqrt_m)
    sigma = r * r
    g_tt = -(1.0 - r_s * r / sigma)
    g_tphi = -a * r_s * r / sigma
    g_phiphi = r * r + a * a + a * a * r_s * r / sigma
    ut_pre = g_tt + 2.0 * omega * g_tphi + omega * omega * g_phiphi
    ok = ut_pre < 0.0
    safe = jnp.where(ok, -ut_pre, 1.0)
    u_t = jnp.where(ok, 1.0 / jnp.sqrt(safe), 0.0)
    return u_t, omega * u_t, ok


def _temperature(spec: VolSpec, r_dist):
    if spec.temp.kind == "const":
        return jnp.full_like(r_dist, spec.temp.value)
    r = jnp.clip(r_dist, spec.temp.lo, spec.temp.hi)
    t4 = jnp.maximum(cheb_eval(spec.temp.coeffs, spec.temp.lo, spec.temp.hi, r), 0.0)
    return jnp.sqrt(jnp.sqrt(t4))


_LOG10_E_INV = float(np.log(10.0))


def _texture_color(spec: VolSpec, u, v, temperature, redshift):
    """XYZ + texture alpha of the disc texture at (u, v, T, z)."""
    tex = spec.tex
    if tex.kind == "checker":
        ut = jnp.floor(u * tex.width).astype(jnp.int32)
        vt = jnp.floor(v * tex.height).astype(jnp.int32)
        even = (ut + vt) % 2 == 0
        col = [jnp.where(even, tex.c1[i], tex.c2[i]) for i in range(4)]
        x, y, z, alpha = col
    else:
        t_shift = jnp.maximum(temperature * redshift, 1e-10)
        l = jnp.log(t_shift) / _LOG10_E_INV  # log10
        in_dom = l >= tex.lo
        lc = jnp.clip(l, tex.lo, tex.hi)
        in_hi = lc >= tex.split  # shared by the three channel evals
        ev = lambda c_lo, c_hi: jnp.exp(
            cheb_eval_dual(c_lo, c_hi, tex.lo, tex.split, tex.hi, in_hi, lc)
            * _LOG10_E_INV
        )
        x = ev(tex.cx, tex.cx2)
        y = ev(tex.cy, tex.cy2)
        z = ev(tex.cz, tex.cz2)
        zero = jnp.zeros_like(x)
        x = jnp.where(in_dom, x, zero)
        y = jnp.where(in_dom, y, zero)
        z = jnp.where(in_dom, z, zero)
        alpha = jnp.ones_like(x)
    if tex.beaming != 0.0:
        factor = jnp.exp(tex.beaming * jnp.log(jnp.maximum(redshift, 1e-30)))
        x, y, z = x * factor, y * factor, z * factor
    return x, y, z, alpha


def _sample_optics(spec: VolSpec, px, py, pz, obs_e, p_t, p_phi, med=None):
    """Per-sample optics at Cartesian position p — everything in the march
    body that does not touch the loop carry: density (fBm noise × radial/
    vertical envelopes), transport-free redshift, temperature, texture color
    and the T⁴/T_ref⁴ Stefan-Boltzmann emission weight. Shared by the kernel
    and the roofline probe (scripts/vol_ceiling_probe.py), so the probe
    measures the EXACT production expression.

    Returns (density, emit_ok, ex, ey, ez, lalpha): density unmasked by the
    carry's live flag (the caller gates), emit_ok the position-only emission
    condition, e* the intensity-scaled texture XYZ."""
    density, r_axis, cphi, sphi = _density(spec, px, py, pz, med)
    emitting = density > 0.0

    # Transport-free per-sample redshift (volumetric_disc.rs:252-258):
    # BL radius from the Cartesian sample (exact for a = 0 too).
    rho_sq = px * px + py * py + pz * pz
    dd = rho_sq - spec.a * spec.a
    r_bl = jnp.sqrt(
        jnp.maximum(
            0.5 * (dd + jnp.sqrt(dd * dd + 4.0 * spec.a * spec.a * pz * pz)), 1e-30
        )
    )
    u_t, u_phi, orbit_ok = _killing_coefficients(spec.r_s, spec.a, r_bl)
    emitter_energy = u_t * p_t + u_phi * p_phi
    emit_ok = emitting & orbit_ok & (jnp.abs(emitter_energy) > 0.0)
    safe_e = jnp.where(emit_ok, emitter_energy, 1.0)
    redshift = jnp.where(emit_ok, obs_e / safe_e, 1.0)

    temperature = _temperature(spec, r_axis)
    # UV (objects/volumetric_disc.py uv()): r from the in-plane radius.
    r_norm = (r_axis - spec.inner) / (spec.outer - spec.inner)
    u_uv = 0.5 + 0.5 * r_norm * cphi
    v_uv = 0.5 + 0.5 * r_norm * sphi
    lx, ly, lz, lalpha = _texture_color(spec, u_uv, v_uv, temperature, redshift)

    _, _, br = _med_or(spec, med)
    t_ratio = temperature / br
    t2 = t_ratio * t_ratio
    intensity = t2 * t2
    return density, emit_ok, intensity * lx, intensity * ly, intensity * lz, lalpha


# ---------------------------------------------------------------------------
# Kernel
# ---------------------------------------------------------------------------


def _march_bounds(spec: VolSpec, rox, roy, roz, rdx, rdy, rdz, exit_d, active, dtype):
    """Shared march-clipping prologue: the possibly-emitting sample range
    [k0·d_s, d_hi) plus the inner-hole crossing interval. Used by the
    production kernel and the differentiable forward/backward kernels
    (ops/volumetric_adjoint.py) — ONE implementation so the adjoint replays
    the identical k-sequence. Returns (k0, d_hi, empty, i_lo, i_hi,
    k_hole_exit)."""
    d_s = spec.step_size
    # ---- Exact march clipping (a beyond-the-reference lever) -------------
    # density() is IDENTICALLY zero outside (a) the vertical Gaussian band
    # |h| <= h_cut (hard DENSITY_VERTICAL_CUTOFF) and (b) the r < outer
    # cylinder. Along the straight chord p(d) = ro + d·rd, h(d) is linear
    # and r²(d) quadratic, so the possibly-emitting d-range is a closed
    # interval — skipping samples outside it changes nothing (attenuation
    # exp(0) = 1, emission 0). For near-plane slabs (thickness << chord)
    # this cuts the marched samples by 5-50×.
    h_cut = spec.thickness * math.sqrt(math.log(1.0 / DENSITY_VERTICAL_CUTOFF))
    axx, axy, axz = spec.axis
    h0 = rox * axx + roy * axy + roz * axz
    dh = rdx * axx + rdy * axy + rdz * axz
    big = jnp.asarray(3.4e38, dtype)
    flat = jnp.abs(dh) <= 1e-12
    safe_dh = jnp.where(flat, 1.0, dh)
    ta = (-h_cut - h0) / safe_dh
    tb = (h_cut - h0) / safe_dh
    in_band = jnp.abs(h0) <= h_cut
    h_lo = jnp.where(flat, jnp.where(in_band, 0.0, big), jnp.minimum(ta, tb))
    h_hi = jnp.where(flat, jnp.where(in_band, big, -big), jnp.maximum(ta, tb))
    # r²(d) = |p|² − h(d)²; rd is unit so A = 1 − dh² >= 0.
    qa = 1.0 - dh * dh
    qb = 2.0 * (rox * rdx + roy * rdy + roz * rdz - h0 * dh)
    qc = rox * rox + roy * roy + roz * roz - h0 * h0 - spec.outer * spec.outer
    qdisc = qb * qb - 4.0 * qa * qc
    degen = qa <= 1e-8  # chord ~parallel to axis: r² ~linear, skip the clip
    sq = jnp.sqrt(jnp.maximum(qdisc, 0.0))
    safe_qa = jnp.where(degen, 1.0, qa)
    miss = (~degen) & (qdisc < 0.0)
    r_lo = jnp.where(degen, 0.0, jnp.where(miss, big, (-qb - sq) / (2.0 * safe_qa)))
    r_hi = jnp.where(degen, big, jnp.where(miss, -big, (-qb + sq) / (2.0 * safe_qa)))

    d_budget = float(spec.max_steps) * d_s  # lax never samples past this
    d_lo = jnp.maximum(jnp.maximum(h_lo, r_lo), 0.0)
    d_hi = jnp.minimum(jnp.minimum(h_hi, r_hi) + d_s, jnp.minimum(exit_d, d_budget))
    k0 = jnp.floor(d_lo / d_s)  # start on the lax sample grid, one back
    k0 = jnp.maximum(k0 - 1.0, 0.0)
    empty = (k0 * d_s >= d_hi) | ~active

    # ---- Inner-hole skip (exact, same argument as the outer clip) --------
    # density() is identically zero for r < inner too; the chord's crossing
    # of the inner cylinder is one interval [i_lo, i_hi] of the SAME
    # quadratic with inner² in place of outer². Jumping the sample index
    # over it changes nothing (emission 0, attenuation exp(0) = 1) and, for
    # a near-edge-on thin slab (hero #5: inner/outer = 4.05/16, chord
    # through the hole ≈ 25% of the in-band length), cuts real samples.
    # Shrunk one step per side so f32 edge rounding can only UNDER-skip;
    # the exp(−1/(r−inner)²) boundary falloff makes those edge samples
    # exact zeros anyway.
    qc_i = qc + (spec.outer * spec.outer - spec.inner * spec.inner)
    qd_i = qb * qb - 4.0 * qa * qc_i
    enters_hole = (~degen) & (qd_i > 0.0)
    sq_i = jnp.sqrt(jnp.maximum(qd_i, 0.0))
    i_lo = jnp.where(enters_hole, (-qb - sq_i) / (2.0 * safe_qa) + d_s, big)
    i_hi = jnp.where(enters_hole, (-qb + sq_i) / (2.0 * safe_qa) - d_s, -big)
    k_hole_exit = jnp.ceil(i_hi / d_s)
    return k0, d_hi, empty, i_lo, i_hi, k_hole_exit


def _march_kernel(in_ref, out_ref, *, spec: VolSpec):
    # Each per-ray variable is a native (SUB, VTILE) = (8, 128) block — one
    # full f32 VPU tile per op. The previous rank-1 (T,) rows measured 1.64×
    # slower on an identical ALU march (scripts/layout_probe.py): Mosaic lays
    # a lane vector across lane tiles only, leaving sublanes idle.
    data = in_ref[:, :]
    var = lambda i: data[i * SUB : (i + 1) * SUB]
    rox, roy, roz = var(0), var(1), var(2)
    rdx, rdy, rdz = var(3), var(4), var(5)
    obs_e = var(6)
    p_t = var(7)
    p_phi = var(8)
    exit_d = var(9)
    active = var(10) > 0.5
    dtype = data.dtype

    d_s = spec.step_size
    sigma = spec.absorption + spec.scattering
    k0, d_hi, empty, i_lo, i_hi, k_hole_exit = _march_bounds(
        spec, rox, roy, roz, rdx, rdy, rdz, exit_d, active, dtype
    )

    shape = rox.shape
    carry0 = (
        k0,  # sample index (d_o = k · d_s — index·step, no accumulation drift)
        jnp.ones(shape, dtype),  # transparency
        jnp.zeros(shape, dtype),  # acc_x
        jnp.zeros(shape, dtype),  # acc_y
        jnp.zeros(shape, dtype),  # acc_z
        jnp.zeros(shape, dtype),  # alpha_w_sum
        jnp.zeros(shape, dtype),  # alpha_w_tot
        jnp.where(empty, 1.0, 0.0).astype(dtype),  # done
        jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return jnp.logical_and(jnp.any(c[7] < 0.5), c[8] < spec.max_steps)

    def sub_sample(s):
        """One exact march sample (same math and exit conditions as the
        rolled loop); applied UNROLL times per while iteration — each
        sub-sample carries its own live mask, so unrolling is
        bit-equivalent and only amortizes the loop overhead."""
        k, transparency0, c_x, c_y, c_z, c_ws, c_wt, c_done = s
        live = c_done < 0.5

        d_o = k * d_s
        px = rox + rdx * d_o
        py = roy + rdy * d_o
        pz = roz + rdz * d_o
        d_o_new = d_o + d_s

        density, emit_ok, ex, ey, ez, lalpha = _sample_optics(
            spec, px, py, pz, obs_e, p_t, p_phi
        )
        density = jnp.where(live, density, 0.0)

        attenuation = jnp.exp(-d_s * density * sigma)
        transparency = jnp.where(live, transparency0 * attenuation, transparency0)
        live_emit = emit_ok & live

        # light_attenuation == attenuation (same expression); reuse it.
        weight = transparency * attenuation * spec.scattering * density * d_s
        emit_f = jnp.where(live_emit, 1.0, 0.0)
        wscale = weight * emit_f
        acc_x = c_x + wscale * ex
        acc_y = c_y + wscale * ey
        acc_z = c_z + wscale * ez

        alpha_w = jnp.where(live_emit, density * d_s, 0.0)
        a_w_sum = c_ws + jnp.clip(lalpha, 0.0, 1.0) * alpha_w
        a_w_tot = c_wt + alpha_w

        # Inner-hole jump: if the NEXT sample lands inside the hole
        # interval, skip straight to its exit index (every skipped sample
        # is an exact zero — see the prologue derivation). The current
        # sample was already evaluated normally.
        k_next = k + 1.0
        d_next = k_next * d_s
        in_hole = (d_next >= i_lo) & (d_next < i_hi)
        k_next = jnp.where(in_hole, jnp.maximum(k_hole_exit, k_next), k_next)

        # Saturation early-exit mirrors objects/volumetric_disc.py
        # SATURATION_EPS exactly (see the bound documented there).
        saturated = transparency < SATURATION_EPS
        done = jnp.where(
            (c_done > 0.5) | (k_next * d_s >= d_hi) | saturated, 1.0, 0.0
        )
        k_keep = jnp.where(live, k_next, k)
        return (k_keep, transparency, acc_x, acc_y, acc_z, a_w_sum, a_w_tot, done)

    def body(c):
        s = c[:8]
        for _ in range(UNROLL):
            s = sub_sample(s)
        return s + (c[8] + UNROLL,)

    c_f = jax.lax.while_loop(cond, body, carry0)
    physical_opacity = 1.0 - c_f[1]
    tot = c_f[6]
    # ALPHA_WT_MIN gate — see objects/volumetric_disc.py (gradient-safety
    # floor on the quotient; alpha change < 1e-18).
    from gr_raytracer_tpu.objects.volumetric_disc import ALPHA_WT_MIN

    ok = tot > ALPHA_WT_MIN
    texture_alpha = jnp.where(ok, c_f[5] / jnp.where(ok, tot, 1.0), 1.0)
    alpha = physical_opacity * texture_alpha
    out_ref[:, :] = jnp.concatenate([c_f[2], c_f[3], c_f[4], alpha], axis=0)


def _to_tiles(v, n_blocks):
    """[N] → (SUB, N//SUB) with block b's rays contiguous: column index
    b*LANE+l, sublane s holds ray b*BLOCK + s*LANE + l. Keeps the driver's
    exit-distance sort intact per block (short marches share a block)."""
    return v.reshape(n_blocks, SUB, LANE).transpose(1, 0, 2).reshape(SUB, -1)


def raymarch(spec: VolSpec, ro, rd, obs_e, p_t, p_phi, active, exit_d, interpret=False):
    """March [N] lanes (padded internally to a BLOCK=1024 multiple with
    inactive lanes). ro/rd: [N, 3]; the rest [N]. Returns XYZA [N, 4].
    exit_d must already be masked to 0 on inactive lanes (the driver
    computes it with the lax exit_distance — identical math, one batched
    call)."""
    n_in = ro.shape[0]
    n = -(-n_in // BLOCK) * BLOCK
    n_blocks = n // BLOCK
    dtype = ro.dtype

    pad1 = lambda v: jnp.pad(v, (0, n - n_in))
    cols = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
            obs_e, p_t, p_phi, exit_d, active.astype(dtype)]
    cols = [pad1(c) for c in cols]
    data = jnp.concatenate([_to_tiles(c, n_blocks) for c in cols], axis=0)

    grid = (n_blocks,)
    lane_spec = lambda nvars: pl.BlockSpec(
        (nvars * SUB, LANE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_march_kernel, spec=spec)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[lane_spec(IN_VARS)],
        out_specs=[lane_spec(OUT_VARS)],
        out_shape=[jax.ShapeDtypeStruct((OUT_VARS * SUB, n // SUB), dtype)],
        interpret=interpret,
    )(data)[0]
    # (OUT_VARS*SUB, n//SUB) → [N, 4], inverting _to_tiles per variable.
    out = out.reshape(OUT_VARS, SUB, n_blocks, LANE).transpose(0, 2, 1, 3).reshape(OUT_VARS, n)
    return out.T[:n_in]
