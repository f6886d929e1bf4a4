"""Custom VJP for the volumetric Pallas raymarch (BASELINE config #5's
"full gradient pass"; r4 verdict item 1).

The march's accumulators have the classic emission/absorption volume-
rendering structure: a running transmittance product T_{i+1} = T_i·att_i
and weighted sums A = Σ w_i e_i with w_i = T_i att_i² σ_s ρ_i d_s. For this
recurrence the reverse pass does NOT need checkpoints or a reverse sweep at
all: every cotangent is a per-step term plus a SUFFIX sum over later
emission weights,

    dL/dρ_i = (ct_A·e_i) ∂w_i/∂ρ_i − d_s σ (G_i + ct_T T_f)
              + (ct_Ws α_i + ct_Wt) d_s m_i,
    G_i = Σ_{j>i} (ct_A·e_j) w_j = ct_A·A_final − Σ_{j≤i} (ct_A·e_j) w_j,

so the backward is a SECOND FORWARD-ORDER march that replays the identical
k-sequence (same march-clipping bounds, same hole jumps, same saturation
exit — `_march_bounds` is shared), reconstructs T_i incrementally, forms
G_i from the forward's committed totals, and pushes the per-sample
cotangents through `jax.vjp` of the exact production optics
(`_sample_optics`). O(1) memory, one extra march of cost ≈ 2-3× the
forward — the same trick NeRF CUDA trainers use for volume rendering.

Differentiated inputs:
  * the 5 medium parameters (density_multiplier, noise_offset, absorption,
    scattering, brightness_reference_temperature) — the fit targets the
    reference's VolumetricDisc config block exposes
    (volumetric_disc.rs:199-328);
  * per-lane ray inputs (ro, rd, obs_e, p_t, p_phi) — so the pass can chain
    into the geodesic kernel VJP through the event payload.

Locally-constant discrete decisions (same convention as the geodesic
adjoint): the march-clipping interval, the inner-hole jump, the saturation
exit step, and exit_d. The clip boundaries are exact zeros of the density
(the boundary falloff), so their motion carries no gradient signal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gr_raytracer_tpu.objects.volumetric_disc import SATURATION_EPS
from gr_raytracer_tpu.ops import volumetric_pallas as vp

IN_VARS = vp.IN_VARS  # ro3 | rd3 | obs_e | p_t | p_phi | exit_d | active
# Backward-march unroll: the vjp'd optics body is ~3× the primal's ops, so
# the loop-overhead amortization saturates earlier than the forward's
# UNROLL=4 while compile time grows with the unroll factor.
BWD_UNROLL = int(__import__("os").environ.get("GR_VOL_BWD_UNROLL", "2"))
RAW_VARS = 6  # acc_xyz | transparency | alpha_w_sum | alpha_w_tot
CT_VARS = 8  # ct_acc3 | ct_T | ct_ws | ct_wt | s_tot | t_f
DIN_VARS = 9  # d_ro3 | d_rd3 | d_obs_e | d_p_t | d_p_phi
N_MED = 5  # dm, off, sa, ss, br
SUB = vp.SUB
LANE = vp.LANE
BLOCK = vp.BLOCK


def _med_from_ref(med_ref):
    return vp.MedParams(
        dm=med_ref[0, 0], off=med_ref[1, 0], sa=med_ref[2, 0],
        ss=med_ref[3, 0], br=med_ref[4, 0],
    )


def _optics_masked(spec, med, px, py, pz, obs_e, p_t, p_phi):
    """_sample_optics with the emission mask as a float output (so jax.vjp
    sees only float outputs; the mask's cotangent is structurally zero)."""
    d, ok, ex, ey, ez, la = vp._sample_optics(spec, px, py, pz, obs_e, p_t, p_phi, med)
    return d, jnp.where(ok, 1.0, 0.0), ex, ey, ez, la


def _fwd_kernel(in_ref, med_ref, out_ref, *, spec: vp.VolSpec):
    """Forward march with traced medium params (SMEM) and RAW reduction
    outputs (acc3, T, Ws, Wt) — the alpha combination happens outside the
    kernel in plain jnp so it is differentiated automatically. Loop body is
    op-for-op the production kernel's (UNROLL included), so the forward is
    bit-identical to vp.raymarch at equal parameter values (pinned by
    tests/test_vol_adjoint.py)."""
    data = in_ref[:, :]
    var = lambda i: data[i * SUB : (i + 1) * SUB]
    rox, roy, roz = var(0), var(1), var(2)
    rdx, rdy, rdz = var(3), var(4), var(5)
    obs_e, p_t, p_phi = var(6), var(7), var(8)
    exit_d = var(9)
    active = var(10) > 0.5
    dtype = data.dtype
    med = _med_from_ref(med_ref)

    d_s = spec.step_size
    sigma = med.sa + med.ss
    k0, d_hi, empty, i_lo, i_hi, k_hole_exit = vp._march_bounds(
        spec, rox, roy, roz, rdx, rdy, rdz, exit_d, active, dtype
    )

    shape = rox.shape
    carry0 = (
        k0,
        jnp.ones(shape, dtype),   # transparency
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
        k, transparency0, c_x, c_y, c_z, c_ws, c_wt, c_done = s
        live = c_done < 0.5
        d_o = k * d_s
        px = rox + rdx * d_o
        py = roy + rdy * d_o
        pz = roz + rdz * d_o

        density, emit_ok, ex, ey, ez, lalpha = vp._sample_optics(
            spec, px, py, pz, obs_e, p_t, p_phi, med
        )
        density = jnp.where(live, density, 0.0)
        attenuation = jnp.exp(-d_s * density * sigma)
        transparency = jnp.where(live, transparency0 * attenuation, transparency0)
        live_emit = emit_ok & live

        weight = transparency * attenuation * med.ss * density * d_s
        emit_f = jnp.where(live_emit, 1.0, 0.0)
        wscale = weight * emit_f
        acc_x = c_x + wscale * ex
        acc_y = c_y + wscale * ey
        acc_z = c_z + wscale * ez

        alpha_w = jnp.where(live_emit, density * d_s, 0.0)
        a_w_sum = c_ws + jnp.clip(lalpha, 0.0, 1.0) * alpha_w
        a_w_tot = c_wt + alpha_w

        k_next = k + 1.0
        d_next = k_next * d_s
        in_hole = (d_next >= i_lo) & (d_next < i_hi)
        k_next = jnp.where(in_hole, jnp.maximum(k_hole_exit, k_next), k_next)
        saturated = transparency < SATURATION_EPS
        done = jnp.where(
            (c_done > 0.5) | (k_next * d_s >= d_hi) | saturated, 1.0, 0.0
        )
        k_keep = jnp.where(live, k_next, k)
        return (k_keep, transparency, acc_x, acc_y, acc_z, a_w_sum, a_w_tot, done)

    def body(c):
        s = c[:8]
        for _ in range(vp.UNROLL):
            s = sub_sample(s)
        return s + (c[8] + vp.UNROLL,)

    c_f = jax.lax.while_loop(cond, body, carry0)
    out_ref[:, :] = jnp.concatenate(
        [c_f[2], c_f[3], c_f[4], c_f[1], c_f[5], c_f[6]], axis=0
    )


def _bwd_kernel(in_ref, med_ref, ct_ref, din_ref, dmed_ref, *, spec: vp.VolSpec):
    """Backward: forward-order replay with suffix sums (module docstring).
    Per-lane input cotangents in VMEM; medium-parameter partials as SMEM
    block partials (summed outside)."""
    data = in_ref[:, :]
    var = lambda i: data[i * SUB : (i + 1) * SUB]
    rox, roy, roz = var(0), var(1), var(2)
    rdx, rdy, rdz = var(3), var(4), var(5)
    obs_e, p_t, p_phi = var(6), var(7), var(8)
    exit_d = var(9)
    active = var(10) > 0.5
    dtype = data.dtype
    med = _med_from_ref(med_ref)

    cts = ct_ref[:, :]
    cvar = lambda i: cts[i * SUB : (i + 1) * SUB]
    ct_ax, ct_ay, ct_az = cvar(0), cvar(1), cvar(2)
    ct_t, ct_ws, ct_wt = cvar(3), cvar(4), cvar(5)
    s_tot, t_f = cvar(6), cvar(7)

    d_s = spec.step_size
    sigma = med.sa + med.ss
    k0, d_hi, empty, i_lo, i_hi, k_hole_exit = vp._march_bounds(
        spec, rox, roy, roz, rdx, rdy, rdz, exit_d, active, dtype
    )

    shape = rox.shape
    zero = jnp.zeros(shape, dtype)
    zs = jnp.zeros((), dtype)
    carry0 = (
        k0,
        jnp.ones(shape, dtype),  # transparency (replayed)
        zero,  # S_pref: Σ_{j≤i} (ct_A·e_j) w_j
        jnp.where(empty, 1.0, 0.0).astype(dtype),  # done
        # per-lane input cotangents
        zero, zero, zero,  # d_ro
        zero, zero, zero,  # d_rd
        zero, zero, zero,  # d_obs_e, d_p_t, d_p_phi
        # medium partials (block scalars)
        zs, zs, zs, zs, zs,  # d_dm, d_off, d_sigma, d_ss_direct, d_br
        jnp.zeros((), jnp.int32),
    )

    def cond(c):
        return jnp.logical_and(jnp.any(c[3] < 0.5), c[-1] < spec.max_steps)

    def sub_sample(s):
        (k, transparency0, s_pref, c_done,
         drox, droy, droz, drdx, drdy, drdz, dobs, dpt, dpp,
         ddm, doff, dsig, dssd, dbr) = s
        live = c_done < 0.5
        live_f = jnp.where(live, 1.0, 0.0)
        d_o = k * d_s
        # Benign mid-disc substitution for dead lanes (the geodesic
        # adjoint's convention): every cotangent a dead lane feeds the vjp
        # is zero, but a pathological position (on-axis, origin) can still
        # produce inf intermediates whose 0·inf would poison the per-block
        # parameter sums.
        safe_p = 0.5 * (spec.inner + spec.outer)
        px = jnp.where(live, rox + rdx * d_o, safe_p)
        py = jnp.where(live, roy + rdy * d_o, 0.0)
        pz = jnp.where(live, roz + rdz * d_o, 0.0)

        fn = functools.partial(_optics_masked, spec)
        (density_raw, emit_f_raw, ex, ey, ez, lalpha), vjp_fn = jax.vjp(
            fn, med, px, py, pz, obs_e, p_t, p_phi
        )
        rho = jnp.where(live, density_raw, 0.0)
        tau = d_s * rho
        # Same op order as the forward kernel's attenuation so the
        # transparency carry — and with it the saturation exit step —
        # replays bit-exactly.
        att = jnp.exp(-d_s * rho * sigma)
        transparency = jnp.where(live, transparency0 * att, transparency0)
        m = jnp.where(live & (emit_f_raw > 0.5), 1.0, 0.0)

        # Replay of the forward's weights (w = T_pre·att²·σ_s·ρ·d_s·m).
        att2 = att * att
        v = transparency0 * att2 * rho * d_s * m  # w / σ_s
        w = med.ss * v
        ce = ct_ax * ex + ct_ay * ey + ct_az * ez  # e_i · ct_A
        cw = ce * w
        s_pref_new = s_pref + cw
        g_suf = s_tot - s_pref_new  # Σ_{j>i} cw_j
        common = g_suf + ct_t * t_f

        # dL/dρ_i: direct w_i term + suffix/T_f attenuation chain + alpha.
        alpha_cl_grad = jnp.where((lalpha > 0.0) & (lalpha < 1.0), 1.0, 0.0)
        d_rho = (
            ce * med.ss * transparency0 * att2 * d_s * m
            * (1.0 - 2.0 * d_s * sigma * rho)
            - d_s * sigma * common * live_f
            + (ct_ws * jnp.clip(lalpha, 0.0, 1.0) + ct_wt) * d_s * m
        )
        d_ex = ct_ax * w
        d_ey = ct_ay * w
        d_ez = ct_az * w
        d_la = ct_ws * rho * d_s * m * alpha_cl_grad

        d_med_l, d_px, d_py, d_pz, d_oe, d_pt_l, d_pp_l = vjp_fn(
            (d_rho * live_f, jnp.zeros_like(d_rho), d_ex, d_ey, d_ez, d_la)
        )
        # σ = σ_a + σ_s structure terms (not part of the optics):
        #   dL/dσ += −τ_i (G_i + 2 cw_i + ct_T T_f); dL/dσ_s += (ct_A·e_i) v_i.
        dsig_new = dsig + jnp.sum(-tau * (common + 2.0 * cw))
        dssd_new = dssd + jnp.sum(ce * v)
        # vjp over the MedParams pytree: dm/off/br flow through the optics;
        # its sa/ss leaves are untouched inside (zeros).
        ddm_new = ddm + d_med_l.dm
        doff_new = doff + d_med_l.off
        dbr_new = dbr + d_med_l.br

        # p = ro + rd·d_o with the k-grid locally constant.
        drox_n, droy_n, droz_n = drox + d_px, droy + d_py, droz + d_pz
        drdx_n = drdx + d_px * d_o
        drdy_n = drdy + d_py * d_o
        drdz_n = drdz + d_pz * d_o
        dobs_n, dpt_n, dpp_n = dobs + d_oe, dpt + d_pt_l, dpp + d_pp_l

        k_next = k + 1.0
        d_next = k_next * d_s
        in_hole = (d_next >= i_lo) & (d_next < i_hi)
        k_next = jnp.where(in_hole, jnp.maximum(k_hole_exit, k_next), k_next)
        saturated = transparency < SATURATION_EPS
        done = jnp.where(
            (c_done > 0.5) | (k_next * d_s >= d_hi) | saturated, 1.0, 0.0
        )
        k_keep = jnp.where(live, k_next, k)
        return (
            k_keep, transparency, s_pref_new, done,
            drox_n, droy_n, droz_n, drdx_n, drdy_n, drdz_n, dobs_n, dpt_n, dpp_n,
            ddm_new, doff_new, dsig_new, dssd_new, dbr_new,
        )

    def body(c):
        s = c[:-1]
        for _ in range(BWD_UNROLL):
            s = sub_sample(s)
        return s + (c[-1] + BWD_UNROLL,)

    c_f = jax.lax.while_loop(cond, body, carry0)
    din_ref[:, :] = jnp.concatenate(list(c_f[4:13]), axis=0)
    dmed_ref[0, 0, 0] = c_f[13]                 # d density_multiplier
    dmed_ref[0, 0, 1] = c_f[14]                 # d noise_offset
    dmed_ref[0, 0, 2] = c_f[15]                 # d absorption  (= dσ)
    dmed_ref[0, 0, 3] = c_f[15] + c_f[16]       # d scattering  (= dσ + direct)
    dmed_ref[0, 0, 4] = c_f[17]                 # d brightness_ref
    dmed_ref[0, 0, 5] = jnp.zeros((), dtype)
    dmed_ref[0, 0, 6] = jnp.zeros((), dtype)
    dmed_ref[0, 0, 7] = jnp.zeros((), dtype)


def make_vol_march_diff(spec: vp.VolSpec, interpret: bool = False):
    """Differentiable raymarch for a static VolSpec.

    Returns fn(dm, off, sa, ss, br, ro, rd, obs_e, p_t, p_phi, active_f,
    exit_d) → (acc [N,3], transparency [N], alpha_w_sum [N], alpha_w_tot
    [N]) with a custom VJP over every argument except active_f/exit_d
    (discrete gates — zero cotangent). Callers combine
    alpha = (1−T)·(Ws/Wt) outside (plain jnp, differentiated
    automatically)."""

    def _pack(ro, rd, obs_e, p_t, p_phi, active_f, exit_d):
        n_in = ro.shape[0]
        n = -(-n_in // BLOCK) * BLOCK
        n_blocks = n // BLOCK
        pad1 = lambda v: jnp.pad(v, (0, n - n_in))
        cols = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
                obs_e, p_t, p_phi, exit_d, active_f]
        cols = [pad1(c) for c in cols]
        data = jnp.concatenate([vp._to_tiles(c, n_blocks) for c in cols], axis=0)
        return data, n, n_blocks, n_in

    def _unpack(out, nvars, n, n_blocks, n_in):
        out = out.reshape(nvars, SUB, n_blocks, LANE).transpose(0, 2, 1, 3)
        return out.reshape(nvars, n).T[:n_in]

    def _med_arr(dm, off, sa, ss, br, dtype):
        return jnp.stack(
            [jnp.asarray(v, dtype) for v in (dm, off, sa, ss, br)]
            + [jnp.zeros((), dtype)] * 3
        ).reshape(8, 1)

    lane_spec = lambda nvars: pl.BlockSpec(
        (nvars * SUB, LANE), lambda i: (0, i), memory_space=pltpu.VMEM
    )

    def _forward(dm, off, sa, ss, br, ro, rd, obs_e, p_t, p_phi, active_f, exit_d):
        data, n, n_blocks, n_in = _pack(ro, rd, obs_e, p_t, p_phi, active_f, exit_d)
        dtype = data.dtype
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, spec=spec),
            grid=(n_blocks,),
            in_specs=[
                lane_spec(IN_VARS),
                pl.BlockSpec((8, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[lane_spec(RAW_VARS)],
            out_shape=[jax.ShapeDtypeStruct((RAW_VARS * SUB, n // SUB), dtype)],
            interpret=interpret,
        )(data, _med_arr(dm, off, sa, ss, br, dtype))[0]
        raw = _unpack(out, RAW_VARS, n, n_blocks, n_in)
        return raw[:, 0:3], raw[:, 3], raw[:, 4], raw[:, 5]

    @jax.custom_vjp
    def march(dm, off, sa, ss, br, ro, rd, obs_e, p_t, p_phi, active_f, exit_d):
        return _forward(dm, off, sa, ss, br, ro, rd, obs_e, p_t, p_phi, active_f, exit_d)

    def march_fwd(dm, off, sa, ss, br, ro, rd, obs_e, p_t, p_phi, active_f, exit_d):
        res = _forward(dm, off, sa, ss, br, ro, rd, obs_e, p_t, p_phi, active_f, exit_d)
        acc, t_fin, _, _ = res
        residuals = (dm, off, sa, ss, br, ro, rd, obs_e, p_t, p_phi,
                     active_f, exit_d, acc, t_fin)
        return res, residuals

    def march_bwd(residuals, cts):
        (dm, off, sa, ss, br, ro, rd, obs_e, p_t, p_phi,
         active_f, exit_d, acc, t_fin) = residuals
        ct_acc, ct_t, ct_ws, ct_wt = cts
        # Per-lane committed totals the suffix trick needs.
        s_tot = jnp.sum(ct_acc * acc, axis=-1)
        data, n, n_blocks, n_in = _pack(ro, rd, obs_e, p_t, p_phi, active_f, exit_d)
        dtype = data.dtype
        pad1 = lambda v: jnp.pad(v, (0, n - n_in))
        ct_cols = [ct_acc[:, 0], ct_acc[:, 1], ct_acc[:, 2],
                   ct_t, ct_ws, ct_wt, s_tot, t_fin]
        ct_data = jnp.concatenate(
            [vp._to_tiles(pad1(c), n_blocks) for c in ct_cols], axis=0
        )
        din, dmed = pl.pallas_call(
            functools.partial(_bwd_kernel, spec=spec),
            grid=(n_blocks,),
            in_specs=[
                lane_spec(IN_VARS),
                pl.BlockSpec((8, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
                lane_spec(CT_VARS),
            ],
            out_specs=[
                lane_spec(DIN_VARS),
                pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((DIN_VARS * SUB, n // SUB), dtype),
                jax.ShapeDtypeStruct((n_blocks, 1, 8), dtype),
            ],
            interpret=interpret,
        )(data, _med_arr(dm, off, sa, ss, br, dtype), ct_data)
        din_l = _unpack(din, DIN_VARS, n, n_blocks, n_in)
        dmed_s = jnp.sum(dmed[:, 0, :], axis=0)
        z = jnp.zeros_like(active_f)
        return (
            dmed_s[0].astype(jnp.asarray(dm).dtype),
            dmed_s[1].astype(jnp.asarray(off).dtype),
            dmed_s[2].astype(jnp.asarray(sa).dtype),
            dmed_s[3].astype(jnp.asarray(ss).dtype),
            dmed_s[4].astype(jnp.asarray(br).dtype),
            din_l[:, 0:3], din_l[:, 3:6], din_l[:, 6], din_l[:, 7], din_l[:, 8],
            z, jnp.zeros_like(exit_d),
        )

    march.defvjp(march_fwd, march_bwd)
    return march


def combine_alpha(acc, t_fin, a_w_sum, a_w_tot):
    """The production kernel's epilogue (op-for-op), outside the kernel so
    it is differentiated by JAX: XYZA from the raw reductions. The
    ALPHA_WT_MIN quotient gate is load-bearing here: d(ws/wt)/dwt = -ws/wt²
    f32-underflows for femto-weight lanes and the resulting inf·0 NaN would
    enter the backward kernel as ct_ws/ct_wt (the bug that NaN-poisoned
    dm/off on chip while br/sa/ss stayed finite)."""
    from gr_raytracer_tpu.objects.volumetric_disc import ALPHA_WT_MIN

    physical_opacity = 1.0 - t_fin
    ok = a_w_tot > ALPHA_WT_MIN
    texture_alpha = jnp.where(ok, a_w_sum / jnp.where(ok, a_w_tot, 1.0), 1.0)
    alpha = physical_opacity * texture_alpha
    return jnp.concatenate([acc, alpha[..., None]], axis=-1)
