"""Perlin-noise volumetric accretion disc.

Reference: src/scene_objects/volumetric_disc.rs. Bounding geometry is an
inner+outer cylinder pair clipped to ±3·thickness caps; on a segment hit the
shading runs a straight-line (not geodesic) constant-step raymarch from the
entry point: Perlin-fBm density with a seamless cylindrical noise mapping,
Beer-Lambert attenuation with σ_a + σ_s, per-sample transport-free redshift
from the ray's conserved (p_t, p_φ) and the local circular-orbit Killing
coefficients, T⁴/T_ref⁴ emission weighting, and texture alpha accumulated
separately.

TPU mapping: detection (segment-vs-bounding-volume, a fixed candidate set of
6 quadratic/planar roots) runs inside the integrator loop like every other
object; the raymarch runs in the deferred shading pass as ONE batched
lax.while_loop over all [N, K] event slots with a done mask — empty slots
start done, exited lanes stop contributing, and the loop ends when every
lane has passed its precomputed exit distance (volumetric_disc.rs:172-196
fast path, always available here).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct
from jax import lax

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.ops import noise
from gr_raytracer_tpu.precision import einsum

MIN_INTERSECTION_T = 1e-9

# Saturation early-exit (beyond the reference: volumetric_disc.rs:234-309
# marches to exit_distance even when the medium is already opaque). Once
# transparency < eps, every remaining emission weight carries that
# transparency factor and their sum is bounded by eps * (sigma_s/sigma)
# (geometric decay), so truncating changes XYZ by < eps * intensity — far
# below tone-map quantization. Dense lanes retire in O(saturation depth)
# steps instead of the full 50k budget. The Pallas raymarch kernel applies
# the identical rule (ops/volumetric_pallas.py), keeping parity exact.
SATURATION_EPS = 1e-7
DENSITY_VERTICAL_CUTOFF = 1e-3
CAP_HEIGHT_SIGMAS = 3.0
# Texture-alpha quotient gate: treat alpha_w_tot <= this as "nothing
# emitted" (texture_alpha = 1), not just == 0. A lane grazing the inner-edge
# boundary falloff accumulates femto-densities (wt ~ 1e-21); its physical
# opacity is then <= ~1e-18 too, so the alpha changes by < 1e-18 — but the
# ws/wt quotient's REVERSE rule divides by wt², which f32-underflows below
# wt ~ 1e-19 and poisons the whole gradient block with inf·0
# (ops/volumetric_adjoint.py). Applied identically in the lax epilogue, the
# Pallas kernel epilogue, and combine_alpha so the three stay in lockstep.
ALPHA_WT_MIN = 1e-18


class VolumetricDisc(struct.PyTreeNode):
    inner_radius: jnp.ndarray
    outer_radius: jnp.ndarray
    temperature_model: object
    texture: object
    axis: jnp.ndarray  # [3] unit
    e1: jnp.ndarray  # [3] disc-plane basis
    e2: jnp.ndarray  # [3]
    perm: jnp.ndarray  # [512] Perlin permutation
    thickness: jnp.ndarray
    density_multiplier: jnp.ndarray
    brightness_reference_temperature: jnp.ndarray
    absorption: jnp.ndarray
    scattering: jnp.ndarray
    noise_scale: jnp.ndarray  # [3]
    noise_offset: jnp.ndarray
    step_size: jnp.ndarray
    num_octaves: int = struct.field(pytree_node=False)
    max_steps: int = struct.field(pytree_node=False)
    # Reverse-differentiable raymarch (see raymarch): lax.while_loop has no
    # reverse rule, so gradient work (fitting density_multiplier, optical
    # depths, noise_offset, ...) opts into a cond-gated checkpointed-scan
    # march instead — the same design as the geodesic integrator's
    # differentiable=True path. Forward results are exact vs the while_loop
    # (dead lanes are no-ops; the budget gate is replicated per step).
    differentiable: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------
    # Construction
    # ------------------------------------------------------------------

    @classmethod
    def create(
        cls,
        inner_radius,
        outer_radius,
        temperature_model,
        texture,
        axis=(0.0, 0.0, 1.0),
        num_octaves=8,
        perlin_seed=0,
        max_steps=50000,
        step_size=0.001,
        thickness=0.03,
        density_multiplier=500.0,
        brightness_reference_temperature=1000.0,
        absorption=0.3,
        scattering=0.4,
        noise_scale=(1.0, 1.0, 1.0),
        noise_offset=0.0,
        dtype=None,
        differentiable=False,
    ):
        if dtype is None:
            dtype = jnp.result_type(float)
        ax = np.asarray(axis, np.float64)
        if np.dot(ax, ax) <= np.finfo(np.float64).eps:
            ax = np.array([0.0, 0.0, 1.0])
        ax = ax / np.linalg.norm(ax)
        # Disc-plane basis (volumetric_disc.rs:66-73).
        pick = np.array([0.0, 1.0, 0.0]) if abs(ax[0]) > 0.9 else np.array([1.0, 0.0, 0.0])
        e1 = np.cross(pick, ax)
        e1 = e1 / np.linalg.norm(e1)
        e2 = np.cross(ax, e1)
        e2 = e2 / np.linalg.norm(e2)
        return cls(
            inner_radius=jnp.asarray(inner_radius, dtype),
            outer_radius=jnp.asarray(outer_radius, dtype),
            temperature_model=temperature_model,
            texture=texture,
            axis=jnp.asarray(ax, dtype),
            e1=jnp.asarray(e1, dtype),
            e2=jnp.asarray(e2, dtype),
            perm=jnp.asarray(noise.permutation_table(perlin_seed)),
            thickness=jnp.asarray(thickness, dtype),
            density_multiplier=jnp.asarray(density_multiplier, dtype),
            brightness_reference_temperature=jnp.asarray(
                brightness_reference_temperature, dtype
            ),
            absorption=jnp.asarray(absorption, dtype),
            scattering=jnp.asarray(scattering, dtype),
            noise_scale=jnp.asarray(noise_scale, dtype),
            noise_offset=jnp.asarray(noise_offset, dtype),
            step_size=jnp.asarray(step_size, dtype),
            num_octaves=int(num_octaves),
            max_steps=int(max_steps),
            differentiable=bool(differentiable),
        )

    # ------------------------------------------------------------------
    # Density / UV (volumetric_disc.rs:97-152)
    # ------------------------------------------------------------------

    def density(self, p):
        """Perlin-fBm gas density at spatial points p [..., 3]."""
        h = jnp.abs(einsum("...i,i->...", p, self.axis))
        cross = jnp.cross(jnp.broadcast_to(p, p.shape), jnp.broadcast_to(self.axis, p.shape))
        r = jnp.sqrt(jnp.maximum(jnp.sum(cross * cross, axis=-1), 1e-30))
        inside = (r > self.inner_radius) & (r < self.outer_radius)

        vertical = jnp.exp(-((h / self.thickness) ** 2))
        inside = inside & (vertical >= DENSITY_VERTICAL_CUTOFF)

        # Envelope radius floored at inner/2: value-neutral (density is
        # identically zero for r <= inner via `inside`), but keeps the VJP
        # of (inner/r)^1.5 — ∝ 1/r^2.5 — finite for on-axis samples, where
        # it otherwise f32-overflows and 0·inf poisons reverse mode (same
        # clamp as ops/volumetric_pallas._density; the kernel parity tests
        # pin the two formulas together).
        safe_r = jnp.maximum(r, jnp.maximum(0.5 * self.inner_radius, 1e-3))
        radial_base = jnp.power(self.inner_radius / safe_r, 1.5)
        # exp(a)·exp(b) = exp(a+b): one transcendental for both edge falloffs
        # (kept formula-identical with the Pallas kernel, ops/volumetric_pallas).
        boundary = jnp.exp(
            -1.0 / jnp.maximum((self.outer_radius - safe_r) ** 2, 1e-4)
            - 1.0 / jnp.maximum((safe_r - self.inner_radius) ** 2, 1e-4)
        )

        x_loc = einsum("...i,i->...", p, self.e1)
        y_loc = einsum("...i,i->...", p, self.e2)
        # cosφ/sinφ of the in-plane azimuth directly: (e1, e2, axis)
        # orthonormal ⇒ |p × axis| = √(x_loc² + y_loc²) = r, so cosφ =
        # x_loc/r, sinφ = y_loc/r — no atan2/cos/sin per sample (identical
        # math to the Pallas kernel so the parity tests stay tight).
        cphi = x_loc / safe_r
        sphi = y_loc / safe_r
        # φ mapped to a circle in noise space: seam-free periodic noise.
        noise_p = jnp.stack(
            [
                r * self.noise_scale[0],
                cphi * self.noise_scale[1],
                sphi * self.noise_scale[1],
            ],
            axis=-1,
        )
        n = noise.fbm(self.perm, noise_p, self.num_octaves, 0.5)
        vert_p = jnp.stack([r * 0.5, h * self.noise_scale[2], cphi], axis=-1)
        n = n + 0.5 * noise.perlin3(self.perm, vert_p)
        n = jnp.maximum(n + self.noise_offset, 0.0) * self.density_multiplier
        return jnp.where(inside, n * radial_base * vertical * boundary, 0.0)

    def uv(self, p):
        x = einsum("...i,i->...", p, self.e1)
        y = einsum("...i,i->...", p, self.e2)
        rr = jnp.sqrt(x * x + y * y)
        phi = jnp.arctan2(y, x)
        r = (rr - self.inner_radius) / (self.outer_radius - self.inner_radius)
        return 0.5 + 0.5 * r * jnp.cos(phi), 0.5 + 0.5 * r * jnp.sin(phi)

    # ------------------------------------------------------------------
    # Bounding-volume intersection (volumetric_disc.rs:348-494)
    # ------------------------------------------------------------------

    def _candidate_ts(self, s, d):
        """All boundary-crossing parameters of segment s + t·d, t ∈ [0, 1]:
        inner/outer clipped cylinders (2 roots each) + 2 annular caps.
        Returns (t [..., 6], valid [..., 6])."""
        cap_h = self.thickness * CAP_HEIGHT_SIGMAS
        axis = self.axis

        def cylinder_roots(radius):
            v = jnp.cross(s, jnp.broadcast_to(axis, s.shape))
            w = jnp.cross(d, jnp.broadcast_to(axis, d.shape))
            a = jnp.sum(w * w, axis=-1)
            b = 2.0 * jnp.sum(v * w, axis=-1)
            c = jnp.sum(v * v, axis=-1) - radius * radius
            disc = b * b - 4.0 * a * c
            ok = (a >= 1e-10 * jnp.sum(d * d, axis=-1)) & (disc >= 0.0)
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            safe_a = jnp.where(a > 0.0, a, 1.0)
            ts = []
            for sign in (-1.0, 1.0):
                t = (-b + sign * sq) / (2.0 * safe_a)
                p = s + t[..., None] * d
                height_ok = jnp.abs(einsum("...i,i->...", p, axis)) <= cap_h
                ts.append((t, ok & (t >= 0.0) & (t <= 1.0) & height_ok))
            return ts

        def cap_root(pos):
            denom = einsum("...i,i->...", d, axis)
            s_h = einsum("...i,i->...", s, axis)
            safe = jnp.where(jnp.abs(denom) > 1e-10, denom, 1.0)
            t = (pos - s_h) / safe
            p = s + t[..., None] * d
            cr = jnp.cross(p, jnp.broadcast_to(axis, p.shape))
            r_sq = jnp.sum(cr * cr, axis=-1)
            ok = (
                (jnp.abs(denom) > 1e-10)
                & (t >= 0.0)
                & (t <= 1.0)
                & (r_sq <= self.outer_radius**2)
                & (r_sq >= self.inner_radius**2)
            )
            return t, ok

        roots = cylinder_roots(self.outer_radius) + cylinder_roots(self.inner_radius)
        roots.append(cap_root(cap_h))
        roots.append(cap_root(-cap_h))
        t = jnp.stack([r[0] for r in roots], axis=-1)
        valid = jnp.stack([r[1] for r in roots], axis=-1)
        return t, valid

    def segment_hit(self, cart_prev, cart_new):
        """(hit, t, point, uv) for [N] segments — first boundary crossing
        with t > MIN_INTERSECTION_T (volumetric_disc.rs:506-578)."""
        s = cart_prev[..., 1:4]
        e = cart_new[..., 1:4]
        d = e - s
        t_all, valid = self._candidate_ts(s, d)
        valid = valid & (t_all > MIN_INTERSECTION_T)
        t_masked = jnp.where(valid, t_all, jnp.inf)
        t = jnp.min(t_masked, axis=-1)
        hit = jnp.isfinite(t)
        t = jnp.where(hit, t, 0.0)
        point = s + t[..., None] * d
        u, v = self.uv(point)
        return hit, t, point, jnp.stack([u, v], axis=-1)

    # ------------------------------------------------------------------
    # Raymarch shading (volumetric_disc.rs:199-328)
    # ------------------------------------------------------------------

    def exit_distance(self, ro, rd):
        """Precomputed exit distance along rd from ro (fast path,
        volumetric_disc.rs:172-196); falls back to the full march length."""
        max_dist = self.step_size * self.max_steps
        t_all, valid = self._candidate_ts(ro, rd * max_dist)
        valid = valid & (t_all > MIN_INTERSECTION_T)
        t = jnp.min(jnp.where(valid, t_all, jnp.inf), axis=-1)
        return jnp.where(jnp.isfinite(t), t * max_dist, max_dist)

    def raymarch(self, geometry, ro, rd, obs_energy, p_t, p_phi, active):
        """Batched constant-step raymarch. ro/rd: [..., 3] (rd unit);
        conserved scalars broadcast to [...]. Returns XYZA [..., 4]."""
        dtype = ro.dtype
        d_s = self.step_size
        sigma = self.absorption + self.scattering
        shape = ro.shape[:-1]
        exit_d = jnp.where(active, self.exit_distance(ro, rd), 0.0)

        carry0 = dict(
            d_o=jnp.zeros(shape, dtype),
            transparency=jnp.ones(shape, dtype),
            accum=jnp.zeros(shape + (3,), dtype),
            alpha_w_sum=jnp.zeros(shape, dtype),
            alpha_w_tot=jnp.zeros(shape, dtype),
            done=~active,
            i=jnp.zeros((), jnp.int32),
        )

        def cond(c):
            return (~jnp.all(c["done"])) & (c["i"] < self.max_steps)

        def body(c):
            live = ~c["done"]
            p = ro + rd * c["d_o"][..., None]
            d_o = c["d_o"] + d_s
            density = jnp.where(live, self.density(p), 0.0)
            emitting = density > 0.0

            attenuation = jnp.exp(-d_s * density * sigma)
            transparency = jnp.where(live, c["transparency"] * attenuation, c["transparency"])

            # Transport-free per-sample redshift from the local circular
            # orbit; no timelike orbit -> attenuates but emits nothing.
            p4 = jnp.concatenate([jnp.zeros(shape + (1,), dtype), p], axis=-1)
            u_t, u_phi, orbit_ok = geometry.circular_orbit_killing_coefficients(
                p4, charts.CARTESIAN
            )
            emitter_energy = u_t * p_t + u_phi * p_phi
            live_emit = emitting & orbit_ok & (jnp.abs(emitter_energy) > 0.0)
            safe_e = jnp.where(live_emit, emitter_energy, 1.0)
            redshift = jnp.where(live_emit, obs_energy / safe_e, 1.0)

            cross = jnp.cross(p, jnp.broadcast_to(self.axis, p.shape))
            r_dist = jnp.sqrt(jnp.maximum(jnp.sum(cross * cross, axis=-1), 1e-30))
            temperature = self.temperature_model.at(r_dist)
            u, v = self.uv(p)
            light = self.texture.color_at_uv(u, v, temperature, redshift)

            # light_attenuation == attenuation (same expression); reuse it.
            t_ratio = temperature / self.brightness_reference_temperature
            t2 = t_ratio * t_ratio
            intensity = t2 * t2  # T⁴ without the transcendental pow
            weight = transparency * attenuation * self.scattering * density * d_s
            emit_mask = live_emit.astype(dtype)
            accum = c["accum"] + (weight * intensity * emit_mask)[..., None] * light[..., :3]

            alpha_w = jnp.where(live_emit, density * d_s, 0.0)
            alpha_w_sum = c["alpha_w_sum"] + jnp.clip(light[..., 3], 0.0, 1.0) * alpha_w
            alpha_w_tot = c["alpha_w_tot"] + alpha_w

            done = c["done"] | (d_o >= exit_d) | (transparency < SATURATION_EPS)
            return dict(
                d_o=jnp.where(live, d_o, c["d_o"]),
                transparency=transparency,
                accum=accum,
                alpha_w_sum=alpha_w_sum,
                alpha_w_tot=alpha_w_tot,
                done=done,
                i=c["i"] + 1,
            )

        if self.differentiable:
            # Reverse-differentiable march: while_loop has no reverse rule.
            # Outer scan over segments, each segment a jax.checkpoint'ed
            # inner scan of SEG steps (memory O(n_seg·carry + SEG·step
            # intermediates) instead of O(max_steps·...)), with a cond gate
            # skipping segments once every lane is done — the integrator's
            # cond-gated checkpointed early exit, applied to the raymarch.
            # The while cond's budget gate is replicated by freezing the
            # carry once i >= max_steps, so the forward is EXACT vs the
            # while_loop (dead lanes are no-ops in `body` by construction).
            import jax

            seg = min(256, self.max_steps)
            n_seg = -(-self.max_steps // seg)
            max_steps = self.max_steps

            def body_gated(c):
                c2 = body(c)
                keep = c["i"] < max_steps
                return jax.tree.map(
                    lambda old, new: jnp.where(keep, new, old), c, c2
                )

            def run(cc):
                def inner(c2, _):
                    return body_gated(c2), None

                c2, _ = lax.scan(inner, cc, None, length=seg)
                return c2

            def seg_step(c, _):
                c = lax.cond(
                    jnp.all(c["done"]), lambda cc: cc, jax.checkpoint(run), c
                )
                return c, None

            final, _ = lax.scan(seg_step, carry0, None, length=n_seg)
        else:
            final = lax.while_loop(cond, body, carry0)
        physical_opacity = 1.0 - final["transparency"]
        texture_alpha = jnp.where(
            final["alpha_w_tot"] > ALPHA_WT_MIN,
            final["alpha_w_sum"]
            / jnp.where(final["alpha_w_tot"] > ALPHA_WT_MIN, final["alpha_w_tot"], 1.0),
            1.0,
        )
        alpha = physical_opacity * texture_alpha
        return jnp.concatenate([final["accum"], alpha[..., None]], axis=-1)

    def shade_events(self, geometry, freq, res, idx):
        """Deferred shading hook (scene._shade_events): raymarch every event
        slot belonging to this object. Returns [N, K, 4]."""
        n, k = res.ev_kind.shape
        dtype = res.ev_data.dtype
        mask = res.ev_kind == idx

        point3 = res.ev_data[..., 0:3]
        seg_dir = res.ev_data[..., 9:12]
        norm = jnp.sqrt(jnp.maximum(jnp.sum(seg_dir * seg_dir, axis=-1), 1e-30))
        rd = seg_dir / norm[..., None]
        safe_ro = jnp.where(mask[..., None], point3, jnp.asarray([self.outer_radius * 4, 0.0, 0.0], dtype))
        obs_e = jnp.broadcast_to(freq.observer_energy[:, None], (n, k))
        p_t = jnp.broadcast_to(freq.p_t[:, None], (n, k))
        p_phi = jnp.broadcast_to(freq.p_phi[:, None], (n, k))
        return self.raymarch(geometry, safe_ro, rd, obs_e, p_t, p_phi, mask)

    # Marker used by scene._shade_events to dispatch to shade_events.
    @property
    def raymarch_object(self):
        return True


def build_volumetric_disc(obj: dict, geometry, texture, dtype, index: int = 0):
    """Config-driven construction with the reference's eager validation
    (cli/shared.rs:237-277)."""
    from gr_raytracer_tpu.config import ConfigError, _build_temperature_model

    def err(msg):
        raise ConfigError(f"objects[{index}].VolumetricDisc: {msg}")

    inner, outer = obj["inner_radius"], obj["outer_radius"]
    if not outer > inner:
        err(f"requires outer_radius > inner_radius (got outer={outer}, inner={inner})")
    if not obj["thickness"] > 0.0:
        err(f"requires thickness > 0 (got {obj['thickness']})")
    if not obj["max_steps"] > 0:
        err("requires max_steps > 0")
    if not obj["step_size"] > 0.0:
        err(f"requires step_size > 0 (got {obj['step_size']})")
    if not obj["brightness_reference_temperature"] > 0.0:
        err("requires brightness_reference_temperature > 0")
    if obj["absorption"] < 0.0:
        err("requires absorption >= 0")
    if obj["scattering"] < 0.0:
        err("requires scattering >= 0")

    return VolumetricDisc.create(
        inner_radius=inner,
        outer_radius=outer,
        temperature_model=_build_temperature_model(geometry, obj["temperature"], outer, dtype),
        texture=texture,
        axis=tuple(obj.get("axis") or (0.0, 0.0, 1.0)),
        num_octaves=obj["num_octaves"],
        perlin_seed=obj.get("perlin_seed") or 0,
        max_steps=obj["max_steps"],
        step_size=obj["step_size"],
        thickness=obj["thickness"],
        density_multiplier=obj["density_multiplier"],
        brightness_reference_temperature=obj["brightness_reference_temperature"],
        absorption=obj["absorption"],
        scattering=obj["scattering"],
        noise_scale=tuple(obj["noise_scale"]),
        noise_offset=obj["noise_offset"],
        dtype=dtype,
    )
