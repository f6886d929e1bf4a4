"""Scene: objects + camera + celestial sphere, and the per-ray shading fold.

The render path is: camera rays -> fused integrate+intersect (integrator.py)
-> deferred event shading -> ordered alpha fold over the terminal color.
Event *detection* happens inside the integration loop (cheap analytic hit
tests); event *shading* (redshift, temperature, texture sampling) is deferred
to one post-loop batched pass over the [N, K] event buffer — texture gathers
never run inside the hot loop.

Reference behavior: src/rendering/scene.rs (color_of_ray), with the
back-to-front blend over an opaque black base re-expressed as an equivalent
front-to-back premultiplied fold (exact because the base alpha is 1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax.numpy as jnp
from flax import struct

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.rendering import integrator as integ
from gr_raytracer_tpu.rendering.redshift import ray_frequency_data

# Ray classification (scene.rs:25-30).
ESCAPED = 0
CAPTURED = 1
HIT = 2

# Event payload layout: [point_cart(3) | p_interp(4) | uv(2) | seg_dir(3)].
EVENT_WIDTH = 12


@dataclass(frozen=True)
class AdaptiveSamplingConfig:
    """Adaptive supersampling knobs (reference: configuration.rs:21-58)."""

    enabled: bool = True
    samples_per_axis: int = 4
    luminance_contrast_threshold: float = 0.15
    opacity_contrast_threshold: float = 0.1
    minimum_luminance: Optional[float] = None
    object_hit_opacity_threshold: float = 0.5
    exclude_background_contrast: bool = True

    def validate(self):
        if self.samples_per_axis <= 0:
            raise ValueError("adaptive_sampling.samples_per_axis must be > 0")
        for name in (
            "luminance_contrast_threshold",
            "opacity_contrast_threshold",
            "object_hit_opacity_threshold",
        ):
            v = getattr(self, name)
            if not (0.0 <= v <= 1.0):
                raise ValueError(f"adaptive_sampling.{name} must be within [0, 1], got {v}")
        if self.minimum_luminance is not None and not self.minimum_luminance >= 0.0:
            raise ValueError("adaptive_sampling.minimum_luminance must be >= 0")


class Scene(struct.PyTreeNode):
    geometry: object
    camera: object
    objects: tuple  # tuple of object pytrees; () if empty
    celestial_map: object
    celestial_temperature: jnp.ndarray
    integration: integ.IntegrationConfig
    adaptive: AdaptiveSamplingConfig = struct.field(
        pytree_node=False, default=AdaptiveSamplingConfig()
    )
    # Debug flag (scene.rs:38,128-133): write ray-{row}-{col}.csv for every
    # traced pixel. Hard-coded false in the reference CLI; programmatic only.
    save_ray_data: bool = struct.field(pytree_node=False, default=False)


class RaySamples(NamedTuple):
    color: jnp.ndarray  # [N, 4] XYZA
    ray_class: jnp.ndarray  # [N] int32
    stop_code: jnp.ndarray  # [N]
    steps: jnp.ndarray  # [N]
    ev_overflow: jnp.ndarray  # [N] bool
    kk_drift: jnp.ndarray
    const_drift: jnp.ndarray


def _segment_fn(scene):
    """Build the in-loop nearest-hit segment test over all scene objects
    (reference: objects.rs:65-120 picks the nearest hit per step window)."""
    objects = scene.objects

    def fn(x_prev, cart_prev, p_prev, x_new, cart_new, p_new):
        n = x_prev.shape[0]
        dtype = x_prev.dtype
        best_hit = jnp.zeros((n,), bool)
        best_dist = jnp.full((n,), jnp.inf, dtype)
        best_kind = jnp.full((n,), -1, jnp.int32)
        best_t = jnp.zeros((n,), dtype)
        best_point = jnp.zeros((n, 3), dtype)
        best_uv = jnp.zeros((n, 2), dtype)
        start = cart_prev[..., 1:4]
        for idx, obj in enumerate(objects):
            hit, t, point, uv = obj.segment_hit(cart_prev, cart_new)
            # Squared distance: same nearest-hit ordering, no sqrt (whose VJP
            # is infinite at coincident points).
            dist = jnp.sum((point - start) ** 2, axis=-1)
            better = hit & (dist < best_dist)
            best_hit = best_hit | hit
            best_dist = jnp.where(better, dist, best_dist)
            best_kind = jnp.where(better, idx, best_kind)
            best_t = jnp.where(better, t, best_t)
            best_point = jnp.where(better[:, None], point, best_point)
            best_uv = jnp.where(better[:, None], uv, best_uv)

        # Momentum linearly interpolated between the segment ends in the
        # integrator's native components (objects.rs:13-44); the position is
        # the exact solved intersection point.
        p_interp = (1.0 - best_t)[:, None] * p_prev + best_t[:, None] * p_new
        seg_dir = cart_new[..., 1:4] - cart_prev[..., 1:4]
        data = jnp.concatenate([best_point, p_interp, best_uv, seg_dir], axis=-1)
        return best_hit, best_kind, data

    return fn


def _shade_events(scene, freq, res, include_volumetric=True):
    """Deferred shading of the [N, K] event buffer -> colors [N, K, 4],
    plus a per-ray shade-failure flag [N].

    A shade failure reproduces the reference's per-pixel error path: a thin
    disc sampled below r_isco with a Novikov-Thorne temperature model raises
    BelowRISCO (temperature.rs:204-217), which aborts color_of_ray — the
    pixel keeps its default sample and is excluded from supersample averages
    (raytracer.rs:355-380). Callers map the flag to the STEP_FAILED stop
    code, which fold_samples already renders as the default sample.

    With include_volumetric=False, volumetric slots are left at zero — the
    render driver raymarches them separately on a *compacted* lane set (most
    slots are empty; marching all N·K lanes would waste 10-100×) and
    composites with fold_samples."""
    geometry = scene.geometry
    chart = geometry.chart
    n, k = res.ev_kind.shape
    dtype = res.ev_data.dtype
    valid = res.ev_kind >= 0

    point3 = res.ev_data[..., 0:3]
    # Empty slots hold zeros — substitute a safe off-origin point so masked
    # lanes don't generate infs/NaNs (which would poison reverse-mode grads).
    safe_point3 = jnp.where(valid[..., None], point3, jnp.asarray([10.0, 0.0, 0.0], dtype))
    point_cart4 = jnp.concatenate([jnp.zeros((n, k, 1), dtype), safe_point3], axis=-1)
    pos_native = charts.from_cartesian(point_cart4, chart, geometry.spin)
    p_interp = res.ev_data[..., 3:7]
    uv = res.ev_data[..., 7:9]

    obs_e = freq.observer_energy[:, None]
    colors = jnp.zeros((n, k, 4), dtype)
    shade_fail = jnp.zeros((n,), bool)
    for idx, obj in enumerate(scene.objects):
        mask = res.ev_kind == idx
        if hasattr(obj, "raymarch"):  # volumetric: shaded by its own pass
            if not include_volumetric:
                continue
            c = obj.shade_events(scene.geometry, freq, res, idx)
        else:
            u_emit, ok = obj.emitter_velocity(geometry, pos_native)
            emitter_energy = geometry.inner_product(pos_native, u_emit, p_interp)
            # Empty slots carry zero momentum -> emitter_energy 0 -> redshift
            # inf; even masked out, an inf primal turns the z^e beaming VJP
            # into 0·inf = NaN. Double-where keeps masked lanes at z = 1.
            live = valid & ok & (jnp.abs(emitter_energy) > 0.0)
            safe_e = jnp.where(live, emitter_energy, 1.0)
            redshift = jnp.where(live, obs_e / safe_e, 1.0)
            temp = obj.temperature_at(geometry, point_cart4)
            c = obj.texture.color_at_uv(uv[..., 0], uv[..., 1], temp, redshift)
            if hasattr(obj, "temperature_fail"):
                ev_fail = obj.temperature_fail(geometry, point_cart4) & mask & valid
                shade_fail = shade_fail | jnp.any(ev_fail, axis=-1)
        colors = jnp.where(mask[..., None], c, colors)
    return jnp.where(valid[..., None], colors, jnp.zeros_like(colors)), shade_fail


def _celestial_color(scene, freq, solver, res):
    """Terminal color for escaped rays: equirectangular UV from the final
    position + redshifted celestial texture (scene.rs:164-176, 222-231)."""
    geometry = scene.geometry
    x_last = res.y[..., 0:4]
    finite_x = jnp.where(jnp.isfinite(x_last), x_last, 1.0)
    r, theta, phi = charts.get_as_spherical(finite_x, geometry.chart)
    u = 1.0 - (jnp.pi + phi) / (2.0 * jnp.pi)
    v = theta / jnp.pi

    # Sanitize the whole state before raising the index: a NaN lane zeroed
    # elementwise would put its position at the origin, where the Kerr-Schild
    # k-vector is 0/0. Park bad lanes at a safe far-field state — and park
    # every NON-ESCAPED lane there too: only escaped lanes ever read this
    # color, but a captured lane's final state can sit near the ring
    # singularity (r → 0 inside the horizon, where KS ginv → inf − inf);
    # its masked-out NaN/inf then leaks into ∂/∂a as 0·NaN through the
    # where-chain (the 256² joint-fit knife edge). Masking the INPUT keeps
    # both the value and every parameter cotangent finite.
    escaped_m = res.stop_code == integ.CELESTIAL
    state_ok = jnp.all(jnp.isfinite(res.y), axis=-1, keepdims=True) & escaped_m[:, None]
    # Chart-aware safe park: r = 100 equatorial for spherical-type charts
    # (θ = 0 — the zeros default — is the POLE, where the BL momentum's
    # 1/sin²θ is the same masked-NaN leak this substitution exists to
    # prevent); x = 100 for Cartesian.
    safe_state = jnp.zeros_like(res.y).at[..., 1].set(100.0)
    if geometry.chart != charts.CARTESIAN:
        safe_state = safe_state.at[..., 2].set(jnp.pi / 2).at[..., 5].set(0.0)
    y_safe = jnp.where(state_ok, res.y, safe_state)
    p_last = solver.momentum(y_safe)
    p_last = jnp.where(jnp.isfinite(p_last), p_last, 0.0)
    # Captured/horizon lanes end where no stationary observer exists
    # (1 − f < 0 inside the ergosphere): the sqrt VJP is NaN there even under
    # a mask. Evaluate the emitter frame at a safe far-field point for every
    # lane that doesn't use this color.
    escaped = res.stop_code == integ.CELESTIAL
    safe_far = jnp.zeros_like(finite_x).at[..., 1].set(100.0)
    x_emit = jnp.where(escaped[:, None], finite_x, safe_far)
    u_stat = geometry.stationary_velocity(x_emit)
    emitter_energy = geometry.inner_product(x_emit, u_stat, p_last)
    # Only escaped rays use this color; captured/NaN lanes can have a zero or
    # garbage emitter energy whose inf redshift would NaN the beaming VJP
    # even under the select mask (0·inf) — pin them to z = 1.
    live = escaped & jnp.isfinite(emitter_energy) & (jnp.abs(emitter_energy) > 0.0)
    safe_e = jnp.where(live, emitter_energy, 1.0)
    redshift = jnp.where(live, freq.observer_energy / safe_e, 1.0)
    return scene.celestial_map.color_at_uv(u, v, scene.celestial_temperature, redshift)


def fold_samples(scene, ev_kind, ev_colors, stop_code, celestial):
    """Ordered alpha fold of shaded events over the terminal color.

    Front-to-back premultiplied fold — exact vs the reference's back-to-front
    blend over opaque black (scene.rs:206-214). Pure jnp; callable under jit
    or on host arrays. Returns (color [N, 4], ray_class [N])."""
    n, k = ev_kind.shape
    dtype = ev_colors.dtype
    premul = jnp.zeros((n, 3), dtype)
    trans = jnp.ones((n,), dtype)
    obj_opacity = jnp.zeros((n,), dtype)
    for j in range(k):
        valid = ev_kind[:, j] >= 0
        a = jnp.clip(ev_colors[:, j, 3], 0.0, 1.0) * valid
        premul = premul + (trans * a)[:, None] * ev_colors[:, j, :3]
        trans = trans * (1.0 - a)
        obj_opacity = a + obj_opacity * (1.0 - a)

    # Terminal layer: celestial texture for escaped rays; opaque black for
    # horizon/trapped/NaN/budget (identical to the black base they'd fall
    # through to, so folding it unconditionally is exact).
    escaped = stop_code == integ.CELESTIAL
    term = jnp.where(escaped[:, None], celestial, jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype))
    a_t = jnp.clip(term[:, 3], 0.0, 1.0)
    premul = premul + (trans * a_t)[:, None] * term[:, :3]

    color = jnp.concatenate([premul, jnp.ones((n, 1), dtype)], axis=-1)

    ray_class = jnp.where(escaped, ESCAPED, CAPTURED)
    ray_class = jnp.where(
        obj_opacity >= scene.adaptive.object_hit_opacity_threshold, HIT, ray_class
    )

    # Controller failure -> the buffer-default sample (black, Escaped),
    # discarding any accumulated events (raytracer.rs:232-239).
    failed = stop_code == integ.STEP_FAILED
    color = jnp.where(failed[:, None], jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype), color)
    ray_class = jnp.where(failed, ESCAPED, ray_class)
    return color, ray_class.astype(jnp.int32)


class GeoTrace(NamedTuple):
    """Output of the geometric pass (integration + surface shading), with
    everything the driver needs to raymarch volumetric events separately."""

    surface_colors: jnp.ndarray  # [N, K, 4], volumetric slots zero
    celestial: jnp.ndarray  # [N, 4]
    ev_kind: jnp.ndarray  # [N, K]
    ev_data: jnp.ndarray  # [N, K, D]
    stop_code: jnp.ndarray  # [N]
    observer_energy: jnp.ndarray  # [N]
    p_t: jnp.ndarray  # [N]
    p_phi: jnp.ndarray  # [N]
    ev_overflow: jnp.ndarray  # [N] bool — events dropped (buffer full)


def trace_geometric(scene, positions, momenta) -> GeoTrace:
    """Integration + event detection + surface/celestial shading, WITHOUT
    volumetric raymarching (driver split path; see raytracer.py)."""
    geometry = scene.geometry
    solver = geometry.make_solver(positions, momenta)
    y0 = solver.initial_state(positions, momenta)
    freq = ray_frequency_data(geometry, positions, momenta, scene.camera.velocity)
    res = integ.integrate_rays(
        geometry, solver, scene.integration, y0, _segment_fn(scene), EVENT_WIDTH
    )
    colors, shade_fail = _shade_events(scene, freq, res, include_volumetric=False)
    stop = jnp.where(shade_fail, integ.STEP_FAILED, res.stop_code)
    celestial = _celestial_color(scene, freq, solver, res)
    return GeoTrace(
        surface_colors=colors,
        celestial=celestial,
        ev_kind=res.ev_kind,
        ev_data=res.ev_data,
        stop_code=stop,
        observer_energy=freq.observer_energy,
        p_t=freq.p_t,
        p_phi=freq.p_phi,
        ev_overflow=res.ev_overflow,
    )


def trace_rays(scene, positions, momenta):
    """Color a batch of camera rays. positions/momenta: [N, 4] native chart.

    Returns RaySamples. The output color alpha is 1 (everything composites
    over an opaque black base, scene.rs:206-209). Volumetric objects are
    shaded inline over the full event buffer — fine for tests and small
    batches; the render driver uses the compacted split path instead.
    """
    geometry = scene.geometry
    solver = geometry.make_solver(positions, momenta)
    y0 = solver.initial_state(positions, momenta)
    freq = ray_frequency_data(geometry, positions, momenta, scene.camera.velocity)

    res = integ.integrate_rays(
        geometry,
        solver,
        scene.integration,
        y0,
        _segment_fn(scene),
        EVENT_WIDTH,
    )

    colors, shade_fail = _shade_events(scene, freq, res)  # [N, K, 4], [N]
    stop = jnp.where(shade_fail, integ.STEP_FAILED, res.stop_code)
    celestial = _celestial_color(scene, freq, solver, res)  # [N, 4]
    color, ray_class = fold_samples(scene, res.ev_kind, colors, stop, celestial)

    return RaySamples(
        color=color,
        ray_class=ray_class,
        stop_code=stop,
        steps=res.steps,
        ev_overflow=res.ev_overflow,
        kk_drift=res.kk_drift,
        const_drift=res.const_drift,
    )
