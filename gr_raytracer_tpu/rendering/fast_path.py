"""Pallas fast path: full-scene tracing via the fixed-step RK4 kernel.

Applies when the scene is Kerr (Kerr-Schild Cartesian) with only equatorial
thin discs — the headline benchmark shape. Integration + disc-crossing
detection run in the VMEM-resident kernel (ops/geodesic_pallas.py); shading
and the alpha fold are the exact same deferred passes as the lax path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from gr_raytracer_tpu.geometry.kerr import Kerr
from gr_raytracer_tpu.geometry.kerr_bl import KerrBL
from gr_raytracer_tpu.geometry.schwarzschild import Schwarzschild
from gr_raytracer_tpu.objects.disc import Disc
from gr_raytracer_tpu.objects.sphere import Sphere
from gr_raytracer_tpu.objects.volumetric_disc import VolumetricDisc
from gr_raytracer_tpu.ops import geodesic_pallas as gp
from gr_raytracer_tpu.rendering import integrator as integ
from gr_raytracer_tpu.rendering import scene as scn
from gr_raytracer_tpu.rendering.redshift import ray_frequency_data
from gr_raytracer_tpu.precision import einsum


def _vol_axis_is_z(o) -> bool:
    return bool(np.allclose(np.asarray(o.axis), [0.0, 0.0, 1.0]))


def supports_scene(scene) -> bool:
    """Kerr -> KS kernel; KerrBL / Schwarzschild -> Mino kernel
    (Schwarzschild rides the a = 0 BL chart, which coincides with its
    spherical chart). Both kernels record disc crossings, sphere crossings,
    and z-axis volumetric BOUNDING-VOLUME crossings (the BL kernel via a
    per-step KS Cartesian embedding of the segment); the volumetric
    raymarch itself runs in the driver's compacted split pass."""
    supported = lambda o: isinstance(o, (Disc, Sphere)) or (
        isinstance(o, VolumetricDisc) and _vol_axis_is_z(o)
    )
    if isinstance(scene.geometry, (Kerr, KerrBL, Schwarzschild)):
        return all(supported(o) for o in scene.objects)
    return False


def _impact_proxy(geometry, x, p):
    """(E, |L|) per ray for the cost sort. KerrBL: √(L_z² + Q); KS Cartesian:
    |r × p| with E from the covariant p_t."""
    if isinstance(geometry, KerrBL):
        e, l_z, q = geometry.conserved_from_bl(x, p)
        return e, jnp.sqrt(jnp.maximum(l_z * l_z + q, 0.0))
    g = geometry.metric(x)
    p_cov = einsum("...ij,...j->...i", g, p)
    e = -p_cov[..., 0]
    l = jnp.cross(x[..., 1:4], p[..., 1:4])
    return e, jnp.sqrt(jnp.sum(l * l, axis=-1))


def _texture_is_opaque(texture) -> bool:
    """Statically true when every color the texture can emit has alpha 1.
    Beaming multiplies XYZ only (color.apply_beaming), never alpha."""
    import numpy as np

    from gr_raytracer_tpu.rendering import texture as tex

    if isinstance(texture, tex.BlackBodyMap):
        return True  # sample() appends alpha = 1 unconditionally
    if isinstance(texture, tex.CheckerMap):
        return float(texture.c1[3]) == 1.0 and float(texture.c2[3]) == 1.0
    if isinstance(texture, tex.BitmapMap):
        return float(np.asarray(texture.image[..., 3]).min()) == 1.0
    return False


from typing import NamedTuple


class KernelSpec(NamedTuple):
    """Static kernel configuration extracted from a CONCRETE scene (fails on
    tracers): object specs, the far-field safe radius, and whether every
    object is opaque (first hit saturates the alpha fold). A NamedTuple of
    NamedTuples/floats — hashable by value, so it can be a jit static arg."""

    discs: tuple
    spheres: tuple
    vols: tuple
    r_safe: float
    opaque: bool


def scene_kernel_spec(scene) -> KernelSpec:
    import os

    discs, spheres, vols = [], [], []
    extent = 0.0
    for idx, o in enumerate(scene.objects):
        if isinstance(o, Disc):
            discs.append(gp.DiscSpec(float(o.inner_radius), float(o.outer_radius), idx))
            extent = max(extent, float(o.outer_radius))
        elif isinstance(o, VolumetricDisc):
            vols.append(
                gp.VolSpec(
                    float(o.inner_radius),
                    float(o.outer_radius),
                    float(o.thickness) * 3.0,  # CAP_HEIGHT_SIGMAS
                    idx,
                )
            )
            extent = max(extent, float(o.outer_radius))
        elif isinstance(o, Sphere):
            spheres.append(
                gp.SphereSpec(
                    float(o.radius),
                    float(o.center[1]),
                    float(o.center[2]),
                    float(o.center[3]),
                    idx,
                )
            )
            c = o.center
            extent = max(
                extent,
                float(jnp.sqrt(c[1] ** 2 + c[2] ** 2 + c[3] ** 2)) + float(o.radius),
            )
    # Far-field acceleration is always safe to enable: 2× the outermost
    # object extent (no event can occur beyond it), floored at 10×M so the
    # strong-field region (trapped-orbit factor 5·r_s) keeps the exact H_MAX
    # cadence even in object-free scenes.
    r_safe = 2.0 * max(extent, 5.0 * float(scene.geometry.radius))
    # A volumetric fold has alpha < 1 regardless of its texture (Beer-Lambert
    # transparency), so any volumetric object disables the opaque-stop lever.
    opaque = bool(scene.objects) and all(
        (not isinstance(o, VolumetricDisc)) and _texture_is_opaque(o.texture)
        for o in scene.objects
    )
    if os.environ.get("GR_OPAQUE_STOP", "1") == "0":
        opaque = False
    if os.environ.get("GR_FAR_FIELD", "1") == "0":
        r_safe = 0.0
    return KernelSpec(tuple(discs), tuple(spheres), tuple(vols), r_safe, opaque)


def make_fast_tracer(concrete_scene, mesh=None):
    """jitted (scene, row_f, col_f) -> (color, ray_class, stop, overflow)
    with the disc bounds baked static from the concrete scene (kernel
    requirement); the rest of the scene stays traced so parameter sweeps
    reuse the compile.

    With `mesh`, the tracer is shard_map-ed over the 1-D ray mesh — rays are
    independent, so each device marches its shard through the same kernel
    with zero collectives (pallas_call has no GSPMD partitioning rule, so
    sharding must be explicit). row/col batches must divide by the mesh."""
    import jax

    from gr_raytracer_tpu.rendering import camera as cam

    if not supports_scene(concrete_scene):
        raise ValueError("scene shape unsupported by the pallas fast path")
    spec = scene_kernel_spec(concrete_scene)

    from gr_raytracer_tpu.rendering.raytracer import _wire

    def body(scene, row_f, col_f):
        x, p = cam.pixel_rays(scene.camera, row_f, col_f)
        s = trace_rays_fast(scene, x, p, spec=spec)
        return _wire(s.color, s.ray_class, s.stop_code, s.ev_overflow)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from gr_raytracer_tpu.parallel import mesh as pmesh

        axis = mesh.axis_names[0]
        scene_specs = jax.tree.map(lambda _: P(), concrete_scene)
        body = pmesh.shard_map(
            body,
            mesh=mesh,
            in_specs=(scene_specs, P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis)),
        )

    return jax.jit(body)


def _march_geometry_of(scene):
    geometry = scene.geometry
    if isinstance(geometry, Schwarzschild):
        # The spherical chart IS the a = 0 BL chart: positions/momenta carry
        # over verbatim and the Mino-time kernel integrates the same
        # geodesics. Shading still uses the original scene geometry.
        return KerrBL(
            radius=geometry.radius,
            a=jnp.zeros_like(geometry.radius),
            horizon_epsilon=geometry.horizon_epsilon,
        )
    return geometry


def _prepare_march(scene, positions, momenta):
    """Pad to the lane tile, cost-sort, build solver/initial state/frequency
    data. Everything returned is in SORTED/PADDED lane order; callers unsort
    with [inverse][:n]."""
    march_geometry = _march_geometry_of(scene)

    n = positions.shape[0]
    pad = (-n) % gp.LANE_TILE
    if pad:
        positions = jnp.concatenate([positions, jnp.broadcast_to(positions[:1], (pad, 4))])
        momenta = jnp.concatenate([momenta, jnp.broadcast_to(momenta[:1], (pad, 4))])

    # Cost-sort: each kernel block marches until its SLOWEST lane stops, and
    # the slow lanes (photon-ring grazers, b ≈ b_crit ≈ 3√3 M) lie on a thin
    # ring through the image — row-major order sprinkles one into almost
    # every block. Sorting lanes by |b − b_crit| concentrates them into few
    # blocks; everything is unsorted again on output.
    e_g, lz_tot = _impact_proxy(march_geometry, positions, momenta)
    b = jnp.abs(lz_tot) / jnp.maximum(jnp.abs(e_g), 1e-12)
    b_crit = 2.598 * march_geometry.radius  # 3√3 M, Schwarzschild value as proxy
    order = jnp.argsort(jnp.abs(b - b_crit))
    inverse = jnp.argsort(order)
    positions = positions[order]
    momenta = momenta[order]

    solver = march_geometry.make_solver(positions, momenta)
    y0 = solver.initial_state(positions, momenta)
    # Shading scalars use the SCENE geometry (its signature convention):
    # every redshift is a same-metric energy ratio, so the overall metric
    # sign between (+,−,−,−) Schwarzschild and (−,+,+,+) BL cancels.
    freq = ray_frequency_data(scene.geometry, positions, momenta, scene.camera.velocity)
    return march_geometry, solver, y0, freq, inverse


# Deep budgets get compensated (Kahan) state accumulation: the r3 accuracy
# run showed escaped-lane L_z/Q drift above the reference's 1e-4 warn bar at
# the 1e6-step hero budget, dominated by the y += delta summation random
# walk (docs/fastpath_accuracy_tpu.md). At ≥ this budget the ~3% step cost
# is noise next to the march; below it the drift never approaches the bar.
# (GR_COMPENSATED=0/1 forces either mode. A checkpoint/resume march resets
# the compensation term at the leg boundary — one extra ulp of summation
# error per leg, far below the drift this removes; the bit-identical
# two-leg resume tests run below this threshold, where compensation is off.)
DEEP_BUDGET_COMPENSATION = 100_000


def _run_kernel(
    march_geometry,
    cfg,
    solver,
    y0,
    spec,
    interpret=False,
    attempts=None,
    resume=None,
    finalize=True,
):
    """Dispatch the KS or BL/Mino kernel; returns the raw 7-tuple state
    (y, stop, steps, ev_kind, ev_data, ev_count, ev_overflow) in lane order.

    Step caps are set by the reference's H_MAX = 1.0 rationale, NOT the
    scene step_size: step_size is only RKF45's initial h, and the adaptive
    controller grows to H_MAX in the far field anyway. The kernels' near-
    horizon shrink governs accuracy; h0 = H_MAX quarters the step count at
    unchanged stop/color parity (see docs/fastpath_accuracy.md h0 sweep:
    0.993 agreement, identical color error at h0 = 1.0 vs 0.25)."""
    import os

    comp_env = os.environ.get("GR_COMPENSATED")
    compensated = (
        comp_env == "1"
        if comp_env in ("0", "1")
        else cfg.max_steps >= DEEP_BUDGET_COMPENSATION
    )
    if isinstance(march_geometry, KerrBL):
        # Mino-time: far-field spatial step ≈ h0·r_ref² = 1.0 at h0 = 0.01.
        # Budget 2×: the fixed Mino step is finer than RKF45's accepted
        # steps near the hole, so the same step COUNT under-budgets the
        # kernel — near-critical rays would misclassify as TRAPPED where
        # the lax path resolves HORIZON/CELESTIAL (measured: 2× restores
        # 100% stop agreement on the 16×32 probe, docs/fastpath_accuracy.md;
        # only never-stopping lanes ever consume the extra budget).
        return gp.kerr_bl_rk4_march(
            march_geometry.radius,
            march_geometry.a,
            march_geometry.horizon_epsilon,
            y0,
            solver.e,
            solver.l_z,
            solver.q,
            h0=0.01,
            max_steps=2 * cfg.max_steps,
            max_radius=cfg.max_radius,
            discs=spec.discs,
            spheres=spec.spheres,
            vols=spec.vols,
            opaque_stop=spec.opaque,
            interpret=interpret,
            attempts=attempts,
            resume=resume,
            finalize=finalize,
            compensated=compensated,
        )
    return gp.kerr_rk4_march(
        march_geometry.radius,
        march_geometry.a,
        march_geometry.horizon_epsilon,
        y0,
        h0=1.0,
        max_steps=cfg.max_steps,
        max_radius=cfg.max_radius,
        discs=spec.discs,
        spheres=spec.spheres,
        vols=spec.vols,
        r_safe=spec.r_safe,
        opaque_stop=spec.opaque,
        interpret=interpret,
        attempts=attempts,
        resume=resume,
        finalize=finalize,
        compensated=compensated,
    )


def _state_to_result(state):
    y_f, stop, steps, ev_kind, ev_data, ev_count, ev_overflow = state
    return integ.IntegrationResult(
        y=y_f,
        affine=jnp.zeros((y_f.shape[0],), y_f.dtype),
        steps=steps,
        stop_code=stop,
        ev_kind=ev_kind,
        ev_data=ev_data,
        ev_count=ev_count,
        ev_overflow=ev_overflow,
        kk_drift=jnp.zeros((y_f.shape[0],), y_f.dtype),
        const_drift=jnp.zeros((y_f.shape[0], 0), y_f.dtype),
        h=jnp.zeros((y_f.shape[0],), y_f.dtype),
        retries=jnp.zeros((y_f.shape[0],), jnp.int32),
    )


def _march_scene(scene, positions, momenta, interpret: bool = False, spec=None):
    """Shared single-shot kernel march: cost-sort, pad, march, wrap as
    IntegrationResult. Returns (res, freq, solver, inverse_order, n)."""
    # With a precomputed spec the support check already ran on the concrete
    # scene (make_fast_tracer / make_fast_geo_tracer); re-checking here would
    # read concrete object fields (volumetric axis) off a traced scene.
    if spec is None and not supports_scene(scene):
        raise ValueError(
            "pallas fast path supports Kerr/KerrBL/Schwarzschild with "
            "discs/spheres (+ z-axis volumetrics on Kerr) only"
        )
    if spec is None:
        spec = scene_kernel_spec(scene)
    n = positions.shape[0]
    march_geometry, solver, y0, freq, inverse = _prepare_march(scene, positions, momenta)
    state = _run_kernel(
        march_geometry, scene.integration, solver, y0, spec, interpret=interpret
    )
    return _state_to_result(state), freq, solver, inverse, n


def _finish_samples(scene, res, freq, solver, inverse, n, first_event_only=False):
    """Shade + fold a marched IntegrationResult into RaySamples (unsorted).

    first_event_only (set when every object texture is statically opaque,
    spec.opaque): the first recorded event saturates the alpha fold, so
    slots 1..K-1 are invisible by construction — shading them is pure waste
    (the [N, K] LUT/texture gathers cost ~4x the march itself on the
    flagship bench, scripts/bench_decomp.py). Exact by the same argument as
    the kernel's opaque-stop lever."""
    if first_event_only:
        res = res._replace(ev_kind=res.ev_kind[:, :1], ev_data=res.ev_data[:, :1, :])
    colors, shade_fail = scn._shade_events(scene, freq, res)
    stop_shaded = jnp.where(shade_fail, integ.STEP_FAILED, res.stop_code)
    celestial = scn._celestial_color(scene, freq, solver, res)
    color, ray_class = scn.fold_samples(scene, res.ev_kind, colors, stop_shaded, celestial)
    # Undo the cost sort before slicing off the padding.
    return scn.RaySamples(
        color=color[inverse][:n],
        ray_class=ray_class[inverse][:n],
        stop_code=stop_shaded[inverse][:n],
        steps=res.steps[inverse][:n],
        ev_overflow=res.ev_overflow[inverse][:n],
        kk_drift=res.kk_drift[inverse][:n],
        const_drift=res.const_drift[inverse][:n],
    )


def _finish_geo(scene, res, freq, solver, inverse, n):
    """Shade (sans volumetric raymarch) into a GeoTrace (unsorted)."""
    colors, shade_fail = scn._shade_events(scene, freq, res, include_volumetric=False)
    stop_shaded = jnp.where(shade_fail, integ.STEP_FAILED, res.stop_code)
    celestial = scn._celestial_color(scene, freq, solver, res)
    unsort = lambda a: a[inverse][:n]
    return scn.GeoTrace(
        surface_colors=unsort(colors),
        celestial=unsort(celestial),
        ev_kind=unsort(res.ev_kind),
        ev_data=unsort(res.ev_data),
        stop_code=unsort(stop_shaded),
        observer_energy=unsort(freq.observer_energy),
        p_t=unsort(freq.p_t),
        p_phi=unsort(freq.p_phi),
        ev_overflow=unsort(res.ev_overflow),
    )


def trace_rays_fast(scene, positions, momenta, interpret: bool = False, spec=None):
    """Drop-in for scene.trace_rays on supported scenes (see supports_scene).

    N is padded to the kernel lane tile; fixed-step RK4 with radius-scaled h.

    The kernel configuration (disc bounds, far-field radius, opacity) must be
    STATIC; when called with a traced scene (under jit), precompute it from
    the concrete scene and pass `spec` (see make_fast_tracer)."""
    if spec is None and supports_scene(scene):
        spec = scene_kernel_spec(scene)
    res, freq, solver, inverse, n = _march_scene(scene, positions, momenta, interpret, spec)
    return _finish_samples(
        scene, res, freq, solver, inverse, n, first_event_only=bool(spec and spec.opaque)
    )


def supports_diff(scene) -> bool:
    """Kernel-VJP coverage (ops/geodesic_adjoint.py): every texture
    statically opaque (slot-0 shading is then exact, so the adjoint
    injects exactly one payload cotangent per lane at its stop step), and
      * Kerr (KS chart): thin discs AND spheres (the KS adjoint computes
        both payloads, per-lane kind-selected), or
      * KerrBL / Schwarzschild (served by the BL/Mino kernel,
        _march_geometry_of): thin discs only — the BL adjoint has no
        sphere payload yet.
    Everything else keeps the lax `differentiable=True` path."""
    from gr_raytracer_tpu.geometry.kerr import Kerr

    if not scene.objects or not scene_kernel_spec(scene).opaque:
        return False
    if isinstance(scene.geometry, Kerr):
        return all(isinstance(o, (Disc, Sphere)) for o in scene.objects)
    if isinstance(scene.geometry, (KerrBL, Schwarzschild)):
        return all(isinstance(o, Disc) for o in scene.objects)
    return False


def trace_rays_fast_diff(
    scene, positions, momenta, interpret: bool = False, spec=None, k_ckpt=None
):
    """Differentiable drop-in for trace_rays on supports_diff scenes: the
    forward is the production KS Pallas march (+ checkpoints), the backward
    an in-kernel checkpointed reverse sweep — reverse mode at kernel speed
    instead of the ~35× lax-scan penalty (r3 verdict item 1).

    Gradients flow through the final state (celestial shading) and the
    slot-0 event payload (disc shading: hit point, interpolated momentum,
    UV); ∂/∂radius and ∂/∂a additionally flow through every step of the
    march. Discrete decisions (stop codes, which step crossed, the cost
    sort) are locally constant — the same convention as the lax path's
    where-masks. The kernel's disc bounds are static (baked from the
    concrete scene), so UV cotangents use frozen bounds — irrelevant for
    blackbody discs (their texture ignores UV; temperature gradients flow
    through the hit POINT, which is fully differentiated)."""
    from gr_raytracer_tpu.ops import geodesic_adjoint as gadj

    if spec is None:
        if not supports_diff(scene):
            raise ValueError("scene shape unsupported by the kernel-VJP path")
        spec = scene_kernel_spec(scene)
    n = positions.shape[0]
    march_geometry, solver, y0, freq, inverse = _prepare_march(scene, positions, momenta)
    cfg = scene.integration
    if isinstance(march_geometry, KerrBL):
        # Mino-time diff march (same h0/budget rule as _run_kernel's BL
        # branch); the per-lane conserved scalars are differentiable inputs
        # — their cotangents flow back into the camera/geometry through the
        # solver construction (kerr_bl.make_solver is plain jnp).
        march = gadj.make_bl_march_diff(
            h0=0.01,
            max_steps=2 * cfg.max_steps,
            discs=spec.discs,
            interpret=interpret,
            **({"k_ckpt": k_ckpt} if k_ckpt else {}),
        )
        y_f, ev_data, stop, steps, ev_kind, ev_count, ev_ovf = march(
            march_geometry.radius,
            march_geometry.a,
            march_geometry.horizon_epsilon,
            cfg.max_radius,
            solver.e,
            solver.l_z,
            solver.q,
            y0,
        )
    else:
        march = gadj.make_ks_march_diff(
            h0=1.0,
            max_steps=cfg.max_steps,
            discs=spec.discs,
            spheres=spec.spheres,
            r_safe=spec.r_safe,
            interpret=interpret,
            **({"k_ckpt": k_ckpt} if k_ckpt else {}),
        )
        y_f, ev_data, stop, steps, ev_kind, ev_count, ev_ovf = march(
            march_geometry.radius,
            march_geometry.a,
            march_geometry.horizon_epsilon,
            cfg.max_radius,
            y0,
        )
    res = _state_to_result((y_f, stop, steps, ev_kind, ev_data, ev_count, ev_ovf))
    return _finish_samples(scene, res, freq, solver, inverse, n, first_event_only=True)


def trace_geometric_fast(scene, positions, momenta, interpret: bool = False, spec=None):
    """Kernel-backed scene.trace_geometric: integration + event detection +
    surface/celestial shading WITHOUT volumetric raymarching. The driver's
    split path raymarches the (compacted) volumetric event lanes and folds,
    exactly as for the lax geometric pass (raytracer._trace_chunk_split)."""
    res, freq, solver, inverse, n = _march_scene(scene, positions, momenta, interpret, spec)
    return _finish_geo(scene, res, freq, solver, inverse, n)


# ---------------------------------------------------------------------------
# Kernel-level phased requeue: measured and removed (r2 verdict item 8)
# ---------------------------------------------------------------------------
#
# Rounds 1-2 carried a phased march (bounded-attempt kernel dispatches with
# host-side compaction of still-RUNNING lanes into dense power-of-two
# buckets, resumed via the kernels' resume inputs). Measured on chip in the
# regime it was built for (scripts/march_probe.py --tracer driver
# --no-objects --max-steps 1000000, 63k hero-camera lanes), it LOSES in
# every configuration: 0.087 s phased vs 0.063 s single-dispatch with
# far-field acceleration on, 0.593 s vs 0.465 s with it off (the genuinely
# divergent regime) — and the ~20 ms/phase delta is the tunnel round-trip,
# i.e. even at zero host latency it is at best parity. The impact-parameter
# cost sort already groups slow lanes into few blocks and every block exits
# as soon as its lanes stop, so within-block compaction has nothing left to
# recover. The orchestration layer is deleted; the kernels keep their
# attempts/resume/finalize inputs (tests/test_pallas.py exercises two-leg
# resume == single shot) — the march checkpointing primitive stands on its
# own for preemption-tolerant deep-budget renders.


def make_fast_geo_compact_tracer(
    concrete_scene, obj_index: int, bucket: int, interpret: bool = False
):
    """jitted (scene, row_f, col_f) -> compact volumetric-event wire.

    The plain geometric pass ships the full GeoTrace over the tunnel —
    ev_data [N, K, 12] + surface_colors [N, K, 4] + 5 per-ray scalars,
    ~35 MB per 65k-ray chunk — of which a volumetric-only scene reads just
    the (sparse) event lanes. On the tunneled chip that transfer, not the
    march, dominated the hero #5 geometric pass (kernel compute for a 66k
    sub-ray chunk is ~5 ms at the ALU ceiling vs ~1 s wall). This variant
    compacts ON DEVICE: a stable argsort over the event mask gathers the
    ≤bucket volumetric event slots to the front, packs exactly what the
    raymarch batches need per lane (ro3 | rd3 | obs_e | p_t | p_phi |
    exit_d — exit_distance is fused here too, saving its own dispatch),
    and ships [bucket, 10] + int8 kinds/stops + the [N, 4] celestial:
    ~4.6 MB. `count` > bucket means the chunk overflowed the compact wire
    (caller falls back to the full-GeoTrace path)."""
    import jax

    from gr_raytracer_tpu.rendering import camera as cam

    if not supports_scene(concrete_scene):
        raise ValueError("scene shape unsupported by the pallas fast path")
    spec = scene_kernel_spec(concrete_scene)

    def body(scene, row_f, col_f):
        x, p = cam.pixel_rays(scene.camera, row_f, col_f)
        g = trace_geometric_fast(scene, x, p, interpret=interpret, spec=spec)
        k_slots = g.ev_kind.shape[1]
        flatm = (g.ev_kind == obj_index).reshape(-1)
        order = jnp.argsort(~flatm, stable=True)[:bucket].astype(jnp.int32)
        ev = g.ev_data.reshape(-1, g.ev_data.shape[-1])[order]
        ray = order // k_slots
        ro = ev[:, 0:3]
        seg = ev[:, 9:12]
        norm = jnp.maximum(
            jnp.sqrt(jnp.sum(seg * seg, axis=-1, keepdims=True)), 1e-30
        )
        rd = seg / norm
        ed = scene.objects[obj_index].exit_distance(ro, rd)
        packed = jnp.concatenate(
            [
                ro,
                rd,
                g.observer_energy[ray][:, None],
                g.p_t[ray][:, None],
                g.p_phi[ray][:, None],
                ed[:, None],
            ],
            axis=1,
        )
        count = flatm.sum().astype(jnp.int32)
        return (
            g.celestial,
            g.ev_kind.astype(jnp.int8),
            g.stop_code.astype(jnp.int8),
            g.ev_overflow,
            packed,
            order,
            count,
        )

    return jax.jit(body)


def supports_vol_diff(scene) -> bool:
    """Kernel-VJP coverage of the volumetric raymarch
    (ops/volumetric_adjoint.py): the compact-wire scene shape — one z-axis
    VolumetricDisc on a Kerr/KerrBL/Schwarzschild geometry with a
    kernel-supported texture/temperature. Gradients flow to the 5 medium
    parameters and to the per-lane ray inputs; the geodesic pass is treated
    as locally constant (the bounding-volume crossing is parameter-
    independent)."""
    from gr_raytracer_tpu.ops import volumetric_pallas as vp

    return (
        isinstance(scene.geometry, (Kerr, KerrBL, Schwarzschild))
        and len(scene.objects) == 1
        and isinstance(scene.objects[0], VolumetricDisc)
        and _vol_axis_is_z(scene.objects[0])
        and vp.supports(scene.objects[0], scene.geometry)
    )


def make_fast_vol_diff_tracer(concrete_scene, bucket: int, interpret: bool = False):
    """jitted (med5, scene, row_f, col_f) -> (color [N,4], ray_class [N]):
    the differentiable volumetric trace (r4 verdict item 1 / BASELINE
    config #5's gradient pass).

    Pipeline: kernel geometric pass (stop_gradient — the bounding-volume
    entry events do not move with the medium), on-device event compaction
    (the compact-wire gather, make_fast_geo_compact_tracer), the
    kernel-VJP raymarch over the ≤bucket packed event lanes
    (ops/volumetric_adjoint.make_vol_march_diff) with the 5 medium
    parameters `med5 = (density_multiplier, noise_offset, absorption,
    scattering, brightness_ref)` as traced leaves, then the exact
    fold_samples composite. jax.grad of a loss over `color` w.r.t. med5
    runs forward AND backward as Pallas kernels."""
    from gr_raytracer_tpu.ops import volumetric_adjoint as va
    from gr_raytracer_tpu.ops import volumetric_pallas as vp
    from gr_raytracer_tpu.rendering import camera as cam

    if not supports_vol_diff(concrete_scene):
        raise ValueError("scene shape unsupported by the volumetric kernel-VJP path")
    spec = scene_kernel_spec(concrete_scene)
    vspec = vp.build_vol_spec(concrete_scene.objects[0], concrete_scene.geometry)
    march = va.make_vol_march_diff(vspec, interpret=interpret)
    obj_index = 0

    def body(med5, scene, row_f, col_f):
        x, p = cam.pixel_rays(scene.camera, row_f, col_f)
        g = trace_geometric_fast(scene, x, p, interpret=interpret, spec=spec)
        g = jax.tree.map(jax.lax.stop_gradient, g)
        n, k_slots = g.ev_kind.shape
        flatm = (g.ev_kind == obj_index).reshape(-1)
        order = jnp.argsort(~flatm, stable=True)[:bucket].astype(jnp.int32)
        sel = flatm[order]
        ev = g.ev_data.reshape(-1, g.ev_data.shape[-1])[order]
        ray = order // k_slots
        dtype = ev.dtype
        # Benign substitution for non-event slots (the geodesic adjoint's
        # convention): their ev payload is zeros, which puts the lane ON
        # THE DISC AXIS — a masked no-op forward, but 0·inf NaN-poisons the
        # backward's density vjp. Park them outside the bounding volume.
        outer = scene.objects[obj_index].outer_radius
        safe_ro = jnp.stack([outer * 4.0, jnp.zeros_like(outer), jnp.zeros_like(outer)])
        ro = jnp.where(sel[:, None], ev[:, 0:3], safe_ro.astype(dtype))
        seg = ev[:, 9:12]
        norm = jnp.maximum(jnp.sqrt(jnp.sum(seg * seg, -1, keepdims=True)), 1e-30)
        rd = jnp.where(
            sel[:, None], seg / norm, jnp.asarray([1.0, 0.0, 0.0], dtype)
        )
        ed = scene.objects[obj_index].exit_distance(ro, rd)
        ed = jnp.where(sel, jax.lax.stop_gradient(ed), 0.0)
        acc, t_fin, ws, wt = march(
            med5[0], med5[1], med5[2], med5[3], med5[4],
            ro, rd, g.observer_energy[ray], g.p_t[ray], g.p_phi[ray],
            sel.astype(ro.dtype), ed,
        )
        xyza = va.combine_alpha(acc, t_fin, ws, wt)
        xyza = jnp.where(sel[:, None], xyza, 0.0)
        colors = (
            jnp.zeros((n * k_slots, 4), xyza.dtype).at[order].set(xyza)
            .reshape(n, k_slots, 4)
        )
        color, ray_class = scn.fold_samples(
            scene, g.ev_kind, colors, g.stop_code, g.celestial
        )
        overflow = (flatm.sum() > bucket) | jnp.any(g.ev_overflow)
        return color, ray_class, overflow

    return jax.jit(body)


def make_fast_vol_fused_tracer(
    concrete_scene, bucket: int, mesh=None, interpret: bool = False
):
    """jitted (scene, row_f, col_f) -> (_wire(color, class, stop, ovf),
    count): the WHOLE volumetric split chunk on device — geometric kernel
    pass, event compaction, march-length sort, ONE raymarch dispatch over
    the full bucket, scatter, fold. The r4 compact wire still round-tripped
    the packed lanes to the host for the sort and re-uploaded them in
    VOLUMETRIC_LANE_CHUNK batches; GR_SPLIT_TIMING on the 300² hero slice
    showed that re-upload (rm_dispatch, 6.7 s) as the largest split phase —
    larger than the geo drain itself. Fusing keeps everything on device and
    ships only the folded _wire (~1 MB/chunk vs ~5 MB compact /
    ~35 MB full GeoTrace).

    `count` > bucket means the chunk overflowed the compact gather (rays
    averaged >2 crossings) — caller falls back to the full-wire path.

    With `mesh`, the body is shard_map-ed over the 1-D ray mesh (the
    pallas kernels need explicit sharding — no GSPMD rule): each device
    compacts and marches its own shard with a bucket of
    2·(chunk/n_devices); zero collectives. This closes the r4 gap where
    the fastest volumetric driver silently disengaged under --devices."""
    from gr_raytracer_tpu.ops import volumetric_pallas as vp
    from gr_raytracer_tpu.rendering import camera as cam
    from gr_raytracer_tpu.rendering.raytracer import _wire

    if not supports_scene(concrete_scene):
        raise ValueError("scene shape unsupported by the pallas fast path")
    spec = scene_kernel_spec(concrete_scene)
    vspec = vp.build_vol_spec(concrete_scene.objects[0], concrete_scene.geometry)
    obj_index = 0
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    shard_bucket = -(-bucket // n_dev)

    def body(scene, row_f, col_f):
        x, p = cam.pixel_rays(scene.camera, row_f, col_f)
        g = trace_geometric_fast(scene, x, p, interpret=interpret, spec=spec)
        n, k_slots = g.ev_kind.shape
        dtype = g.ev_data.dtype
        flatm = (g.ev_kind == obj_index).reshape(-1)
        order = jnp.argsort(~flatm, stable=True)[:shard_bucket].astype(jnp.int32)
        sel = flatm[order]
        ev = g.ev_data.reshape(-1, g.ev_data.shape[-1])[order]
        ray = order // k_slots
        obj = scene.objects[obj_index]
        outer = obj.outer_radius
        safe_ro = jnp.stack(
            [outer * 4.0, jnp.zeros_like(outer), jnp.zeros_like(outer)]
        ).astype(dtype)
        ro = jnp.where(sel[:, None], ev[:, 0:3], safe_ro)
        seg = ev[:, 9:12]
        norm = jnp.maximum(jnp.sqrt(jnp.sum(seg * seg, -1, keepdims=True)), 1e-30)
        rd = jnp.where(sel[:, None], seg / norm, jnp.asarray([1.0, 0.0, 0.0], dtype))
        ed = jnp.where(sel, obj.exit_distance(ro, rd), 0.0)
        # Device-side block-assignment sort (short marches share a kernel
        # block); inactive lanes to the back.
        ml = jnp.where(sel, vp.march_length_jnp(obj, ro, rd, ed), jnp.inf)
        ord2 = jnp.argsort(ml).astype(jnp.int32)
        out = vp.raymarch(
            vspec,
            ro[ord2], rd[ord2],
            g.observer_energy[ray][ord2], g.p_t[ray][ord2], g.p_phi[ray][ord2],
            sel[ord2], ed[ord2],
            interpret=interpret,
        )
        xyza = jnp.zeros((shard_bucket, 4), out.dtype).at[ord2].set(out)
        xyza = jnp.where(sel[:, None], xyza, 0.0)
        colors = (
            jnp.zeros((n * k_slots, 4), xyza.dtype).at[order].set(xyza)
            .reshape(n, k_slots, 4)
        )
        color, klass = scn.fold_samples(
            scene, g.ev_kind, colors, g.stop_code, g.celestial
        )
        count = flatm.sum().astype(jnp.int32).reshape(1)
        return _wire(color, klass, g.stop_code, g.ev_overflow) + (count,)

    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        from gr_raytracer_tpu.parallel import mesh as pmesh

        axis = mesh.axis_names[0]
        scene_specs = jax.tree.map(lambda _: P(), concrete_scene)
        body = pmesh.shard_map(
            body,
            mesh=mesh,
            in_specs=(scene_specs, P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        )

    return jax.jit(body)


def make_fast_geo_tracer(concrete_scene):
    """jitted (scene, row_f, col_f) -> GeoTrace with the kernel spec baked
    static (see make_fast_tracer). Unsharded only — the split path's
    compaction is host-driven."""
    import jax

    from gr_raytracer_tpu.rendering import camera as cam

    if not supports_scene(concrete_scene):
        raise ValueError("scene shape unsupported by the pallas fast path")
    spec = scene_kernel_spec(concrete_scene)

    def body(scene, row_f, col_f):
        x, p = cam.pixel_rays(scene.camera, row_f, col_f)
        return trace_geometric_fast(scene, x, p, spec=spec)

    return jax.jit(body)
