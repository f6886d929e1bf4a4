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
    NamedTuples/floats — hashable by value, so it can be a jit static arg
    (the phased path keys compiles on it)."""

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

    if _kernel_budget(concrete_scene) > PHASED_THRESHOLD:
        # Large budgets: phased march with active-lane compaction (an eager
        # host loop around jitted pieces — see march_phased). With a mesh the
        # chunk is split per device and the compaction loops interleave
        # (march_phased_mesh); rays are independent, so no collectives.
        if mesh is not None:

            def phased_mesh(scene, row_f, col_f):
                s = march_phased_mesh(scene, row_f, col_f, spec, mesh)
                return _wire(s.color, s.ray_class, s.stop_code, s.ev_overflow)

            return phased_mesh

        rays_jit = jax.jit(cam.pixel_rays)

        def phased(scene, row_f, col_f):
            x, p = rays_jit(scene.camera, row_f, col_f)
            s = trace_rays_fast_phased(scene, x, p, spec)
            return _wire(s.color, s.ray_class, s.stop_code, s.ev_overflow)

        return phased

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


def trace_geometric_fast(scene, positions, momenta, interpret: bool = False, spec=None):
    """Kernel-backed scene.trace_geometric: integration + event detection +
    surface/celestial shading WITHOUT volumetric raymarching. The driver's
    split path raymarches the (compacted) volumetric event lanes and folds,
    exactly as for the lax geometric pass (raytracer._trace_chunk_split)."""
    res, freq, solver, inverse, n = _march_scene(scene, positions, momenta, interpret, spec)
    return _finish_geo(scene, res, freq, solver, inverse, n)


# ---------------------------------------------------------------------------
# Phased kernel march with active-lane compaction (kernel-level requeue)
# ---------------------------------------------------------------------------
#
# A kernel block marches until its SLOWEST lane stops; the cost sort groups
# slow lanes into few blocks, but within those blocks most lanes still finish
# early and idle as masked work for up to 10⁶ steps (the #1 term in the
# roofline gap, BASELINE.md). Phased marching fixes this: march every block a
# bounded number of attempts, sync ONLY the [N] stop codes to the host,
# gather the still-running lanes into a dense power-of-two bucket, and resume
# just that bucket (the kernels' resume inputs carry per-lane steps/events).
# Phase budgets double up to a cap, so compiles stay bounded and the phase
# count stays logarithmic in the budget.

import functools as _functools

KERNEL_PHASE0 = 4096  # first-phase attempts (most lanes stop well before)
KERNEL_PHASE_CAP = 32768  # cap on per-phase attempts (bounds compile count)
# Budgets above this go phased — OPT-IN (GR_PHASED=1). Measured on chip
# (r2 session 4, hero scene 500×500 @ 1e6 steps, warm cache): single
# dispatch 47 s vs phased 64 s, bit-identical frames. The cost sort already
# groups slow lanes into few blocks and blocks exit as soon as all their
# lanes stop, so within-block compaction saves less than the per-round host
# round-trips + (bucket, attempts) compiles cost, at least over a tunneled
# chip. Phased marching remains the right primitive when block divergence
# is genuinely high (no usable cost proxy) or host↔device latency is low.
PHASED_THRESHOLD = (
    2 * KERNEL_PHASE0
    if __import__("os").environ.get("GR_PHASED", "0") == "1"
    else (1 << 62)
)


def _kernel_budget(scene) -> int:
    """Total per-lane classification budget the kernel dispatch will use."""
    mult = 2 if isinstance(_march_geometry_of(scene), KerrBL) else 1
    return mult * scene.integration.max_steps


@_functools.partial(jax.jit, static_argnames=("spec", "attempts", "interpret"))
def _phase0_jit(scene, positions, momenta, spec, attempts, interpret=False):
    march_geometry, solver, y0, freq, inverse = _prepare_march(scene, positions, momenta)
    state = _run_kernel(
        march_geometry,
        scene.integration,
        solver,
        y0,
        spec,
        interpret=interpret,
        attempts=attempts,
        finalize=False,
    )
    return march_geometry, solver, freq, inverse, state


@_functools.partial(jax.jit, static_argnames=("spec", "attempts", "interpret"))
def _phase_cont_jit(march_geometry, cfg, sub_solver, sub_state, spec, attempts, interpret=False):
    return _run_kernel(
        march_geometry,
        cfg,
        sub_solver,
        sub_state[0],
        spec,
        interpret=interpret,
        attempts=attempts,
        resume=sub_state,
        finalize=False,
    )


@jax.jit
def _gather_phase(state, solver, idx):
    n = state[0].shape[0]
    take = lambda a: a[idx] if (hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == n) else a
    return jax.tree.map(lambda a: a[idx], state), jax.tree.map(take, solver)


@jax.jit
def _scatter_phase(state, sub, idx):
    # Duplicate (padding) indices march identically from identical inputs,
    # so the last-writer-wins scatter is well-defined.
    return jax.tree.map(lambda a, b: a.at[idx].set(b), state, sub)


@_functools.partial(jax.jit, static_argnames=("geo_only", "n", "first_event_only"))
def _phase_finish_jit(scene, state, freq, solver, inverse, geo_only, n, first_event_only=False):
    y_f, stop, steps, ev_kind, ev_data, ev_count, ev_overflow = state
    stop = jnp.where(stop == integ.RUNNING, integ.BUDGET, stop)
    res = _state_to_result((y_f, stop, steps, ev_kind, ev_data, ev_count, ev_overflow))
    if geo_only:
        return _finish_geo(scene, res, freq, solver, inverse, n)
    return _finish_samples(
        scene, res, freq, solver, inverse, n, first_event_only=first_event_only
    )


class _PhasedRun:
    """One chunk's phased march as a host-steppable state machine, so a
    mesh driver can interleave several devices' compaction loops: every
    dispatch is async — only step()'s stop-code device_get blocks, and only
    on THIS run's device while the others keep computing."""

    def __init__(self, scene, positions, momenta, spec, geo_only, interpret, phase0, phase_cap):
        self.scene = scene
        self.spec = spec
        self.geo_only = geo_only
        self.interpret = interpret
        self.phase_cap = phase_cap
        self.n = positions.shape[0]
        self.budget = _kernel_budget(scene)
        self.attempts = phase0
        self.rounds_left = 2 + self.budget // max(phase0, 1)
        (
            self.march_geometry,
            self.solver,
            self.freq,
            self.inverse,
            self.state,
        ) = _phase0_jit(
            scene,
            positions,
            momenta,
            spec=spec,
            attempts=min(phase0, self.budget),
            interpret=interpret,
        )

    def step(self) -> bool:
        """Run one compaction round; True when the march is complete.
        Safety bound: every active lane gains `attempts` steps per round,
        so budget/phase0 rounds strictly suffice for classification."""
        import numpy as np

        if self.rounds_left <= 0:
            return True
        self.rounds_left -= 1
        stop_h = np.asarray(jax.device_get(self.state[1]))
        active = np.nonzero(stop_h == integ.RUNNING)[0]
        if active.size == 0:
            return True
        self.attempts = min(self.attempts * 2, self.phase_cap, self.budget)
        bucket = gp.LANE_TILE
        while bucket < active.size:
            bucket *= 2
        idx = jnp.asarray(
            np.concatenate([active, np.full(bucket - active.size, active[0], active.dtype)])
        )
        sub_state, sub_solver = _gather_phase(self.state, self.solver, idx)
        sub_out = _phase_cont_jit(
            self.march_geometry,
            self.scene.integration,
            sub_solver,
            sub_state,
            spec=self.spec,
            attempts=self.attempts,
            interpret=self.interpret,
        )
        self.state = _scatter_phase(self.state, sub_out, idx)
        return False

    def finish(self):
        return _phase_finish_jit(
            self.scene,
            self.state,
            self.freq,
            self.solver,
            self.inverse,
            geo_only=self.geo_only,
            n=self.n,
            first_event_only=bool(self.spec.opaque) and not self.geo_only,
        )


def march_phased(
    scene,
    positions,
    momenta,
    spec,
    geo_only=False,
    interpret=False,
    phase0=KERNEL_PHASE0,
    phase_cap=KERNEL_PHASE_CAP,
):
    """Eager phased-march orchestrator (host compaction loop between jitted
    pieces — cannot live under one jit). Per-phase host traffic is one [N]
    int32 stop vector; state/events stay device-resident throughout."""
    run = _PhasedRun(scene, positions, momenta, spec, geo_only, interpret, phase0, phase_cap)
    while not run.step():
        pass
    return run.finish()


def march_phased_mesh(
    scene,
    row_f,
    col_f,
    spec,
    mesh,
    geo_only=False,
    interpret=False,
    phase0=KERNEL_PHASE0,
    phase_cap=KERNEL_PHASE_CAP,
):
    """Data-parallel phased march over a device mesh. Rays are independent,
    so the mesh path is per-device orchestration, not SPMD: the chunk is
    split evenly, each segment (scene copy + camera rays) is committed to
    its device, and the per-device compaction loops are interleaved
    round-robin — all kernel dispatches are async, so devices compute
    concurrently while the host blocks on one run's stop codes at a time.
    Zero collectives, matching SURVEY §2.5 (the only cross-ray data
    dependence in the pipeline is tone mapping / AA, handled elsewhere)."""
    import numpy as np

    devs = list(mesh.devices.ravel())
    rf = np.asarray(jax.device_get(row_f))
    cf = np.asarray(jax.device_get(col_f))
    n = rf.shape[0]
    assert n % len(devs) == 0, "chunk must divide the mesh"
    seg = n // len(devs)
    rays_jit = _camera_rays_jit  # module-level: one compile across chunks

    runs = []
    for i, dev in enumerate(devs):
        scene_d = jax.device_put(scene, dev) if len(devs) > 1 else scene
        rf_d = jax.device_put(jnp.asarray(rf[i * seg : (i + 1) * seg]), dev)
        cf_d = jax.device_put(jnp.asarray(cf[i * seg : (i + 1) * seg]), dev)
        x, p = rays_jit(scene_d.camera, rf_d, cf_d)
        runs.append(
            _PhasedRun(scene_d, x, p, spec, geo_only, interpret, phase0, phase_cap)
        )
    pending = list(runs)
    while pending:
        pending = [r for r in pending if not r.step()]
    # finish() dispatches per device (async); pull to host and stitch —
    # committed arrays on different devices cannot concat on-device.
    outs = [jax.device_get(r.finish()) for r in runs]
    return jax.tree.map(lambda *xs: jnp.asarray(np.concatenate(xs)), *outs)


def _camera_rays(camera, row_f, col_f):
    from gr_raytracer_tpu.rendering import camera as cam

    return cam.pixel_rays(camera, row_f, col_f)


_camera_rays_jit = jax.jit(_camera_rays)


def trace_rays_fast_phased(scene, positions, momenta, spec, interpret=False, **kw):
    return march_phased(scene, positions, momenta, spec, geo_only=False, interpret=interpret, **kw)


def trace_geometric_fast_phased(scene, positions, momenta, spec, interpret=False, **kw):
    return march_phased(scene, positions, momenta, spec, geo_only=True, interpret=interpret, **kw)


def make_fast_geo_tracer(concrete_scene):
    """jitted (scene, row_f, col_f) -> GeoTrace with the kernel spec baked
    static (see make_fast_tracer). Unsharded only — the split path's
    compaction is host-driven."""
    import jax

    from gr_raytracer_tpu.rendering import camera as cam

    if not supports_scene(concrete_scene):
        raise ValueError("scene shape unsupported by the pallas fast path")
    spec = scene_kernel_spec(concrete_scene)

    if _kernel_budget(concrete_scene) > PHASED_THRESHOLD:
        rays_jit = jax.jit(cam.pixel_rays)

        def phased(scene, row_f, col_f):
            x, p = rays_jit(scene.camera, row_f, col_f)
            return trace_geometric_fast_phased(scene, x, p, spec)

        return phased

    def body(scene, row_f, col_f):
        x, p = cam.pixel_rays(scene.camera, row_f, col_f)
        return trace_geometric_fast(scene, x, p, spec=spec)

    return jax.jit(body)
