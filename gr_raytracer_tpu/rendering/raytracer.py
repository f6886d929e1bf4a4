"""Render driver: chunked full-frame render, adaptive supersampling, output.

Reference behavior: src/rendering/raytracer.rs. TPU mapping:

  * Pass 1 traces the (section of the) pixel grid in fixed-size chunks
    through one jitted trace function (one compile, reused across chunks,
    passes, and scenes of the same structure).
  * The 8-neighbor contrast selection (raytracer.rs:386-458) is a cheap
    stencil — evaluated host-side in numpy, bit-faithful to the reference's
    pair test including the Michelson epsilon, the luminance floor (explicit
    or 1e-3 × 99th-percentile), and exclude_background_contrast.
  * The stratified jitter uses the reference's splitmix64 hash exactly
    (raytracer.rs:131-159) — computed host-side in uint64 (the TPU f32 path
    has no 64-bit integers), then the jittered sub-rays are traced in the
    same chunked device loop and averaged.
  * Tone mapping runs on device (color.py); PNG via PIL, Radiance .hdr via a
    small local RGBE writer (raytracer.rs:468-480 uses the image crate).
"""

from __future__ import annotations

import os
import sys
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import color as col
from gr_raytracer_tpu.rendering import scene as scn

MICHELSON_DENOMINATOR_EPSILON = 1e-4
RELATIVE_MINIMUM_LUMINANCE_FRACTION = 1e-3

_NEIGHBOR_SHIFTS = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


# ---------------------------------------------------------------------------
# splitmix64 stratified jitter (bit-exact vs raytracer.rs:131-159)
# ---------------------------------------------------------------------------


def mix64(z: np.ndarray) -> np.ndarray:
    z = np.asarray(z, np.uint64)
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def hash_pixel_samples(row, col, k) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = mix64(np.asarray(row, np.uint64) + mix64(np.asarray(col, np.uint64) + mix64(np.asarray(k, np.uint64))))
    return (z >> np.uint64(11)).astype(np.float64) * (1.0 / float(1 << 53))


def stratified_sample_offsets(rows: np.ndarray, cols: np.ndarray, samples_per_axis: int):
    """All n² jittered (dx, dy) offsets for each (row, col): [P, n²] each."""
    n = samples_per_axis
    sr, sc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    idx = (sr * n + sc).ravel()  # [n²]
    r = rows[:, None]
    c = cols[:, None]
    dx = (sc.ravel()[None, :] + hash_pixel_samples(r, c, 2 * idx[None, :])) / n
    dy = (sr.ravel()[None, :] + hash_pixel_samples(r, c, 2 * idx[None, :] + 1)) / n
    return dx, dy


# ---------------------------------------------------------------------------
# Adaptive-sampling pixel selection (host stencil, raytracer.rs:386-458)
# ---------------------------------------------------------------------------


def resolve_minimum_luminance(cfg, luminance: np.ndarray) -> float:
    """Explicit floor, or 1e-3 × the 99th-percentile frame luminance
    (kth-smallest with k = floor((len−1)·0.99), matching select_nth)."""
    if cfg.minimum_luminance is not None:
        return float(cfg.minimum_luminance)
    flat = luminance.ravel()
    if flat.size == 0:
        return 0.0
    k = int((flat.size - 1) * 0.99)
    return RELATIVE_MINIMUM_LUMINANCE_FRACTION * float(np.partition(flat, k)[k])


def collect_supersample_mask(cfg, luminance, alpha, ray_class, minimum_luminance):
    """Boolean [H, W] mask of pixels with any triggering 8-neighbor pair."""
    h, w = luminance.shape
    mask = np.zeros((h, w), bool)
    for dr, dc in _NEIGHBOR_SHIFTS:
        # Valid overlap region between the buffer and its shifted self.
        rs, re = max(dr, 0), h + min(dr, 0)
        cs, ce = max(dc, 0), w + min(dc, 0)
        p_l = luminance[rs:re, cs:ce]
        p_a = alpha[rs:re, cs:ce]
        p_k = ray_class[rs:re, cs:ce]
        q_l = luminance[rs - dr : re - dr, cs - dc : ce - dc]
        q_a = alpha[rs - dr : re - dr, cs - dc : ce - dc]
        q_k = ray_class[rs - dr : re - dr, cs - dc : ce - dc]

        class_diff = p_k != q_k
        lum_contrast = np.abs(p_l - q_l) / (p_l + q_l + MICHELSON_DENOMINATOR_EPSILON)
        opa_contrast = np.abs(p_a - q_a)
        visible = np.maximum(p_l, q_l) > minimum_luminance
        contrast = visible & (
            (lum_contrast > cfg.luminance_contrast_threshold)
            | (opa_contrast > cfg.opacity_contrast_threshold)
        )
        if cfg.exclude_background_contrast:
            contrast &= p_k != scn.ESCAPED
        mask[rs:re, cs:ce] |= class_diff | contrast
    return mask


# ---------------------------------------------------------------------------
# Chunked tracing
# ---------------------------------------------------------------------------


def _wire(color, klass, stop, ovf):
    """Compact the per-ray outputs for the host transfer: every code fits
    uint8, and the fold's output alpha is IDENTICALLY 1 (fold_samples
    blends over an alpha-1 base, exactly like the reference's
    CIETristimulus::new(0,0,0,1) seed, scene.rs:206-214), so only the XYZ
    channels cross the wire and _drain re-appends the constant. The
    tunneled runtime moves ~40 MB/s (scripts/bench_decomp.py) — int32
    classes + the alpha column were ~55% of a frame's transfer bytes."""
    return (
        color[..., :3],
        klass.astype(jnp.uint8),
        stop.astype(jnp.uint8),
        ovf.astype(jnp.uint8),
    )


def _unwire(c: np.ndarray) -> np.ndarray:
    """Restore the constant alpha column dropped by _wire (no-op for the
    host-side split path, which never narrows)."""
    if c.shape[-1] == 3:
        c = np.concatenate([c, np.ones_like(c[..., :1])], axis=-1)
    return c


@jax.jit
def _trace_chunk(scene, row_f, col_f):
    x, p = cam.pixel_rays(scene.camera, row_f, col_f)
    s = scn.trace_rays(scene, x, p)
    return _wire(s.color, s.ray_class, s.stop_code, s.ev_overflow)


# ---------------------------------------------------------------------------
# Requeue compaction (active-ray re-batching, SURVEY.md §5 / hard part 1)
# ---------------------------------------------------------------------------
#
# A chunk's while_loop runs until its SLOWEST lane stops; trapped/near-ring
# rays burn the full step budget while 99% of lanes idle. Phased integration
# with host-side compaction fixes this: integrate every chunk for a bounded
# number of attempts, gather the still-running lanes into small dense
# buckets, and continue only those (phase budgets double so the number of
# phases stays logarithmic in max_steps).

from functools import partial as _partial

from gr_raytracer_tpu.rendering.redshift import ray_frequency_data as _ray_freq

PHASE_ATTEMPTS = 2048
REQUEUE_BUCKET_MIN = 1024


@_partial(jax.jit, static_argnames=("attempts",))
def _phase_start(scene, row_f, col_f, attempts):
    x, p = cam.pixel_rays(scene.camera, row_f, col_f)
    geometry = scene.geometry
    solver = geometry.make_solver(x, p)
    y0 = solver.initial_state(x, p)
    freq = _ray_freq(geometry, x, p, scene.camera.velocity)
    res = scn.integ.integrate_rays(
        geometry,
        solver,
        scene.integration,
        y0,
        scn._segment_fn(scene),
        scn.EVENT_WIDTH,
        attempts_budget=attempts,
        finalize=False,
    )
    return solver, freq, res


@_partial(jax.jit, static_argnames=("attempts",))
def _phase_continue(scene, solver, res, attempts):
    return scn.integ.integrate_rays(
        scene.geometry,
        solver,
        scene.integration,
        res.y,
        scn._segment_fn(scene),
        scn.EVENT_WIDTH,
        resume=res,
        attempts_budget=attempts,
        finalize=False,
    )


@jax.jit
def _phase_finish(scene, solver, freq, res):
    stop = jnp.where(res.stop_code == scn.integ.RUNNING, scn.integ.BUDGET, res.stop_code)
    res = res._replace(stop_code=stop)
    colors, shade_fail = scn._shade_events(scene, freq, res)
    stop = jnp.where(shade_fail, scn.integ.STEP_FAILED, stop)
    celestial = scn._celestial_color(scene, freq, solver, res)
    color, klass = scn.fold_samples(scene, res.ev_kind, colors, stop, celestial)
    return _wire(color, klass, stop, res.ev_overflow)


def _gather_ray_tree(tree, idx, n):
    """Gather per-ray leaves (leading dim n) of a pytree; keep scalars."""
    return jax.tree.map(
        lambda a: a[idx] if (hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == n) else a,
        tree,
    )


def _bucket_size(m: int) -> int:
    size = REQUEUE_BUCKET_MIN
    while size < m:
        size *= 2
    return size


@jax.jit
def _gather_res(res, idx):
    return jax.tree.map(lambda a: a[idx], res)


@jax.jit
def _scatter_res(res, sub, idx):
    # Duplicate (padding) indices all carry the same lane's values, so the
    # last-writer-wins scatter is well-defined.
    return jax.tree.map(lambda a, b: a.at[idx].set(b), res, sub)


def _trace_chunk_requeued(scene, rf, cf, put=jnp.asarray):
    """Chunk trace with phased integration + active-lane compaction.

    Everything heavy (state + event buffers) stays device-resident; the only
    per-phase host transfer is the [N] stop-code vector — essential on
    remote/tunneled runtimes where device_get bandwidth dwarfs compute."""
    n = rf.shape[0]
    cfg = scene.integration
    max_attempts = cfg.max_steps + cfg.extra_attempts
    phase = min(PHASE_ATTEMPTS, max_attempts)

    solver, freq, res = _phase_start(scene, put(rf), put(cf), attempts=phase)
    spent = phase

    while spent < max_attempts:
        active = np.nonzero(np.asarray(res.stop_code) == scn.integ.RUNNING)[0]
        if active.size == 0:
            break
        phase = min(phase * 2, max_attempts - spent)
        bucket = _bucket_size(active.size)
        idx = jnp.asarray(
            np.concatenate([active, np.full(bucket - active.size, active[0], active.dtype)])
        )
        sub_res = _gather_res(res, idx)
        sub_solver = _gather_ray_tree(solver, idx, n)
        sub_out = _phase_continue(scene, sub_solver, sub_res, attempts=phase)
        res = _scatter_res(res, sub_out, idx)
        spent += phase

    color, klass, stop, overflow = _phase_finish(scene, solver, freq, res)
    return jax.device_get((color, klass, stop, overflow))


_fast_tracers: dict = {}


def _trace_chunk_fast(scene, row_f, col_f, mesh=None):
    """Pallas fast path with a per-scene-identity tracer cache (the disc
    bounds are baked static; everything else stays traced).

    Cache entries hold a strong reference to the keyed scene/mesh: while an
    entry lives, its id() cannot be reused by a new object, so a GC'd scene
    followed by a new scene at the same address can never silently pick up
    the old baked kernel spec (r2 verdict weak #5). The identity check makes
    the invariant explicit and self-healing across cache clears."""
    from gr_raytracer_tpu.rendering import fast_path

    key = (id(scene), id(mesh))
    entry = _fast_tracers.get(key)
    if entry is None or entry[0] is not scene or entry[1] is not mesh:
        if len(_fast_tracers) > 8:
            _fast_tracers.clear()
        entry = _fast_tracers[key] = (scene, mesh, fast_path.make_fast_tracer(scene, mesh=mesh))
    return entry[2](scene, row_f, col_f)


def _use_fast_path(scene) -> bool:
    """Pallas kernel path: supported scene shape AND a real TPU backend
    (pallas_call needs interpret mode elsewhere — the lax path is fine on
    CPU). Validated on hardware (4x the lax path); GR_FAST_PATH=0 is the
    kill switch."""
    import os

    from gr_raytracer_tpu.rendering import fast_path

    return (
        os.environ.get("GR_FAST_PATH", "1") != "0"
        and jax.default_backend() == "tpu"
        and fast_path.supports_scene(scene)
    )


@jax.jit
def _trace_chunk_geo(scene, row_f, col_f):
    x, p = cam.pixel_rays(scene.camera, row_f, col_f)
    return scn.trace_geometric(scene, x, p)


@jax.jit
def _raymarch_compact(obj, geometry, ro, rd, obs, p_t, p_phi, active):
    return obj.raymarch(geometry, ro, rd, obs, p_t, p_phi, active)


@jax.jit
def _exit_distance_jit(obj, ro, rd):
    return obj.exit_distance(ro, rd)


def _exit_distances(obj, ro, rd, put):
    """Jitted, bucket-padded exit distances. Eager dispatch of the ~50-op
    exit_distance expression over a tunneled TPU costs ~0.3 s PER OP — it
    was 15 s of a 15.2 s frame (the entire volumetric split budget);
    jitted it is one dispatch. Padding to the chunk size bounds retraces."""
    n = ro.shape[0]
    nb = -(-n // VOLUMETRIC_LANE_CHUNK) * VOLUMETRIC_LANE_CHUNK
    rop = np.concatenate([ro, np.repeat(ro[:1], nb - n, axis=0)])
    rdp = np.concatenate([rd, np.repeat(rd[:1], nb - n, axis=0)])
    return np.asarray(jax.device_get(_exit_distance_jit(obj, put(rop), put(rdp))))[:n]


# Compact-raymarch batch size. Each batch is one kernel dispatch + one
# device_get, and on the tunneled chip a dispatch costs ~20-25 ms of pure
# round-trip latency — at 4096 the hero frame's ~10M volumetric sub-ray
# lanes cost ~2,500 dispatches ≈ 60 s of latency alone. 32768 (32 kernel
# blocks) amortizes that 8× while keeping worst-case tail padding (the
# last batch) small relative to any workload that has thousands of
# volumetric lanes; tiny scenes pay one padded batch either way (the
# kernel pads internally to 1024 anyway). Env knob for probes/A-Bs.
VOLUMETRIC_LANE_CHUNK = int(
    __import__("os").environ.get("GR_VOL_LANE_CHUNK", "32768")
)

_vol_specs: dict = {}


def _vol_kernel_fn(obj, geometry):
    """Cached (spec, jitted kernel) for a concrete volumetric object, or
    (None, None) when the Pallas raymarch doesn't cover it. The Chebyshev
    fits are built once per object identity."""
    import os

    from gr_raytracer_tpu.ops import volumetric_pallas as vp

    if (
        os.environ.get("GR_FAST_PATH", "1") == "0"
        or jax.default_backend() != "tpu"
        or not vp.supports(obj, geometry)
    ):
        return None, None
    # Entries hold the object itself so its id() cannot be reused while
    # cached (see _trace_chunk_fast's cache note).
    key = id(obj)
    entry = _vol_specs.get(key)
    if entry is None or entry[0] is not obj:
        if len(_vol_specs) > 8:
            _vol_specs.clear()
        spec = vp.build_vol_spec(obj, geometry)
        # Closure (not partial-as-arg): the spec is a static Python constant
        # baked into the trace, exactly like the geodesic kernel's discs.
        kernel = jax.jit(
            lambda ro, rd, o, pt, pp, act, ed, _s=spec: vp.raymarch(_s, ro, rd, o, pt, pp, act, ed)
        )
        entry = _vol_specs[key] = (obj, spec, kernel)
    return entry[1], entry[2]


def _has_volumetric(scene) -> bool:
    return any(hasattr(o, "raymarch") for o in scene.objects)


_geo_fast_tracers: dict = {}


def _trace_chunk_geo_fast(scene, row_f, col_f):
    """Kernel-backed geometric pass (per-scene-identity tracer cache with
    the same liveness guarantee as _trace_chunk_fast)."""
    from gr_raytracer_tpu.rendering import fast_path

    key = id(scene)
    entry = _geo_fast_tracers.get(key)
    if entry is None or entry[0] is not scene:
        if len(_geo_fast_tracers) > 8:
            _geo_fast_tracers.clear()
        entry = _geo_fast_tracers[key] = (scene, fast_path.make_fast_geo_tracer(scene))
    return entry[1](scene, row_f, col_f)


def _compact_split_eligible(scene, put=jnp.asarray) -> bool:
    """Compact-wire gate: kernel path, single volumetric object, its
    raymarch kernel available, unsharded driver."""
    if (
        os.environ.get("GR_COMPACT_WIRE", "1") == "0"
        or put is not jnp.asarray
        or not _use_fast_path(scene)
        or len(scene.objects) != 1
        or not hasattr(scene.objects[0], "raymarch")
    ):
        return False
    _, kernel = _vol_kernel_fn(scene.objects[0], scene.geometry)
    return kernel is not None


def _fused_split_eligible(scene) -> bool:
    """Fused split gate (fast_path.make_fast_vol_fused_tracer): kernel
    path, single volumetric object, raymarch kernel available. Unlike the
    r4 compact wire this path also serves sharded drivers (the whole chunk
    is one jit, shard_map-able)."""
    if (
        os.environ.get("GR_COMPACT_FUSED", "1") == "0"
        or not _use_fast_path(scene)
        or len(scene.objects) != 1
        or not hasattr(scene.objects[0], "raymarch")
    ):
        return False
    _, kernel = _vol_kernel_fn(scene.objects[0], scene.geometry)
    return kernel is not None


_fused_tracers: dict = {}


def _trace_chunk_split_fused_start(scene, rf, cf, put, mesh, bucket):
    """Dispatch one fused split chunk (device-side compact+sort+march+fold,
    fast_path.make_fast_vol_fused_tracer) without draining it."""
    from gr_raytracer_tpu.rendering import fast_path

    key = (id(scene), id(mesh), int(bucket))
    entry = _fused_tracers.get(key)
    if entry is None or entry[0] is not scene:
        if len(_fused_tracers) > 8:
            _fused_tracers.clear()
        entry = _fused_tracers[key] = (
            scene,
            fast_path.make_fast_vol_fused_tracer(scene, bucket, mesh=mesh),
        )
    return entry[1](scene, put(rf), put(cf))


# Sticky bucket hint, keyed by (id(scene), chunk lane count): once a chunk
# overflows bucket 2n and succeeds at a bigger one, subsequent chunks of the
# same render START at that bucket. At the 1500² hero, 67 of 203 chunks (the
# disc-band AA chunks, averaging >2 crossings/sub-ray) overflowed 2n and
# paid a full doubled-bucket rerun — 38.5 s of the 120.4 s frame
# (docs/hero5_decomp_full.json). The hint trades that for one extra (cached)
# compile and a little padding on post-escalation chunks. Monotonic per key;
# cleared only by cache-size eviction.
_fused_bucket_hint: dict = {}


def _fused_hint_key(scene, n):
    return (id(scene), int(n))


def _trace_chunk_split_fused_finish(scene, futs, mesh, bucket, rf, cf, put):
    """Drain a fused chunk. On compact-bucket overflow (a disc-band AA
    chunk averaging >bucket/n crossings per sub-ray) retry the SAME fused
    tracer at double the bucket — one extra (cached) compile per size, far
    cheaper than the host-compact/full-wire fallback; the unfused path
    remains the final resort. A successful retry records its bucket in
    _fused_bucket_hint so later chunks skip the failed first attempt."""
    timing = _SPLIT_TIMING_ON
    t0 = time.perf_counter() if timing else 0.0
    c, k, stop, ovf, count = (np.asarray(a) for a in jax.device_get(futs))
    if timing:
        _t_acc("fused_drain", t0)
    n_dev = 1 if mesh is None else int(mesh.devices.size)
    if (count > -(-bucket // n_dev)).any():
        t0r = time.perf_counter() if timing else 0.0
        retry = 2 * bucket
        # K_EVENTS caps per-ray crossings, so bucket K·n always suffices.
        k_slots = scene.integration.max_events
        if retry < k_slots * rf.size:
            futs2 = _trace_chunk_split_fused_start(scene, rf, cf, put, mesh, retry)
            out = _trace_chunk_split_fused_finish(
                scene, futs2, mesh, retry, rf, cf, put
            )
            # Deeper retries record their own (larger) bucket first; max
            # keeps the deepest one that was needed.
            key = _fused_hint_key(scene, rf.size)
            if len(_fused_bucket_hint) > 32:
                _fused_bucket_hint.clear()
            _fused_bucket_hint[key] = max(_fused_bucket_hint.get(key, 0), retry)
        else:
            out = _trace_chunk_split(scene, rf, cf, put=put)
        if timing:
            # Includes the doubled-bucket tracer's first-call tracing +
            # compile-cache load + full re-execution (nested drains also
            # accrue to fused_drain — overlap is expected).
            _t_acc("fused_retry", t0r)
        return out
    return c, k, stop, ovf


_geo_compact_tracers: dict = {}


def _trace_chunk_geo_fast_compact(scene, row_f, col_f, obj_index, bucket):
    """Kernel geometric pass + on-device volumetric-event compaction (see
    fast_path.make_fast_geo_compact_tracer; same cache discipline as
    _trace_chunk_geo_fast)."""
    from gr_raytracer_tpu.rendering import fast_path

    key = (id(scene), obj_index, bucket)
    entry = _geo_compact_tracers.get(key)
    if entry is None or entry[0] is not scene:
        if len(_geo_compact_tracers) > 8:
            _geo_compact_tracers.clear()
        entry = _geo_compact_tracers[key] = (
            scene,
            fast_path.make_fast_geo_compact_tracer(scene, obj_index, bucket),
        )
    return entry[1](scene, row_f, col_f)


def _trace_chunk_split_compact_start(scene, rf, cf):
    """Dispatch the compact geometric pass for a chunk WITHOUT draining it.
    Returns the in-flight device tuple; _trace_chunk_split_compact_finish
    fetches and raymarches. Splitting dispatch from drain lets the chunked
    driver enqueue chunk i+1's geometric march before doing chunk i's host
    work (sort, raymarch batching, fold), so the device never idles on the
    host between chunks."""
    n = rf.size
    # Bucket 2n: AA sub-ray chunks on the disc band average >1 crossing per
    # lane (wound rays cross the slab twice-plus), and a count > bucket
    # chunk pays the compact attempt AND the full-wire fallback. 2n covers
    # every observed band chunk; the packed block is still ~7x under the
    # full GeoTrace wire.
    return _trace_chunk_geo_fast_compact(
        scene, jnp.asarray(rf), jnp.asarray(cf), 0, 2 * n
    )


# Opt-in per-phase wall-clock accounting for the compact split driver
# (GR_SPLIT_TIMING=1): accumulated across chunks, printed by the CLI at the
# end of a render and dumped by scripts/hero_decomp.py. Keys:
#   geo_drain      device_get of the compact geometric pass (includes any
#                  not-yet-finished march time when the pipeline didn't
#                  fully hide it + the ~5 MB compact wire transfer)
#   sort           host-side march_length sort + gathers
#   rm_dispatch    raymarch batch enqueue (host→device upload + dispatch)
#   rm_fetch       raymarch result device_get (march wall not hidden by
#                  the dispatch pipeline + [chunk,4] transfers)
#   fold           host-CPU fold_samples composite
#   scatter        ev_colors scatter
SPLIT_TIMING: dict = {}
_SPLIT_TIMING_ON = os.environ.get("GR_SPLIT_TIMING") == "1"


def _t_acc(key, t0):
    t1 = time.perf_counter()
    SPLIT_TIMING[key] = SPLIT_TIMING.get(key, 0.0) + (t1 - t0)
    n_key = "n_" + key
    SPLIT_TIMING[n_key] = SPLIT_TIMING.get(n_key, 0) + 1
    # Per-key max separates one-time costs (first-call jaxpr tracing /
    # persistent-cache executable load) from per-chunk steady state.
    m_key = "max_" + key
    SPLIT_TIMING[m_key] = max(SPLIT_TIMING.get(m_key, 0.0), t1 - t0)
    return t1


def _trace_chunk_split_compact_finish(scene, n, futs, vol_chunk, kernel):
    """Drain a dispatched compact chunk and raymarch its event lanes.
    Returns None if the chunk's events overflow the compact bucket (caller
    reruns the full-wire path; only possible when rays average >1
    crossing)."""
    import contextlib

    from gr_raytracer_tpu.ops import volumetric_pallas as vp

    timing = _SPLIT_TIMING_ON
    t0 = time.perf_counter() if timing else 0.0
    obj = scene.objects[0]
    cel, kind8, stop8, ovf, packed, order, count = jax.device_get(futs)
    if timing:
        t0 = _t_acc("geo_drain", t0)
    count = int(count)
    if count > 2 * n:
        return None
    packed = np.asarray(packed)[:count]
    order = np.asarray(order)[:count]
    ro, rd = packed[:, 0:3], packed[:, 3:6]
    obs, ptv, ppv, ed = packed[:, 6], packed[:, 7], packed[:, 8], packed[:, 9]
    lane_order = np.argsort(vp.march_length(obj, ro, rd, ed))
    ro, rd, obs, ptv, ppv, ed, order = (
        a[lane_order] for a in (ro, rd, obs, ptv, ppv, ed, order)
    )
    if timing:
        t0 = _t_acc("sort", t0)
    k_slots = int(kind8.shape[1])
    ev_colors = np.zeros((n, k_slots, 4), np.float32)
    # Dispatch every raymarch batch before fetching any: jax dispatch is
    # async, so batch j+1 marches while batch j's results cross the tunnel.
    batches = []
    for start in range(0, count, vol_chunk):
        end = min(start + vol_chunk, count)
        m = end - start
        pad = lambda a: np.concatenate(
            [a[start:end], np.repeat(a[start : start + 1], vol_chunk - m, axis=0)]
        )
        active = np.zeros((vol_chunk,), bool)
        active[:m] = True
        batches.append(
            (
                start,
                end,
                m,
                kernel(
                    jnp.asarray(pad(ro)),
                    jnp.asarray(pad(rd)),
                    jnp.asarray(pad(obs)),
                    jnp.asarray(pad(ptv)),
                    jnp.asarray(pad(ppv)),
                    jnp.asarray(active),
                    jnp.asarray(np.where(active, pad(ed), 0.0)),
                ),
            )
        )
    if timing:
        SPLIT_TIMING["rm_batches"] = SPLIT_TIMING.get("rm_batches", 0) + len(batches)
        SPLIT_TIMING["rm_lanes"] = SPLIT_TIMING.get("rm_lanes", 0) + count
        t0 = _t_acc("rm_dispatch", t0)
    for start, end, m, fut in batches:
        out = jax.device_get(fut)
        if timing:
            t0 = _t_acc("rm_fetch", t0)
        sl = order[start:end]
        ev_colors[sl // k_slots, sl % k_slots] = out[:m]
        if timing:
            t0 = _t_acc("scatter", t0)
    kind = kind8.astype(np.int32)
    stop = stop8.astype(np.int32)
    # Fold on the host CPU backend when present (the CLI enables it): the
    # inputs are host arrays and the fold is trivial arithmetic — a device
    # fold would re-upload ev_colors (~8 MB/chunk) over the tunnel.
    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = None
    ctx = jax.default_device(cpu) if cpu is not None else contextlib.nullcontext()
    with ctx:
        color, klass = scn.fold_samples(
            scene,
            jnp.asarray(kind),
            jnp.asarray(ev_colors),
            jnp.asarray(stop),
            jnp.asarray(cel),
        )
        color, klass = np.asarray(color), np.asarray(klass)
    if timing:
        _t_acc("fold", t0)
    return color, klass, stop, np.asarray(ovf)


def _trace_chunk_split(scene, rf, cf, vol_chunk: int = VOLUMETRIC_LANE_CHUNK, put=jnp.asarray):
    """Volumetric split path: geometric pass on device, host-side compaction
    of the (sparse) volumetric event lanes, padded compact raymarch batches,
    then the exact fold. Marching only hit lanes instead of all N·K slots is
    a 10-100× saving (most rays never enter the disc)."""
    # Single-volumetric-object scenes on the kernel path take the compact
    # wire (events compacted on device; ~7x less tunnel transfer).
    if _compact_split_eligible(scene, put):
        _, kernel = _vol_kernel_fn(scene.objects[0], scene.geometry)
        futs = _trace_chunk_split_compact_start(scene, rf, cf)
        out = _trace_chunk_split_compact_finish(scene, rf.size, futs, vol_chunk, kernel)
        if out is not None:
            return out
    # The geometric pass rides the Pallas march kernel when the scene shape
    # qualifies (KS chart + z-axis bounding volumes); unsharded only — the
    # kernel has no GSPMD partitioning rule.
    if put is jnp.asarray and _use_fast_path(scene):
        geo = jax.device_get(_trace_chunk_geo_fast(scene, put(rf), put(cf)))
    else:
        geo = jax.device_get(_trace_chunk_geo(scene, put(rf), put(cf)))
    ev_colors = np.array(geo.surface_colors)
    for idx, obj in enumerate(scene.objects):
        if not hasattr(obj, "raymarch"):
            continue
        nn, kk = np.nonzero(geo.ev_kind == idx)
        if nn.size == 0:
            continue
        ro_all = geo.ev_data[nn, kk, 0:3]
        seg = geo.ev_data[nn, kk, 9:12]
        norm = np.maximum(np.linalg.norm(seg, axis=-1, keepdims=True), 1e-30)
        rd_all = seg / norm
        # Each raymarch batch runs until its slowest lane exits; sort lanes
        # so slow lanes share batches instead of pacing every batch. The
        # kernel path clips every march to its emitting interval, so its
        # cost is the CLIPPED length (vp.march_length), not exit_d — two
        # lanes with equal exit_d can differ 50× in marched samples.
        ed = _exit_distances(obj, ro_all, rd_all, put)
        # Pallas VMEM-resident raymarch when the object/geometry qualifies
        # (ops/volumetric_pallas.py); only on an unsharded driver — the
        # kernel has no GSPMD partitioning rule (the sharded path goes
        # through the lax raymarch, which partitions trivially).
        _, kernel = (None, None) if put is not jnp.asarray else _vol_kernel_fn(obj, scene.geometry)
        if kernel is not None:
            from gr_raytracer_tpu.ops import volumetric_pallas as vp

            lane_order = np.argsort(vp.march_length(obj, ro_all, rd_all, ed))
        else:
            lane_order = np.argsort(ed)
        nn, kk = nn[lane_order], kk[lane_order]
        ro_all, rd_all, ed = ro_all[lane_order], rd_all[lane_order], ed[lane_order]
        obs_all = geo.observer_energy[nn]
        pt_all = geo.p_t[nn]
        pphi_all = geo.p_phi[nn]
        for start in range(0, nn.size, vol_chunk):
            end = min(start + vol_chunk, nn.size)
            m = end - start
            pad = lambda a: np.concatenate(
                [a[start:end], np.repeat(a[start : start + 1], vol_chunk - m, axis=0)]
            )
            active = np.zeros((vol_chunk,), bool)
            active[:m] = True
            if kernel is not None:
                out = jax.device_get(
                    kernel(
                        put(pad(ro_all)),
                        put(pad(rd_all)),
                        put(pad(obs_all)),
                        put(pad(pt_all)),
                        put(pad(pphi_all)),
                        put(active),
                        put(np.where(active, pad(ed), 0.0)),
                    )
                )
            else:
                out = jax.device_get(
                    _raymarch_compact(
                        obj,
                        scene.geometry,
                        put(pad(ro_all)),
                        put(pad(rd_all)),
                        put(pad(obs_all)),
                        put(pad(pt_all)),
                        put(pad(pphi_all)),
                        put(active),
                    )
                )
            ev_colors[nn[start:end], kk[start:end]] = out[:m]
    color, klass = scn.fold_samples(
        scene,
        jnp.asarray(geo.ev_kind),
        jnp.asarray(ev_colors),
        jnp.asarray(geo.stop_code),
        jnp.asarray(geo.celestial),
    )
    return np.asarray(color), np.asarray(klass), np.asarray(geo.stop_code), np.asarray(geo.ev_overflow)


# Event capacity for the overflow re-trace (reference event recording is
# unbounded, scene.rs:141-152; 32 covers any physically sensible crossing
# count — beyond that the lane keeps its truncated fold and is logged).
OVERFLOW_MAX_EVENTS = 32
OVERFLOW_BUCKET = 256


@jax.jit
def _retrace_chunk(scene, row_f, col_f):
    """Lax-path re-trace for event-buffer-overflow lanes (scene carries the
    boosted max_events; a distinct static config → its own cached compile)."""
    x, p = cam.pixel_rays(scene.camera, row_f, col_f)
    s = scn.trace_rays(scene, x, p)
    return _wire(s.color, s.ray_class, s.stop_code, s.ev_overflow)


def _retrace_overflow(scene, rf, cf, idx, colors_c, classes_c, stop_c):
    """Re-trace the (rare) lanes whose K-slot event buffer dropped crossings
    — photon-ring grazers produce higher-order disc images beyond the buffer
    cap; the reference records every crossing (scene.rs:141-152). Lanes are
    compacted into a fixed-size bucket and run through the lax path with a
    4× event capacity."""
    hi = scene.replace(integration=scene.integration.replace(max_events=OVERFLOW_MAX_EVENTS))
    bucket = OVERFLOW_BUCKET
    while bucket < idx.size:
        bucket *= 2
    pad_idx = np.concatenate([idx, np.full(bucket - idx.size, idx[0], idx.dtype)])
    c, k, s, ovf = jax.device_get(
        _retrace_chunk(hi, jnp.asarray(rf[pad_idx]), jnp.asarray(cf[pad_idx]))
    )
    colors_c[idx] = _unwire(np.asarray(c))[: idx.size]
    classes_c[idx] = k[: idx.size]
    stop_c[idx] = s[: idx.size]
    if np.asarray(ovf[: idx.size]).any():
        print(
            f"[raytracer] {int(np.asarray(ovf[:idx.size]).sum())} lanes still "
            f"overflow {OVERFLOW_MAX_EVENTS} events after re-trace",
            file=sys.stderr,
        )


class ChunkCheckpoint:
    """Crash-safe partial-frame store for long renders.

    The reference's only partial-work primitive is the section render
    (raytracer.rs:460; an external script must stitch crops). This goes
    further: the chunked driver appends each completed chunk's results to an
    .npz (atomic tmp+rename), so an interrupted multi-hour render resumes at
    the last completed chunk instead of ray zero. `key` must encode
    everything that determines the ray stream (scene digest, shape, section,
    stage) — a mismatch silently starts fresh."""

    def __init__(self, path: str, key: str):
        self.path = str(path)
        self.key = str(key)

    def load(self, n: int, chunk_size: int):
        """(resume_at, colors, classes, ok) — resume_at is 0 with no/stale
        checkpoint; arrays are None in that case."""
        try:
            d = np.load(self.path, allow_pickle=False)
        except (FileNotFoundError, OSError, ValueError):
            return 0, None, None, None
        if (
            str(d["key"]) != self.key
            or int(d["n"]) != n
            or int(d["chunk_size"]) != chunk_size
        ):
            return 0, None, None, None
        return int(d["upto"]), d["colors"], d["classes"], d["ok"]

    def save(self, upto: int, colors, classes, ok, n: int, chunk_size: int):
        tmp = self.path + ".tmp"
        with open(tmp, "wb") as f:
            np.savez_compressed(
                f,
                key=self.key,
                n=n,
                chunk_size=chunk_size,
                upto=upto,
                colors=colors,
                classes=classes,
                ok=ok,
            )
        os.replace(tmp, self.path)

    def remove(self):
        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass


def trace_pixels_chunked(
    scene,
    row_f,
    col_f,
    chunk_size: int,
    progress: bool = False,
    mesh=None,
    checkpoint: Optional[ChunkCheckpoint] = None,
    checkpoint_every: int = 4,
):
    """Trace arbitrary (fractional) pixel coords in fixed-size chunks.
    Returns (color [N, 4], ray_class [N], ok [N]) as numpy arrays; ok=False
    marks failed rays (controller retry overflow or shading error) that the
    reference would exclude from supersample averages (raytracer.rs:355-380).

    With `mesh` (a 1-D device mesh), every chunk is sharded over the mesh and
    ALL dispatch paths run multi-device: the lax/requeue/split paths are
    GSPMD-partitioned (rays are a pure batch axis, so partitioning inserts
    zero collectives), the Pallas fast path goes through an explicit
    shard_map (parallel/mesh.py). This is the single driver the single-chip
    CLI and the pod-slice renderer share (SURVEY.md §2.5)."""
    n = row_f.shape[0]
    dtype = np.float32 if scene.camera.position.dtype == jnp.float32 else np.float64
    put = jnp.asarray
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = mesh.devices.size
        chunk_size = max(chunk_size // n_dev, 1) * n_dev
        sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
        put = lambda a: jax.device_put(jnp.asarray(a), sharding)
    colors = np.zeros((n, 4), dtype)
    classes = np.zeros((n,), np.int32)
    ok_all = np.ones((n,), bool)
    resume_at = 0
    if checkpoint is not None:
        resume_at, c0, k0, ok0 = checkpoint.load(n, chunk_size)
        if resume_at:
            colors[:resume_at] = c0[:resume_at]
            classes[:resume_at] = k0[:resume_at]
            ok_all[:resume_at] = ok0[:resume_at]
            print(
                f"[raytracer] resuming from checkpoint at ray {resume_at}/{n}",
                file=sys.stderr,
            )
    split = _has_volumetric(scene)
    fast = not split and _use_fast_path(scene)
    # Requeue compaction pays when the budget dwarfs a phase (its savings
    # come from not holding the whole chunk for the slow tail); below that
    # the per-phase host syncs cost more than they save. It is a LAX-path
    # lever only: the fast path handles large budgets inside the kernel
    # (cost-sorted blocks exit early; a kernel-level phased variant was
    # measured slower in every regime and removed — see fast_path.py).
    # Ordering regression note: routing
    # fast-path scenes through the lax requeue at high budgets made hero
    # render #4 4.3x slower (959 s vs 224 s baseline, r2 session 4).
    cfg_i = scene.integration
    requeue = (
        not fast and (cfg_i.max_steps + cfg_i.extra_attempts) > 2 * PHASE_ATTEMPTS
    )
    t_start = time.time()

    def _drain(chunk):
        """Fetch a dispatched chunk's results and scatter them into the output
        buffers. For the pipelined paths the arrays are still in flight on the
        device; device_get is the fence (and a no-op on host arrays)."""
        start, end, m, rf, cf, arrs = chunk
        c, k, stop, ovf = (np.array(a) for a in jax.device_get(arrs))
        c = _unwire(c)
        ovf_idx = np.nonzero(ovf[:m])[0]
        if ovf_idx.size:
            _retrace_overflow(scene, rf, cf, ovf_idx, c, k, stop)
        colors[start:end] = c[:m]
        classes[start:end] = k[:m]
        ok_all[start:end] = stop[:m] != scn.integ.STEP_FAILED
        if checkpoint is not None and (
            end == n or (end // chunk_size) % max(checkpoint_every, 1) == 0
        ):
            checkpoint.save(end, colors, classes, ok_all, n, chunk_size)
        if progress:
            rate = (end - resume_at) / max(time.time() - t_start, 1e-9)
            eta = (n - end) / max(rate, 1e-9)
            print(
                f"\r  traced {end}/{n} rays ({rate:.0f} rays/s, eta {eta:.0f}s)",
                end="",
                file=sys.stderr,
            )

    # One-deep dispatch pipeline: the NEXT chunk is enqueued before the
    # current one is drained, so host-side work (numpy prep, overflow
    # re-trace, scatter) overlaps the device computing the next chunk.
    # The compact-wire split path pipelines its geometric pass the same
    # way (chunk i+1's geo march is enqueued before chunk i's host work —
    # sort, raymarch batching, fold — so the device never idles on the
    # host between chunks); the full-wire split and requeue drivers
    # synchronize with the host between internal phases, so they drain
    # in-line.
    fused_pipe = split and _fused_split_eligible(scene)
    compact_pipe = (
        split
        and not fused_pipe
        and os.environ.get("GR_COMPACT_PIPE", "1") != "0"
        and _compact_split_eligible(scene, put)
    )
    kernel_c = _vol_kernel_fn(scene.objects[0], scene.geometry)[1] if compact_pipe else None
    pending = None
    pending_c = None

    def _drain_compact(chunk):
        start, end, m, rf, cf, futs, bucket = chunk
        if fused_pipe:
            out = _trace_chunk_split_fused_finish(
                scene, futs, mesh, bucket, rf, cf, put
            )
        else:
            out = _trace_chunk_split_compact_finish(
                scene, rf.size, futs, VOLUMETRIC_LANE_CHUNK, kernel_c
            )
            if out is None:
                # Compact bucket overflowed (rays averaged >2 crossings):
                # rerun this chunk through _trace_chunk_split, which
                # re-attempts compact and then takes the full wire — one
                # wasted geo pass on a rare chunk.
                out = _trace_chunk_split(scene, rf, cf, put=put)
        _drain((start, end, m, rf, cf, out))

    for start in range(resume_at, n, chunk_size):
        end = min(start + chunk_size, n)
        m = end - start
        rf = np.full((chunk_size,), row_f[0], dtype)
        cf = np.full((chunk_size,), col_f[0], dtype)
        rf[:m] = row_f[start:end]
        cf[:m] = col_f[start:end]
        if fused_pipe:
            t0 = time.perf_counter() if _SPLIT_TIMING_ON else 0.0
            bucket = max(
                2 * chunk_size,
                _fused_bucket_hint.get(_fused_hint_key(scene, chunk_size), 0),
            )
            futs = _trace_chunk_split_fused_start(scene, rf, cf, put, mesh, bucket)
            if _SPLIT_TIMING_ON:
                # Enqueue SHOULD be asynchronous (futures come back before
                # the device finishes); if the tunnel's dispatch queue
                # back-pressures, device compute time surfaces here rather
                # than in fused_drain — keep both keys to tell them apart.
                _t_acc("enqueue", t0)
            nxt = (start, end, m, rf, cf, futs, bucket)
            if pending_c is not None:
                _drain_compact(pending_c)
            pending_c = nxt
            continue
        if compact_pipe:
            t0 = time.perf_counter() if _SPLIT_TIMING_ON else 0.0
            futs = _trace_chunk_split_compact_start(scene, rf, cf)
            if _SPLIT_TIMING_ON:
                _t_acc("enqueue", t0)
            nxt = (start, end, m, rf, cf, futs, 0)
            if pending_c is not None:
                _drain_compact(pending_c)
            pending_c = nxt
            continue
        if split or requeue:
            if pending is not None:
                _drain(pending)
                pending = None
            fn = _trace_chunk_split if split else _trace_chunk_requeued
            _drain((start, end, m, rf, cf, fn(scene, rf, cf, put=put)))
            continue
        if fast:
            arrs = _trace_chunk_fast(scene, put(rf), put(cf), mesh=mesh)
        else:
            arrs = _trace_chunk(scene, put(rf), put(cf))
        nxt = (start, end, m, rf, cf, arrs)
        if pending is not None:
            _drain(pending)
        pending = nxt
    if pending_c is not None:
        _drain_compact(pending_c)
    if pending is not None:
        _drain(pending)
    if progress:
        print(file=sys.stderr)
    return colors, classes, ok_all


# ---------------------------------------------------------------------------
# Render driver
# ---------------------------------------------------------------------------


class RenderOutput(NamedTuple):
    color: np.ndarray  # [H, W, 4] CIE XYZA
    ray_class: np.ndarray  # [H, W]
    supersample_mask: Optional[np.ndarray]  # [H, W] bool (None if AA disabled)


def render_section(
    scene,
    from_row: int = 0,
    from_col: int = 0,
    to_row: Optional[int] = None,
    to_col: Optional[int] = None,
    chunk_size: int = 65536,
    sampling_mask_color: Optional[tuple] = None,
    progress: bool = False,
    mesh=None,
    checkpoint_path: Optional[str] = None,
    checkpoint_key: str = "",
    halo: bool = False,
) -> RenderOutput:
    """Render a section [from_row, to_row) × [from_col, to_col) of the camera
    grid, with the scene's adaptive supersampling (raytracer.rs:460-497).

    With sampling_mask_color set (an XYZA tuple), selected pixels are painted
    instead of re-traced (--show-sampling-mask).

    With checkpoint_path set, each pass saves completed chunks to
    `<path>.pass1.npz` / `<path>.aa.npz` and resumes from them; pass
    `checkpoint_key` encoding the scene/options so stale files are ignored.
    The caller removes the files after a successful save (see cli.cmd_render).

    halo=True: seam-free sectioned AA — beyond the reference, whose section
    renders keep a documented 1-px seam because the 8-neighbor contrast
    stencil can't see across the crop edge (raytracer.rs:413-421). The
    first pass traces one extra pixel ring around the section (clipped to
    the camera grid), the stencil runs on the padded buffer, and the halo is
    discarded — section AA selection becomes identical to the full frame's,
    so stitched sections are bit-exact against the single-frame render
    whenever the luminance floor is explicit (cfg.minimum_luminance; a
    percentile floor is inherently frame-global — the reference documents
    the same caveat, configuration.rs:30-36)."""
    camera = scene.camera
    to_row = camera.rows if to_row is None else to_row
    to_col = camera.columns if to_col is None else to_col
    h, w = to_row - from_row, to_col - from_col
    ckpt = lambda stage: (
        ChunkCheckpoint(f"{checkpoint_path}.{stage}.npz", f"{checkpoint_key}:{stage}")
        if checkpoint_path
        else None
    )

    cfg = scene.adaptive
    aa_active = cfg.enabled or sampling_mask_color is not None
    # Halo bounds (clipped at the camera grid — frame-edge pixels see
    # exactly the edge, matching the full-frame stencil there).
    use_halo = halo and aa_active
    hf_row = max(from_row - 1, 0) if use_halo else from_row
    hf_col = max(from_col - 1, 0) if use_halo else from_col
    ht_row = min(to_row + 1, camera.rows) if use_halo else to_row
    ht_col = min(to_col + 1, camera.columns) if use_halo else to_col
    hh, hw = ht_row - hf_row, ht_col - hf_col

    rr, cc = np.meshgrid(
        np.arange(hf_row, ht_row, dtype=np.float64),
        np.arange(hf_col, ht_col, dtype=np.float64),
        indexing="ij",
    )
    colors, classes, _ = trace_pixels_chunked(
        scene, rr.ravel(), cc.ravel(), chunk_size, progress, mesh=mesh,
        checkpoint=ckpt("pass1"),
    )
    colors = colors.reshape(hh, hw, 4)
    classes = classes.reshape(hh, hw)
    # Interior slice of the (possibly padded) buffer.
    ir = slice(from_row - hf_row, from_row - hf_row + h)
    ic = slice(from_col - hf_col, from_col - hf_col + w)

    if scene.save_ray_data:
        rr_i, cc_i = np.meshgrid(
            np.arange(from_row, to_row, dtype=np.float64),
            np.arange(from_col, to_col, dtype=np.float64),
            indexing="ij",
        )
        _save_ray_data_csvs(scene, rr_i.ravel(), cc_i.ravel())

    if not aa_active:
        return RenderOutput(colors, classes, None)

    minimum_luminance = resolve_minimum_luminance(cfg, colors[..., 1])
    mask = collect_supersample_mask(
        cfg, colors[..., 1], colors[..., 3], classes, minimum_luminance
    )
    # Discard the halo: AA re-traces interior pixels only, with the mask
    # decided exactly as the full frame would.
    colors = colors[ir, ic]
    classes = classes[ir, ic]
    mask = mask[ir, ic]

    if sampling_mask_color is not None:
        out = colors.copy()
        out[mask] = np.asarray(sampling_mask_color, colors.dtype)
        return RenderOutput(out, classes, mask)

    sel_r, sel_c = np.nonzero(mask)
    if sel_r.size:
        from gr_raytracer_tpu import native

        n_spp = cfg.samples_per_axis**2
        abs_r = sel_r + from_row
        abs_c = sel_c + from_col
        dx, dy = native.stratified_offsets(abs_r, abs_c, cfg.samples_per_axis)
        # get_ray_for_offset: row + (dy − ½), col + (dx − ½) (camera.rs:247-254)
        row_f = (abs_r[:, None] + (dy - 0.5)).ravel()
        col_f = (abs_c[:, None] + (dx - 0.5)).ravel()
        sub_colors, _, sub_ok = trace_pixels_chunked(
            scene, row_f, col_f, chunk_size, progress, mesh=mesh,
            checkpoint=ckpt("aa"),
        )
        # Average over SUCCESSFUL samples only — a failed sub-ray must not
        # drag the pixel toward black; all-failed keeps the 1-spp base color
        # (raytracer.rs:355-380).
        ok = sub_ok.reshape(-1, n_spp)
        n_ok = ok.sum(axis=1)
        sums = (sub_colors.reshape(-1, n_spp, 4) * ok[..., None]).sum(axis=1)
        averaged = sums / np.maximum(n_ok, 1)[:, None]
        use = n_ok > 0
        colors[sel_r[use], sel_c[use]] = averaged[use]
    return RenderOutput(colors, classes, mask)


def _save_ray_data_csvs(scene, row_f, col_f):
    """scene.save_ray_data debug flag: write ray-{row}-{col}.csv for every
    traced pixel (scene.rs:128-133; CSV schema ray.rs:35-54). The reference
    writes inside color_of_ray per ray; here the trajectories are recorded in
    one batched scan after the render pass — same files, same content."""
    import jax.numpy as jnp

    from gr_raytracer_tpu.cli import _save_trajectory_csv
    from gr_raytracer_tpu.rendering import integrator as integ

    geometry = scene.geometry
    dtype = scene.camera.position.dtype
    rows = jnp.asarray(row_f, dtype)
    cols = jnp.asarray(col_f, dtype)
    x, p = cam.pixel_rays(scene.camera, rows, cols)
    solver = geometry.make_solver(x, p)
    y0 = solver.initial_state(x, p)
    states, affine, valid, _ = integ.integrate_trajectory(
        geometry, solver, scene.integration, y0, max_record=scene.integration.max_steps
    )
    states = np.asarray(states)  # [S, N, 8]
    affine = np.asarray(affine)
    valid = np.asarray(valid)
    for i in range(states.shape[1]):
        v = valid[:, i]
        _save_trajectory_csv(
            f"ray-{int(row_f[i])}-{int(col_f[i])}.csv",
            states[v, i],
            affine[v, i],
            np.ones(int(v.sum()), bool),
            solver.chart,
            geometry.spin,
        )


# ---------------------------------------------------------------------------
# Output formats
# ---------------------------------------------------------------------------


def write_image(path: str, output_color: np.ndarray, tone_mapping: str = col.TONE_MAPPING_REINHARD):
    """Write [H, W, 4] XYZA: Radiance .hdr (raw XYZ) or tone-mapped 8-bit.
    PNG encoding goes through the native library when available (native.py),
    with PIL as the fallback."""
    if path.endswith(".hdr"):
        write_radiance_hdr(path, output_color[..., :3].astype(np.float32))
        return
    img = np.asarray(
        col.xyza_buffer_to_srgb8(jnp.asarray(output_color), method=tone_mapping)
    )
    if path.endswith(".png"):
        from gr_raytracer_tpu import native

        data = native.png_encode(img)
        if data is not None:
            with open(path, "wb") as f:
                f.write(data)
            return
    from PIL import Image

    Image.fromarray(img).save(path)


def write_radiance_hdr(path: str, rgb: np.ndarray):
    """Minimal Radiance RGBE writer (flat scanlines, universally readable).
    Uses the native encoder when available."""
    from gr_raytracer_tpu import native

    h, w, _ = rgb.shape
    rgbe_native = native.rgbe_encode(np.maximum(rgb, 0.0).astype(np.float32))
    if rgbe_native is not None:
        with open(path, "wb") as f:
            f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
            f.write(f"-Y {h} +X {w}\n".encode())
            f.write(rgbe_native.tobytes())
        return
    rgb = np.maximum(rgb, 0.0).astype(np.float64)
    v = rgb.max(axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        mant, exp = np.frexp(v)
        scale = np.where(v >= 1e-32, mant * 256.0 / np.maximum(v, 1e-300), 0.0)
    rgbe = np.zeros((h, w, 4), np.uint8)
    rgbe[..., :3] = np.clip(rgb * scale[..., None], 0, 255).astype(np.uint8)
    rgbe[..., 3] = np.where(v >= 1e-32, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())
