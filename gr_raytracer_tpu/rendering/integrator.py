"""Batched geodesic integrator with fused streaming intersection.

THE key structural difference from the reference: the reference records the
full trajectory per ray (Vec<Step>, integrator.rs:86-117) and intersects
post-hoc over consecutive step pairs (scene.rs:141-152). That is O(max_steps)
memory per ray — unaffordable for 10⁶-step Kerr rays on TPU. Here every ray
batch advances through ONE lax.while_loop; each accepted step immediately
tests the (x_prev → x_new) segment against the scene and folds the result
into a bounded per-ray *event buffer* (ordered along the ray), keeping memory
O(1) in step count.

Adaptive step control is SIMD-ized: a rejected lane just doesn't advance that
iteration (rkf45.py). Done lanes are masked out; NaNs never cross lanes.

Stop-reason priority matches integrator.rs:203-268:
  non-finite position > horizon > trapped orbit > celestial sphere >
  non-finite momentum.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.rendering import rkf45

# Stop codes (order encodes render semantics, not priority).
RUNNING = 0
HORIZON = 1  # -> opaque black, Captured
CELESTIAL = 2  # -> celestial texture, Escaped
NAN = 3  # -> degenerate ray, Captured (scene.rs:178-190)
TRAPPED = 4  # closed orbit -> opaque black, Captured
BUDGET = 5  # max_steps exhausted, no stop reason -> Captured (scene.rs:196-205)
STEP_FAILED = 6  # controller retry overflow -> default sample (raytracer.rs:232-239)
# Kernel fast path only: the march stopped early because an opaque object hit
# saturated the alpha fold — everything behind the first event is invisible
# (front-to-back fold transmittance hits 0), so color and ray class are exact;
# only the stop code differs from a full march (it cannot know whether the ray
# would have ended HORIZON or CELESTIAL). fold_samples treats it like any
# non-escaped terminal (opaque black at weight 0).
SATURATED = 7


class IntegrationConfig(struct.PyTreeNode):
    """Integration budget (reference: integrator.rs:46-67, cli defaults
    cli.rs:10-20). max_steps/max_events/extra_attempts are static."""

    max_radius: jnp.ndarray
    step_size: jnp.ndarray
    epsilon: jnp.ndarray
    max_steps: int = struct.field(pytree_node=False, default=20000)
    max_events: int = struct.field(pytree_node=False, default=8)
    # Extra while-loop iterations granted beyond max_steps to absorb
    # controller retries (rejected trials don't advance a lane's step count).
    extra_attempts: int = struct.field(pytree_node=False, default=256)
    track_invariants: bool = struct.field(pytree_node=False, default=False)
    # Reverse-mode-differentiable loop: a lax.scan over fixed step blocks with
    # jax.checkpoint on each block (O(attempts/block + block) residual memory
    # instead of O(attempts)), each block gated by a scalar all-lanes-stopped
    # cond so a finished batch pays for the blocks it actually marches, in
    # BOTH passes. Still costlier than the while_loop/kernel forward paths —
    # keep it for gradient passes, not plain renders.
    differentiable: bool = struct.field(pytree_node=False, default=False)
    checkpoint_block: int = struct.field(pytree_node=False, default=32)


class IntegrationResult(NamedTuple):
    y: jnp.ndarray  # [N, 8] final state
    affine: jnp.ndarray  # [N] affine parameter reached
    steps: jnp.ndarray  # [N] accepted step count
    stop_code: jnp.ndarray  # [N] int32
    ev_kind: jnp.ndarray  # [N, K] int32 object index, -1 = empty
    ev_data: jnp.ndarray  # [N, K, D] per-event payload
    ev_count: jnp.ndarray  # [N]
    ev_overflow: jnp.ndarray  # [N] bool — events dropped (buffer full)
    kk_drift: jnp.ndarray  # [N] max |k·k| along ray (0 if untracked)
    const_drift: jnp.ndarray  # [N, C] max relative drift of conserved scalars
    # Continuation state for phased/requeued integration (raytracer.py):
    h: jnp.ndarray  # [N] current step size
    retries: jnp.ndarray  # [N] consecutive controller rejections


def integrate_rays(
    geometry,
    solver,
    cfg: IntegrationConfig,
    y0: jnp.ndarray,
    segment_fn: Callable,
    event_width: int,
    resume: "IntegrationResult | None" = None,
    attempts_budget: "int | None" = None,
    finalize: bool = True,
):
    """Integrate a batch of rays, streaming segment events.

    segment_fn(x_prev, cart_prev, p_prev, x_new, cart_new, p_new)
        -> (hit [N] bool, kind [N] int32, data [N, event_width])
    is called once per accepted step with native-chart positions, their
    Cartesian embeddings, and contravariant momenta at both segment ends. It
    must be NaN-tolerant (hit=False on NaN input).

    Phased mode (driver requeue compaction): pass `attempts_budget` to bound
    this call's iterations, `finalize=False` to leave unfinished lanes
    RUNNING instead of coercing them to BUDGET, and a previous call's
    `resume` result to continue from its state (y0 is ignored then except
    for its dtype/shape).
    """
    chart = solver.chart
    spin = geometry.spin
    n = y0.shape[0]
    dtype = y0.dtype
    k_ev = cfg.max_events

    x0 = y0[..., :4]
    p0_contra = solver.momentum(y0)
    cart0 = charts.to_cartesian(x0, chart, spin)

    if cfg.track_invariants:
        init_consts = geometry.constants_of_motion(x0, p0_contra)
        const_names = sorted(init_consts.keys())
        init_const_vec = (
            jnp.stack([init_consts[k] for k in const_names], axis=-1)
            if const_names
            else jnp.zeros((n, 0), dtype)
        )
    else:
        const_names = []
        init_const_vec = jnp.zeros((n, 0), dtype)
    n_consts = init_const_vec.shape[-1]

    max_radius_sq = cfg.max_radius * cfg.max_radius

    if resume is None:
        carry0 = dict(
            y=y0,
            t=jnp.zeros((n,), dtype),
            h=jnp.clip(jnp.full((n,), cfg.step_size, dtype), rkf45.H_MIN, rkf45.H_MAX),
            steps=jnp.zeros((n,), jnp.int32),
            retries=jnp.zeros((n,), jnp.int32),
            stop=jnp.zeros((n,), jnp.int32),
            cart_prev=cart0,
            p_prev=p0_contra,
            ev_kind=jnp.full((n, k_ev), -1, jnp.int32),
            ev_data=jnp.zeros((n, k_ev, event_width), dtype),
            ev_count=jnp.zeros((n,), jnp.int32),
            ev_overflow=jnp.zeros((n,), bool),
            attempts=jnp.zeros((), jnp.int32),
            kk_drift=jnp.zeros((n,), dtype),
            const_drift=jnp.zeros((n, n_consts), dtype),
        )
    else:
        # cart_prev/p_prev are functions of the resumed state; recompute.
        x_r = resume.y[..., :4]
        carry0 = dict(
            y=resume.y,
            t=resume.affine,
            h=resume.h,
            steps=resume.steps,
            retries=resume.retries,
            stop=resume.stop_code,
            cart_prev=charts.to_cartesian(x_r, chart, spin),
            p_prev=solver.momentum(resume.y),
            ev_kind=resume.ev_kind,
            ev_data=resume.ev_data,
            ev_count=resume.ev_count,
            ev_overflow=resume.ev_overflow,
            attempts=jnp.zeros((), jnp.int32),
            kk_drift=resume.kk_drift,
            const_drift=resume.const_drift,
        )

    max_attempts = (
        attempts_budget if attempts_budget is not None else cfg.max_steps + cfg.extra_attempts
    )

    def cond(c):
        return jnp.any(c["stop"] == RUNNING) & (c["attempts"] < max_attempts)

    def body(c):
        active = c["stop"] == RUNNING
        y, h = c["y"], c["h"]

        if cfg.differentiable:
            # NaN discipline for reverse mode (SURVEY §7 hard part 4): a lane
            # that diverged holds NaN state; evaluating the RHS there would
            # give a NaN Jacobian, and Jᵀ·0 ≠ 0 once J has NaNs. Feed stopped/
            # non-finite lanes a benign far-field state instead — their
            # outputs are masked out by `adv` anyway (select VJPs scatter
            # exact zeros, so the substitution never leaks into gradients).
            safe_state = jnp.zeros_like(y).at[..., 1].set(10.0)
            lane_ok = jnp.all(jnp.isfinite(y), axis=-1) & active
            y_rhs = jnp.where(lane_ok[:, None], y, safe_state)
        else:
            y_rhs = y

        y_trial, err = rkf45.rkf45_step(solver.rhs, y_rhs, h)
        accept, h_acc, h_rej = rkf45.controller(h, err, cfg.epsilon)

        retry_overflow = (~accept) & (c["retries"] + 1 >= rkf45.MAX_RETRIES)
        adv = active & accept
        rejected = active & ~accept

        y_new = jnp.where(adv[:, None], y_trial, y)
        t_new = jnp.where(adv, c["t"] + h, c["t"])
        h_new = jnp.where(active, jnp.where(accept, h_acc, h_rej), h)
        retries = jnp.where(adv, 0, jnp.where(rejected, c["retries"] + 1, c["retries"]))
        steps = c["steps"] + adv.astype(jnp.int32)

        # --- stop determination (priority order, integrator.rs:203-268) ----
        xn = y_new[..., :4]
        pos_finite = jnp.all(jnp.isfinite(xn), axis=-1)
        horizon = geometry.inside_horizon(xn)
        trapped = geometry.closed_orbit(xn, steps, cfg.max_steps)
        cart_new = charts.to_cartesian(xn, chart, spin)
        rho_sq = cart_new[..., 1] ** 2 + cart_new[..., 2] ** 2 + cart_new[..., 3] ** 2
        escaped = rho_sq > max_radius_sq
        mom_finite = jnp.all(jnp.isfinite(y_new[..., 4:8]), axis=-1)

        code = jnp.full_like(c["stop"], RUNNING)
        code = jnp.where(~mom_finite, NAN, code)
        code = jnp.where(escaped, CELESTIAL, code)
        code = jnp.where(trapped, TRAPPED, code)
        code = jnp.where(horizon, HORIZON, code)
        code = jnp.where(~pos_finite, NAN, code)
        # Budget exhausted without a stop reason (the reference's `None`).
        code = jnp.where((code == RUNNING) & (steps >= cfg.max_steps - 1), BUDGET, code)

        new_stop = jnp.where(adv, code, c["stop"])
        new_stop = jnp.where(rejected & retry_overflow, STEP_FAILED, new_stop)

        # --- streaming intersection on the accepted segment ----------------
        p_new = solver.momentum(y_new)
        hit, kind, data = segment_fn(
            y[..., :4], c["cart_prev"], c["p_prev"], xn, cart_new, p_new
        )
        store = hit & adv

        def apply_events(ops):
            ev_kind0, ev_data0, ev_count0, ev_overflow0 = ops
            can_store = store & (ev_count0 < k_ev)
            slot = jnp.arange(k_ev, dtype=jnp.int32)[None, :] == ev_count0[:, None]
            slot = slot & can_store[:, None]
            return (
                jnp.where(slot, kind[:, None], ev_kind0),
                jnp.where(slot[..., None], data[:, None, :], ev_data0),
                ev_count0 + can_store.astype(jnp.int32),
                ev_overflow0 | (store & (ev_count0 >= k_ev)),
            )

        # The event buffer is the fat part of the carry (~K·D floats/ray);
        # most iterations store nothing, so skip the whole rewrite unless
        # some lane hit this step (lax.cond keeps the false branch a no-op).
        ev_kind, ev_data, ev_count, ev_overflow = lax.cond(
            jnp.any(store),
            apply_events,
            lambda ops: ops,
            (c["ev_kind"], c["ev_data"], c["ev_count"], c["ev_overflow"]),
        )

        cart_prev = jnp.where(adv[:, None], cart_new, c["cart_prev"])
        p_prev = jnp.where(adv[:, None], p_new, c["p_prev"])

        # --- optional invariant-drift monitor (integrator.rs:91-146) -------
        kk_drift = c["kk_drift"]
        const_drift = c["const_drift"]
        if cfg.track_invariants:
            kk = jnp.abs(geometry.inner_product(xn, p_new, p_new))
            kk_drift = jnp.where(adv, jnp.maximum(kk_drift, kk), kk_drift)
            if n_consts:
                cur = geometry.constants_of_motion(xn, p_new)
                cur_vec = jnp.stack([cur[k] for k in const_names], axis=-1)
                denom = jnp.where(jnp.abs(init_const_vec) > 1e-12, jnp.abs(init_const_vec), 1.0)
                drift = jnp.abs(cur_vec - init_const_vec) / denom
                const_drift = jnp.where(
                    adv[:, None], jnp.maximum(const_drift, drift), const_drift
                )

        return dict(
            y=y_new,
            t=t_new,
            h=h_new,
            steps=steps,
            retries=retries,
            stop=new_stop,
            cart_prev=cart_prev,
            p_prev=p_prev,
            ev_kind=ev_kind,
            ev_data=ev_data,
            ev_count=ev_count,
            ev_overflow=ev_overflow,
            attempts=c["attempts"] + 1,
            kk_drift=kk_drift,
            const_drift=const_drift,
        )

    if cfg.differentiable:
        block = cfg.checkpoint_block

        @jax.checkpoint
        def run_block(c):
            return lax.scan(lambda cc, _: (body(cc), None), c, None, length=block)[0]

        def maybe_block(c, _):
            # Reverse-mode-safe early exit: once every lane has stopped, the
            # remaining blocks take the identity branch — lax.cond on a
            # SCALAR predicate executes one branch at runtime (forward AND
            # backward: its linearization is again a cond), so a batch whose
            # lanes all finish in k steps pays O(k), not O(max_attempts),
            # in both passes. With lanes still RUNNING the block body is
            # bit-identical to the ungated scan (a no-active-lane `body`
            # call is itself a no-op on every carry field the result reads,
            # so gating changes nothing but the cost).
            return (
                lax.cond(jnp.any(c["stop"] == RUNNING), run_block, lambda x: x, c),
                None,
            )

        n_blocks = -(-max_attempts // block)
        final = lax.scan(maybe_block, carry0, None, length=n_blocks)[0]
    else:
        final = lax.while_loop(cond, body, carry0)
    if finalize:
        # Lanes still RUNNING at the attempt cap: classify as budget-exhausted.
        stop = jnp.where(final["stop"] == RUNNING, BUDGET, final["stop"])
    else:
        stop = final["stop"]
    return IntegrationResult(
        y=final["y"],
        affine=final["t"],
        steps=final["steps"],
        stop_code=stop,
        ev_kind=final["ev_kind"],
        ev_data=final["ev_data"],
        ev_count=final["ev_count"],
        ev_overflow=final["ev_overflow"],
        kk_drift=final["kk_drift"],
        const_drift=final["const_drift"],
        h=final["h"],
        retries=final["retries"],
    )


def no_objects_segment_fn(event_width: int = 1):
    """segment_fn for object-free scenes (trajectory export, tests)."""

    def fn(x_prev, cart_prev, p_prev, x_new, cart_new, p_new):
        n = x_prev.shape[0]
        return (
            jnp.zeros((n,), bool),
            jnp.zeros((n,), jnp.int32),
            jnp.zeros((n, event_width), x_prev.dtype),
        )

    return fn


def integrate_trajectory(geometry, solver, cfg: IntegrationConfig, y0, max_record: int):
    """Record a full trajectory for ray-export tooling (render-ray CSV).

    Uses lax.scan with a *fixed* record length — a debug path for a handful of
    rays, not the render path (the render path never materializes steps).
    Returns (states [S, N, 8], affine [S, N], valid [S, N], stop [N]).
    """
    n = y0.shape[0]
    dtype = y0.dtype

    carry0 = dict(
        y=y0,
        t=jnp.zeros((n,), dtype),
        h=jnp.clip(jnp.full((n,), cfg.step_size, dtype), rkf45.H_MIN, rkf45.H_MAX),
        steps=jnp.zeros((n,), jnp.int32),
        retries=jnp.zeros((n,), jnp.int32),
        stop=jnp.zeros((n,), jnp.int32),
    )
    chart = solver.chart
    spin = geometry.spin
    max_radius_sq = cfg.max_radius * cfg.max_radius

    def step(c, _):
        active = c["stop"] == RUNNING
        y, h = c["y"], c["h"]
        y_trial, err = rkf45.rkf45_step(solver.rhs, y, h)
        accept, h_acc, h_rej = rkf45.controller(h, err, cfg.epsilon)
        retry_overflow = (~accept) & (c["retries"] + 1 >= rkf45.MAX_RETRIES)
        adv = active & accept
        rejected = active & ~accept
        y_new = jnp.where(adv[:, None], y_trial, y)
        t_new = jnp.where(adv, c["t"] + h, c["t"])
        h_new = jnp.where(active, jnp.where(accept, h_acc, h_rej), h)
        retries = jnp.where(adv, 0, jnp.where(rejected, c["retries"] + 1, c["retries"]))
        steps = c["steps"] + adv.astype(jnp.int32)

        xn = y_new[..., :4]
        pos_finite = jnp.all(jnp.isfinite(xn), axis=-1)
        cart_new = charts.to_cartesian(xn, chart, spin)
        rho_sq = cart_new[..., 1] ** 2 + cart_new[..., 2] ** 2 + cart_new[..., 3] ** 2
        mom_finite = jnp.all(jnp.isfinite(y_new[..., 4:8]), axis=-1)
        code = jnp.full_like(c["stop"], RUNNING)
        code = jnp.where(~mom_finite, NAN, code)
        code = jnp.where(rho_sq > max_radius_sq, CELESTIAL, code)
        code = jnp.where(geometry.closed_orbit(xn, steps, cfg.max_steps), TRAPPED, code)
        code = jnp.where(geometry.inside_horizon(xn), HORIZON, code)
        code = jnp.where(~pos_finite, NAN, code)
        code = jnp.where((code == RUNNING) & (steps >= cfg.max_steps - 1), BUDGET, code)
        new_stop = jnp.where(adv, code, c["stop"])
        new_stop = jnp.where(rejected & retry_overflow, STEP_FAILED, new_stop)
        out = dict(y=y_new, t=t_new, h=h_new, steps=steps, retries=retries, stop=new_stop)
        return out, (y_new, t_new, adv)

    final, (ys, ts, valid) = lax.scan(step, carry0, None, length=max_record)
    stop = jnp.where(final["stop"] == RUNNING, BUDGET, final["stop"])
    return ys, ts, valid, stop
