"""Runge-Kutta-Fehlberg 4(5) embedded step, batched over rays.

Same Butcher tableau and controller semantics as the reference
(src/rendering/runge_kutta.rs): β = 0.9, order-5 exponent, H_MIN/H_MAX step
clamps, 4× growth cap, halve-and-retry on error > ε with accept-at-H_MIN
fallback, ≤100 retries. Here the retry loop is *unrolled into the outer
integration loop*: a rejected lane simply doesn't advance this iteration —
the natural SIMD formulation (all lanes compute, masks select).
"""

from __future__ import annotations

import jax.numpy as jnp

# Butcher tableau (RKF45, https://en.wikipedia.org/wiki/Runge-Kutta-Fehlberg).
_B21 = 2.0 / 9.0
_B31, _B32 = 1.0 / 12.0, 1.0 / 4.0
_B41, _B42, _B43 = 69.0 / 128.0, -243.0 / 128.0, 135.0 / 64.0
_B51, _B52, _B53, _B54 = -17.0 / 12.0, 27.0 / 4.0, -27.0 / 5.0, 16.0 / 15.0
_B61, _B62, _B63, _B64, _B65 = 65.0 / 432.0, -5.0 / 16.0, 13.0 / 16.0, 4.0 / 27.0, 5.0 / 144.0

_CH = (47.0 / 450.0, 0.0, 12.0 / 25.0, 32.0 / 225.0, 1.0 / 30.0, 6.0 / 25.0)
_CT = (1.0 / 150.0, 0.0, -3.0 / 100.0, 16.0 / 75.0, 1.0 / 20.0, -6.0 / 25.0)

BETA = 0.9
ORDER = 5.0
SMALL_ERROR_RATIO = 1e-5
MAX_RETRIES = 100
# Hard cap on a single step: prevents the controller from proposing huge jumps
# in flat regions, which would tunnel rays straight through small scene
# objects (see the reference's H_MAX rationale, runge_kutta.rs:61-76).
H_MAX = 1.0
H_MIN = 1e-12
H_GROWTH_CAP = 4.0


def rkf45_step(rhs, y, h):
    """One embedded RKF45 trial step.

    rhs: [..., D] -> [..., D]; y: [..., D]; h: [...] per-lane step sizes.
    Returns (y5 [..., D], err [...]) with err the l2 norm of the embedded
    truncation-error estimate.
    """
    hh = h[..., None]
    k1 = hh * rhs(y)
    k2 = hh * rhs(y + _B21 * k1)
    k3 = hh * rhs(y + _B31 * k1 + _B32 * k2)
    k4 = hh * rhs(y + _B41 * k1 + _B42 * k2 + _B43 * k3)
    k5 = hh * rhs(y + _B51 * k1 + _B52 * k2 + _B53 * k3 + _B54 * k4)
    k6 = hh * rhs(y + _B61 * k1 + _B62 * k2 + _B63 * k3 + _B64 * k4 + _B65 * k5)

    y_new = y + _CH[0] * k1 + _CH[2] * k3 + _CH[3] * k4 + _CH[4] * k5 + _CH[5] * k6
    te = _CT[0] * k1 + _CT[2] * k3 + _CT[3] * k4 + _CT[4] * k5 + _CT[5] * k6
    # sqrt has an infinite VJP at exactly 0 (which occurs on masked lanes
    # parked at a stationary safe state); double-where keeps err == 0 there
    # with a zero gradient instead of 0·inf = NaN.
    sq = jnp.sum(te * te, axis=-1)
    pos = sq > 0.0
    err = jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)
    return y_new, err


def controller(h, err, epsilon):
    """Step-size controller decisions, batched.

    Returns (accept [...] bool, h_on_accept [...], h_on_reject [...]).
    Matches runge_kutta.rs:138-177: on zero error grow by the cap; proposals
    are clamped to [H_MIN, H_MAX] and at most 4×h; reject halves the proposal;
    a lane already at H_MIN accepts whatever it has.
    """
    proposed = jnp.where(
        err > 0.0,
        BETA * h * jnp.power(epsilon / jnp.maximum(err, jnp.finfo(h.dtype).tiny), 1.0 / ORDER),
        h * H_GROWTH_CAP,
    )
    proposed = jnp.clip(jnp.minimum(proposed, h * H_GROWTH_CAP), H_MIN, H_MAX)

    at_floor = h <= H_MIN
    # NOTE: written as ~(err > ε) so a NaN error estimate is ACCEPTED (Rust's
    # `NaN > ε` is false too) — the integrator's NaN stop then classifies the
    # ray, instead of the controller retrying a poisoned lane forever.
    accept = ~(err > epsilon) | at_floor

    grown = jnp.clip(h * H_GROWTH_CAP, H_MIN, H_MAX)
    h_on_accept = jnp.where(
        at_floor & (err > epsilon),
        h,  # accepted at the floor: keep h
        jnp.where(err / epsilon < SMALL_ERROR_RATIO, grown, proposed),
    )
    h_on_reject = jnp.clip(proposed / 2.0, H_MIN, H_MAX)
    return accept, h_on_accept, h_on_reject
