"""Uniform-grid LUT interpolation.

jnp.interp binary-searches per query (~log2(L) serialized gathers per lane);
our LUTs (blackbody log-T grid, Novikov-Thorne radial grid) are uniform, so
the bracketing index is a single multiply — two gathers per lookup total.
Inside the volumetric raymarch loop this is the difference between
gather-bound and ALU-bound.
"""

from __future__ import annotations

import jax.numpy as jnp


def uniform_interp(x, x0, dx, values):
    """Linear interpolation of `values` sampled at x0 + k·dx, clamped at the
    ends (matching jnp.interp's edge behavior on the same grid).

    x: [...] queries; values: [L] or [L, C] (channels interpolated together,
    one index computation). Returns [...] or [..., C]."""
    l = values.shape[0]
    t = (x - x0) / dx
    idx = jnp.clip(jnp.floor(t), 0, l - 2).astype(jnp.int32)
    frac = jnp.clip(t - idx, 0.0, 1.0)
    lo = values[idx]
    hi = values[idx + 1]
    if values.ndim == 2:
        frac = frac[..., None]
    return lo + frac * (hi - lo)
