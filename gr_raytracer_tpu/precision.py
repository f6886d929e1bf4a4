"""Precision-pinned contraction helpers.

Every tensor contraction in this framework is 4-dimensional frame math
(metric contractions, tetrad boosts, color-space transforms) — there are no
large matmuls anywhere in the render pipeline. On TPU (and backends that
mirror its semantics), `jnp.einsum` with default precision evaluates f32
dot_generals with bfloat16 multiply passes, which injects ~1e-2 relative
error into near-cancelling frame expressions: the Lorentz boost of the Kerr
tetrad at the flagship camera position came out with <e0,e0> = -1.0139
instead of -1.0 in f32, breaking camera construction outright (reference
builds its frames in f64 throughout, camera.rs:151-196 / tetrad.rs:60-130).

Pinning HIGHEST costs nothing at contraction length 4 and restores full-f32
accuracy (measured error drops from 7e-3 to ~1e-7). Use this module's
`einsum` for all geometry/shading contractions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

einsum = functools.partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)
