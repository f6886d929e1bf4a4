"""Seedable 3-D Perlin gradient noise + fBm, batched jnp, gather-free.

Classic Perlin uses a 256-entry permutation table; on TPU every lattice-hash
lookup is a dynamic gather, and an fBm octave stack issues ~70 of them per
sample — they serialize on the VPU and dominate the volumetric raymarch.
Instead the lattice hash is computational (uint32 multiply-xor-shift mixing,
Wang-hash finish): pure ALU, fully vectorized, no tables. Everything else
matches Improved Perlin (2002): gradients from the hash low bits, quintic
fade, trilinear blend; value range ≈ [-1, 1], exactly 0 at lattice points.
Matches the reference's `noise` crate semantics closely enough for visual
parity — SURVEY.md stage 9 explicitly does not require a bit-match.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def permutation_table(seed: int) -> np.ndarray:
    """Seed -> uint32 scalar key (API kept for pytree compatibility; the
    'table' is now a computational hash keyed by this value)."""
    key = (int(seed) * 0x9E3779B9 + 1) & 0xFFFFFFFF  # explicit u32 wrap
    return np.asarray(key, np.uint32)


_AX = 0x8DA6B343
_AY = 0xD8163841
_AZ = 0xCB1AB31F


def _mix(h):
    """Wang-style avalanche finish on a combined uint32 lattice term."""
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h


def _hash3(key, ix, iy, iz):
    """uint32 lattice hash: per-axis multiplicative scramble + Wang finish."""
    return _mix(
        ix.astype(jnp.uint32) * jnp.uint32(_AX)
        ^ iy.astype(jnp.uint32) * jnp.uint32(_AY)
        ^ iz.astype(jnp.uint32) * jnp.uint32(_AZ)
        ^ key
    )


def _corner_hashes(key, xi, yi, zi):
    """The 8 cube-corner hashes, sharing the per-axis products: (ix+1)·A =
    ix·A + A in wrapping uint32, so the corner combinations cost 6 int ops +
    8 XOR pairs instead of 24 multiplies. BIT-IDENTICAL to _hash3 per corner.
    Returns hashes in (x, y, z) bit order: h[dx][dy][dz]."""
    hx0 = xi.astype(jnp.uint32) * jnp.uint32(_AX)
    hx1 = (hx0 + jnp.uint32(_AX)) ^ key  # key folded into x AFTER the add
    hx0 = hx0 ^ key
    hy0 = yi.astype(jnp.uint32) * jnp.uint32(_AY)
    hy1 = hy0 + jnp.uint32(_AY)
    hz0 = zi.astype(jnp.uint32) * jnp.uint32(_AZ)
    hz1 = hz0 + jnp.uint32(_AZ)
    h00 = hx0 ^ hy0
    h10 = hx1 ^ hy0
    h01 = hx0 ^ hy1
    h11 = hx1 ^ hy1
    return (
        (( _mix(h00 ^ hz0), _mix(h00 ^ hz1)), (_mix(h01 ^ hz0), _mix(h01 ^ hz1))),
        (( _mix(h10 ^ hz0), _mix(h10 ^ hz1)), (_mix(h11 ^ hz0), _mix(h11 ^ hz1))),
    )


def _grad(h, x, y, z):
    """Gradient dot product from the hash low 4 bits (Improved Perlin)."""
    h = (h & jnp.uint32(15)).astype(jnp.int32)
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin3(key: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Classic 3-D Perlin noise. p: [..., 3] -> [...] in ≈[-1, 1]."""
    key = jnp.asarray(key, jnp.uint32)
    pi = jnp.floor(p)
    pf = p - pi
    xi = pi[..., 0].astype(jnp.int32)
    yi = pi[..., 1].astype(jnp.int32)
    zi = pi[..., 2].astype(jnp.int32)
    xf, yf, zf = pf[..., 0], pf[..., 1], pf[..., 2]

    u, v, w = _fade(xf), _fade(yf), _fade(zf)

    h = _corner_hashes(key, xi, yi, zi)
    x000 = _grad(h[0][0][0], xf, yf, zf)
    x100 = _grad(h[1][0][0], xf - 1.0, yf, zf)
    x010 = _grad(h[0][1][0], xf, yf - 1.0, zf)
    x110 = _grad(h[1][1][0], xf - 1.0, yf - 1.0, zf)
    x001 = _grad(h[0][0][1], xf, yf, zf - 1.0)
    x101 = _grad(h[1][0][1], xf - 1.0, yf, zf - 1.0)
    x011 = _grad(h[0][1][1], xf, yf - 1.0, zf - 1.0)
    x111 = _grad(h[1][1][1], xf - 1.0, yf - 1.0, zf - 1.0)

    y00 = x000 + u * (x100 - x000)
    y10 = x010 + u * (x110 - x010)
    y01 = x001 + u * (x101 - x001)
    y11 = x011 + u * (x111 - x011)
    z0 = y00 + v * (y10 - y00)
    z1 = y01 + v * (y11 - y01)
    return z0 + w * (z1 - z0)


def perlin3_lanes(key, x, y, z):
    """Lane-wise Perlin: identical math to perlin3 but on three separate
    [...] component arrays — the layout Pallas kernels use ([T] lanes rather
    than a trailing size-3 axis, which would not tile)."""
    key = jnp.asarray(key, jnp.uint32)
    xi0, yi0, zi0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    xf, yf, zf = x - xi0, y - yi0, z - zi0
    xi = xi0.astype(jnp.int32)
    yi = yi0.astype(jnp.int32)
    zi = zi0.astype(jnp.int32)

    u, v, w = _fade(xf), _fade(yf), _fade(zf)
    h = _corner_hashes(key, xi, yi, zi)
    x000 = _grad(h[0][0][0], xf, yf, zf)
    x100 = _grad(h[1][0][0], xf - 1.0, yf, zf)
    x010 = _grad(h[0][1][0], xf, yf - 1.0, zf)
    x110 = _grad(h[1][1][0], xf - 1.0, yf - 1.0, zf)
    x001 = _grad(h[0][0][1], xf, yf, zf - 1.0)
    x101 = _grad(h[1][0][1], xf - 1.0, yf, zf - 1.0)
    x011 = _grad(h[0][1][1], xf, yf - 1.0, zf - 1.0)
    x111 = _grad(h[1][1][1], xf - 1.0, yf - 1.0, zf - 1.0)

    y00 = x000 + u * (x100 - x000)
    y10 = x010 + u * (x110 - x010)
    y01 = x001 + u * (x101 - x001)
    y11 = x011 + u * (x111 - x011)
    z0 = y00 + v * (y10 - y00)
    z1 = y01 + v * (y11 - y01)
    return z0 + w * (z1 - z0)


def fbm_lanes(key, x, y, z, num_octaves: int, h: float = 0.5):
    """Lane-wise fBm (see fbm)."""
    g = 2.0 ** (-h)
    frequency = 4.0
    amplitude = 1.0
    t = jnp.zeros_like(x)
    for _ in range(num_octaves):
        t = t + amplitude * perlin3_lanes(key, x * frequency, y * frequency, z * frequency)
        frequency *= 2.0
        amplitude *= g
    return t


def fbm(key: jnp.ndarray, p: jnp.ndarray, num_octaves: int, h: float = 0.5) -> jnp.ndarray:
    """Fractal Brownian motion matching volumetric_disc.rs:330-342:
    gain g = 2^{-h}, base frequency 4, amplitude 1."""
    g = 2.0 ** (-h)
    frequency = 4.0
    amplitude = 1.0
    t = jnp.zeros(p.shape[:-1], p.dtype)
    for _ in range(num_octaves):
        t = t + amplitude * perlin3(key, p * frequency)
        frequency *= 2.0
        amplitude *= g
    return t
