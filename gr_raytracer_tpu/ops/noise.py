"""Seedable 3-D Perlin gradient noise + fBm, batched jnp.

Improved-Perlin (2002) construction: a seeded 256-entry permutation table
(doubled) hashes lattice corners; gradients come from the hash low bits;
quintic fade; trilinear blend. Matches the `noise` crate's Perlin semantics
(value range ≈ [-1, 1], zero at lattice points) closely enough for visual
parity — SURVEY.md stage 9 explicitly does not require a bit-match.

The permutation table is a pytree leaf (int32 [512]), so the noise field is
reproducible from `perlin_seed` and cheap to gather on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def permutation_table(seed: int) -> np.ndarray:
    """Seeded permutation of 0..255, doubled to 512 (int32)."""
    rng = np.random.RandomState(np.uint32(seed))
    p = rng.permutation(256)
    return np.concatenate([p, p]).astype(np.int32)


def _grad(h, x, y, z):
    """Gradient dot product from the hash low 4 bits (Improved Perlin)."""
    h = h & 15
    u = jnp.where(h < 8, x, y)
    v = jnp.where(h < 4, y, jnp.where((h == 12) | (h == 14), x, z))
    return jnp.where(h & 1 == 0, u, -u) + jnp.where(h & 2 == 0, v, -v)


def _fade(t):
    return t * t * t * (t * (t * 6.0 - 15.0) + 10.0)


def perlin3(perm: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Classic 3-D Perlin noise. p: [..., 3] -> [...] in ≈[-1, 1]."""
    pi = jnp.floor(p)
    pf = p - pi
    xi = pi[..., 0].astype(jnp.int32) & 255
    yi = pi[..., 1].astype(jnp.int32) & 255
    zi = pi[..., 2].astype(jnp.int32) & 255
    xf, yf, zf = pf[..., 0], pf[..., 1], pf[..., 2]

    u, v, w = _fade(xf), _fade(yf), _fade(zf)

    a = perm[xi] + yi
    aa = perm[a] + zi
    ab = perm[a + 1] + zi
    b = perm[xi + 1] + yi
    ba = perm[b] + zi
    bb = perm[b + 1] + zi

    x000 = _grad(perm[aa], xf, yf, zf)
    x100 = _grad(perm[ba], xf - 1.0, yf, zf)
    x010 = _grad(perm[ab], xf, yf - 1.0, zf)
    x110 = _grad(perm[bb], xf - 1.0, yf - 1.0, zf)
    x001 = _grad(perm[aa + 1], xf, yf, zf - 1.0)
    x101 = _grad(perm[ba + 1], xf - 1.0, yf, zf - 1.0)
    x011 = _grad(perm[ab + 1], xf, yf - 1.0, zf - 1.0)
    x111 = _grad(perm[bb + 1], xf - 1.0, yf - 1.0, zf - 1.0)

    y00 = x000 + u * (x100 - x000)
    y10 = x010 + u * (x110 - x010)
    y01 = x001 + u * (x101 - x001)
    y11 = x011 + u * (x111 - x011)
    z0 = y00 + v * (y10 - y00)
    z1 = y01 + v * (y11 - y01)
    return z0 + w * (z1 - z0)


def fbm(perm: jnp.ndarray, p: jnp.ndarray, num_octaves: int, h: float = 0.5) -> jnp.ndarray:
    """Fractal Brownian motion matching volumetric_disc.rs:330-342:
    gain g = 2^{-h}, base frequency 4, amplitude 1."""
    g = 2.0 ** (-h)
    frequency = 4.0
    amplitude = 1.0
    t = jnp.zeros(p.shape[:-1], p.dtype)
    for _ in range(num_octaves):
        t = t + amplitude * perlin3(perm, p * frequency)
        frequency *= 2.0
        amplitude *= g
    return t
