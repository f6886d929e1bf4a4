"""Texture maps: checker, bitmap (bilinear), blackbody-LUT.

All maps are pytrees with a common `color_at_uv(u, v, temperature, redshift)
-> [..., 4]` method (XYZA), batched and differentiable in (T, z). Dispatch
between map types happens at trace time (the scene structure is static).

Reference: src/rendering/texture.rs.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from gr_raytracer_tpu.rendering import blackbody
from gr_raytracer_tpu.rendering.color import apply_beaming, srgb8_to_xyza


class CheckerMap(struct.PyTreeNode):
    """Checker pattern in UV space (texture.rs:212-257)."""

    c1: jnp.ndarray  # [4] XYZA
    c2: jnp.ndarray  # [4]
    width: jnp.ndarray
    height: jnp.ndarray
    beaming_exponent: jnp.ndarray

    @classmethod
    def from_srgb(cls, beaming_exponent, width, height, color1, color2, dtype=None):
        """color1/color2: (r, g, b[, a]) 8-bit tuples."""
        if dtype is None:
            dtype = jnp.result_type(float)
        mk = lambda c: srgb8_to_xyza(jnp.asarray(c, dtype), dtype)
        return cls(
            c1=mk(color1),
            c2=mk(color2),
            width=jnp.asarray(width, dtype),
            height=jnp.asarray(height, dtype),
            beaming_exponent=jnp.asarray(beaming_exponent, dtype),
        )

    def color_at_uv(self, u, v, temperature, redshift):
        ut = jnp.floor(u * self.width).astype(jnp.int32)
        vt = jnp.floor(v * self.height).astype(jnp.int32)
        even = (ut + vt) % 2 == 0
        color = jnp.where(even[..., None], self.c1, self.c2)
        return apply_beaming(color, redshift, self.beaming_exponent)


class BitmapMap(struct.PyTreeNode):
    """Bitmap texture, bilinear filtered (texture.rs:40-102).

    `image` is [H, W, 4] XYZA (pre-converted from sRGB at load time).
    """

    image: jnp.ndarray
    beaming_exponent: jnp.ndarray

    @classmethod
    def from_file(cls, path, beaming_exponent, dtype=None):
        if dtype is None:
            dtype = jnp.result_type(float)
        img = None
        if path.lower().endswith(".png"):
            # Native PNG decoder (native/gr_native.cpp) — the data-loader
            # side of the native host runtime; PIL is the fallback for
            # formats it doesn't cover (16-bit, interlaced, non-PNG).
            from gr_raytracer_tpu import native

            with open(path, "rb") as f:
                rgba = native.png_decode(f.read())
            if rgba is not None:
                img = np.asarray(rgba, dtype=np.float64)
        if img is None:
            from PIL import Image

            img = np.asarray(Image.open(path).convert("RGBA"), dtype=np.float64)
        xyza = srgb8_to_xyza(jnp.asarray(img, dtype), dtype)
        return cls(image=xyza, beaming_exponent=jnp.asarray(beaming_exponent, dtype))

    def color_at_uv(self, u, v, temperature, redshift):
        h, w = self.image.shape[0], self.image.shape[1]
        px = w * u
        py = h * v
        # Clipped floor/ceil corners with fractions from the clipped floor —
        # reproduces the reference's edge behavior (texture.rs:62-90),
        # including Rust's saturating negative-float -> u32 cast.
        x0 = jnp.clip(jnp.floor(px), 0, w - 1).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(py), 0, h - 1).astype(jnp.int32)
        x1 = jnp.clip(jnp.ceil(px), 0, w - 1).astype(jnp.int32)
        y1 = jnp.clip(jnp.ceil(py), 0, h - 1).astype(jnp.int32)
        dx = px - x0
        dy = py - y0
        c00 = self.image[y0, x0]
        c01 = self.image[y1, x0]
        c10 = self.image[y0, x1]
        c11 = self.image[y1, x1]
        w00 = ((1.0 - dx) * (1.0 - dy))[..., None]
        w01 = ((1.0 - dx) * dy)[..., None]
        w10 = (dx * (1.0 - dy))[..., None]
        w11 = (dx * dy)[..., None]
        color = w00 * c00 + w10 * c10 + w01 * c01 + w11 * c11
        return apply_beaming(color, redshift, self.beaming_exponent)


class BlackBodyMap(struct.PyTreeNode):
    """Physical blackbody emission via a log₁₀T LUT (texture.rs:104-210).

    The LUT holds z=1 colors; a redshifted blackbody is sampled at T·z (Wien),
    the z⁵ boost cancelling against the Planck rescaling. `beaming_exponent`
    is an extra *artistic* z^e multiplier on top (0 = physically exact).
    """

    log_t: jnp.ndarray  # [L]
    xyz: jnp.ndarray  # [L, 3]
    beaming_exponent: jnp.ndarray

    @classmethod
    def create(cls, beaming_exponent, dtype=None):
        log_t, xyz = blackbody.build_blackbody_lut(dtype)
        return cls(
            log_t=log_t,
            xyz=xyz,
            beaming_exponent=jnp.asarray(beaming_exponent, log_t.dtype),
        )

    def sample(self, temperature):
        from gr_raytracer_tpu.ops.lut import uniform_interp

        lt = jnp.log10(jnp.maximum(temperature, blackbody.MIN_TEMPERATURE))
        lt = jnp.clip(lt, self.log_t[0], self.log_t[-1])
        # The grid is uniform in log10 T: direct-index interpolation (2
        # gathers) instead of jnp.interp's per-query binary search.
        dx = (self.log_t[-1] - self.log_t[0]) / (self.log_t.shape[0] - 1)
        xyz = uniform_interp(lt, self.log_t[0], dx, self.xyz)
        return jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], axis=-1)

    def color_at_uv(self, u, v, temperature, redshift):
        color = self.sample(temperature * redshift)
        return apply_beaming(color, redshift, self.beaming_exponent)
