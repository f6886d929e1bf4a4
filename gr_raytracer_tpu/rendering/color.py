"""CIE-XYZ / sRGB color pipeline, alpha blending, beaming, tone mapping.

Colors are [..., 4] arrays holding (X, Y, Z, alpha) — the CIE tristimulus
values plus coverage — throughout the renderer. Everything here is a pure,
batched jnp function, differentiable where the math allows.

Behavioral parity targets (reference: src/rendering/color.rs):
  * analytic multi-lobe Gaussian CIE 1931 color matching functions
    (color.rs:173-190);
  * 2003 IEC sRGB <-> XYZ matrices and transfer function (color.rs:192-332);
  * "over" blending with un-premultiplied inputs (color.rs:49-69);
  * artistic beaming multiplier redshift**exponent (color.rs:72-80);
  * Reinhard-luminance and global-linear-max tone mapping (color.rs:243-299).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from gr_raytracer_tpu.precision import einsum

# ---------------------------------------------------------------------------
# CIE 1931 color matching functions (analytic Gaussian fits)
# ---------------------------------------------------------------------------


def _g(lam, mu, tau_left, tau_right):
    tau = jnp.where(lam < mu, tau_left, tau_right)
    t = (lam - mu) * tau
    return jnp.exp(-0.5 * t * t)


def x_bar(lam):
    """CIE x̄(λ), λ in nm."""
    return (
        1.056 * _g(lam, 599.8, 0.0264, 0.0323)
        + 0.362 * _g(lam, 442.0, 0.0624, 0.0374)
        - 0.065 * _g(lam, 501.1, 0.0490, 0.0382)
    )


def y_bar(lam):
    """CIE ȳ(λ), λ in nm."""
    return 0.821 * _g(lam, 568.8, 0.0213, 0.0247) + 0.286 * _g(lam, 530.9, 0.0613, 0.0322)


def z_bar(lam):
    """CIE z̄(λ), λ in nm."""
    return 1.217 * _g(lam, 437.0, 0.0845, 0.0278) + 0.681 * _g(lam, 459.0, 0.0385, 0.0725)


# ---------------------------------------------------------------------------
# sRGB <-> XYZ
# ---------------------------------------------------------------------------

# 2003 IEC matrices.
XYZ_TO_LINEAR_SRGB = np.array(
    [
        [3.2406255, -1.5372080, -0.4986286],
        [-0.9689307, 1.8757561, 0.0415175],
        [0.0557101, -0.2040211, 1.0569959],
    ]
)
LINEAR_SRGB_TO_XYZ = np.array(
    [
        [0.4124564, 0.3575761, 0.1804375],
        [0.2126729, 0.7151522, 0.0721750],
        [0.0193339, 0.1191920, 0.9503041],
    ]
)


def compand_srgb(linear):
    """Linear -> encoded sRGB, sign-preserving, clamped to [0, 1]."""
    sign = jnp.where(linear < 0.0, -1.0, 1.0)
    a = jnp.abs(linear)
    encoded = jnp.where(a <= 0.0031308, 12.92 * a, 1.055 * jnp.power(a, 1.0 / 2.4) - 0.055)
    return jnp.clip(sign * encoded, 0.0, 1.0)


def inv_compand_srgb(u):
    """Encoded sRGB in [0, 1] -> linear."""
    return jnp.where(u <= 0.04045, u / 12.92, jnp.power((u + 0.055) / 1.055, 2.4))


def xyz_to_linear_srgb(xyz):
    """[..., 3] XYZ -> [..., 3] linear sRGB."""
    m = jnp.asarray(XYZ_TO_LINEAR_SRGB, xyz.dtype)
    return einsum("ij,...j->...i", m, xyz)


def srgb8_to_xyza(rgba, dtype=None):
    """8-bit sRGB(A) values -> (X, Y, Z, alpha).

    `rgba` is [..., 3] or [..., 4] with components in 0..255; missing alpha
    defaults to 255. Returns [..., 4] float.
    """
    if dtype is None:
        dtype = jnp.result_type(float)
    rgba = jnp.asarray(rgba, dtype)
    rgb = rgba[..., :3] / 255.0
    alpha = rgba[..., 3] / 255.0 if rgba.shape[-1] == 4 else jnp.ones(rgba.shape[:-1], rgba.dtype)
    lin = inv_compand_srgb(rgb)
    m = jnp.asarray(LINEAR_SRGB_TO_XYZ, lin.dtype)
    xyz = einsum("ij,...j->...i", m, lin)
    return jnp.concatenate([xyz, alpha[..., None]], axis=-1)


def xyz_to_srgb8(xyz, exposure=1.0):
    """[..., 3] XYZ -> [..., 3] uint8 sRGB at the given exposure."""
    lin = xyz_to_linear_srgb(xyz) * exposure
    enc = compand_srgb(jnp.maximum(lin, 0.0))
    return jnp.round(enc * 255.0).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Blending / beaming
# ---------------------------------------------------------------------------


def blend(background, foreground):
    """`foreground` over `background`, both [..., 4] un-premultiplied XYZA.

    Matches the reference semantics (color.rs:49-69) including the
    both-transparent -> all-zeros case.
    """
    ab = jnp.clip(background[..., 3], 0.0, 1.0)
    af = jnp.clip(foreground[..., 3], 0.0, 1.0)
    ao = af + ab * (1.0 - af)
    safe_ao = jnp.where(ao > 0.0, ao, 1.0)
    color = (
        foreground[..., :3] * af[..., None] + background[..., :3] * (ab * (1.0 - af))[..., None]
    ) / safe_ao[..., None]
    out = jnp.concatenate([color, ao[..., None]], axis=-1)
    return jnp.where(ao[..., None] > 0.0, out, jnp.zeros_like(out))


def apply_beaming(xyza, redshift, beaming_exponent):
    """Artistic relativistic-beaming multiplier z**exponent on the color part."""
    factor = jnp.power(redshift, beaming_exponent)
    return jnp.concatenate([xyza[..., :3] * factor[..., None], xyza[..., 3:4]], axis=-1)


# ---------------------------------------------------------------------------
# Tone mapping
# ---------------------------------------------------------------------------

TONE_MAPPING_REINHARD = "reinhard"
TONE_MAPPING_GLOBAL_LINEAR = "global-linear"

_REC709_LUMA = np.array([0.2126, 0.7152, 0.0722])


def tone_map_linear_srgb(linear_rgb, exposure=1.0, method=TONE_MAPPING_REINHARD):
    """Tone-map a [..., 3] linear-sRGB buffer, returning [..., 3] linear sRGB.

    Reinhard: per-pixel luminance L/(1+L) rescale. GlobalLinear: normalize by
    the buffer-wide max channel value (a frame-global reduction — under
    sharding this is the one collective of the tone-map stage).
    """
    c = linear_rgb * exposure
    if method == TONE_MAPPING_REINHARD:
        luma = einsum("...i,i->...", c, jnp.asarray(_REC709_LUMA, c.dtype))
        scale = jnp.where(luma > 0.0, 1.0 / (1.0 + luma), 1.0)
        return c * scale[..., None]
    elif method == TONE_MAPPING_GLOBAL_LINEAR:
        max_component = jnp.max(jnp.maximum(c, 0.0))
        scale = jnp.where(max_component > 0.0, 1.0 / max_component, 1.0)
        return c * scale
    else:
        raise ValueError(f"unknown tone mapping method: {method!r}")


def xyza_buffer_to_srgb8(xyza, exposure=1.0, method=TONE_MAPPING_REINHARD):
    """Full pipeline: [..., 4] XYZA buffer -> [..., 3] uint8 sRGB image."""
    lin = xyz_to_linear_srgb(xyza[..., :3])
    mapped = tone_map_linear_srgb(lin, exposure=exposure, method=method)
    enc = compand_srgb(jnp.maximum(mapped, 0.0))
    return jnp.round(enc * 255.0).astype(jnp.uint8)
