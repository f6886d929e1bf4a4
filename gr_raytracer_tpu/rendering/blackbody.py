"""Black-body radiation -> CIE XYZ, with relativistic redshift.

Reference: src/rendering/black_body_radiation.rs. Observer-frame intensity of
an emitter blackbody at temperature T seen at redshift z = ν_obs/ν_em is

    I_λ^obs(λ_obs) = z⁵ · B_λ(λ_obs · z, T)

(z⁵ = relativistic intensity boost; I_ν/ν³ is Lorentz invariant). The XYZ
integration is a 450-sample midpoint rule over 380-830 nm against the
analytic CIE fits, fully vectorized over (T, z) grids and differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

from gr_raytracer_tpu.rendering.color import x_bar, y_bar, z_bar

PLANCK_CONSTANT = 6.62607015e-34
SPEED_OF_LIGHT = 299_792_458.0
BOLTZMANN_CONSTANT = 1.380649e-23

MIN_WAVELENGTH_NM = 380.0
MAX_WAVELENGTH_NM = 830.0
NM_TO_M = 1e-9


def planck_spectral_radiance(lam_m, temperature):
    """B_λ(λ, T), λ in meters."""
    a = 2.0 * PLANCK_CONSTANT * SPEED_OF_LIGHT * SPEED_OF_LIGHT
    b = PLANCK_CONSTANT * SPEED_OF_LIGHT / (lam_m * BOLTZMANN_CONSTANT * temperature)
    return a / (lam_m ** 5 * jnp.expm1(b))


def blackbody_xyz(temperature, redshift=1.0):
    """CIE XYZ of a redshifted blackbody; broadcasts over inputs.

    Returns [..., 4] XYZA with alpha = 1. Midpoint rule at 1 nm steps
    matching the reference integration (black_body_radiation.rs:18-41).
    """
    temperature = jnp.asarray(temperature)
    redshift = jnp.asarray(redshift)
    dtype = jnp.result_type(temperature, redshift, float)
    num = int(MAX_WAVELENGTH_NM - MIN_WAVELENGTH_NM)
    i = jnp.arange(num, dtype=dtype)
    lam_m = (MIN_WAVELENGTH_NM + (i + 0.5)) * NM_TO_M  # [num]
    lam_nm = lam_m / NM_TO_M

    # radiance[... , num]
    rad = planck_spectral_radiance(
        lam_m * redshift[..., None], temperature[..., None]
    )
    step = NM_TO_M
    x = jnp.sum(rad * x_bar(lam_nm), axis=-1) * step
    y = jnp.sum(rad * y_bar(lam_nm), axis=-1) * step
    z = jnp.sum(rad * z_bar(lam_nm), axis=-1) * step
    boost = redshift ** 5
    one = jnp.ones_like(x)
    return jnp.stack([x * boost, y * boost, z * boost, one], axis=-1)


# Log-temperature LUT bounds (texture.rs:116-118).
LUT_STEPS = 1000
MIN_TEMPERATURE = 10.0
MAX_TEMPERATURE = 1e7


def build_blackbody_lut(dtype=None):
    """(log10_T [L], xyz [L, 3]) — blackbody colors at z = 1 over a log-T grid.

    A Doppler-shifted blackbody is a blackbody at T·z (Wien displacement) and
    the z⁵ boost cancels the implicit Planck rescaling, so the observer-frame
    XYZ at any z is just the LUT at T·z (texture.rs:140-147).
    """
    if dtype is None:
        dtype = jnp.result_type(float)
    log_min = jnp.log10(jnp.asarray(MIN_TEMPERATURE, dtype))
    log_max = jnp.log10(jnp.asarray(MAX_TEMPERATURE, dtype))
    log_t = jnp.linspace(log_min, log_max, LUT_STEPS)
    xyz = blackbody_xyz(10.0 ** log_t)[:, :3]
    return log_t, xyz
