"""Transport-free redshift via conserved Killing scalars.

Reference: src/rendering/redshift.rs. Three chart-independent scalars are
computed once per ray at the camera, where the exact (un-interpolated)
momentum is available:

    observer_energy = <u_cam, p>,   p_t = <∂_t, p>,   p_φ = <∂_φ, p>

By conservation they are valid anywhere along the geodesic; paired with a
local emitter's Killing decomposition they give the redshift at any sample
point with NO parallel transport:

    g = observer_energy / (u^t p_t + u^φ p_φ)

The signature factor that converts inner products to physical energies
cancels in the ratio, so g = E_obs/E_em directly.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class RayFrequencyData(struct.PyTreeNode):
    observer_energy: jnp.ndarray  # [N]
    p_t: jnp.ndarray  # [N]
    p_phi: jnp.ndarray  # [N]


def ray_frequency_data(geometry, x, p, camera_velocity):
    """Per-ray conserved scalars at the camera (redshift.rs:45-60)."""
    vel = jnp.broadcast_to(camera_velocity, p.shape)
    observer_energy = geometry.inner_product(x, vel, p)
    e_t = jnp.zeros_like(p).at[..., 0].set(1.0)
    p_t = geometry.inner_product(x, e_t, p)
    axial = geometry.axial_killing(x)
    p_phi = geometry.inner_product(x, axial, p)
    return RayFrequencyData(observer_energy=observer_energy, p_t=p_t, p_phi=p_phi)


def redshift_from_energies(emitter_energy, observer_energy):
    """g = E_obs / E_em (redshift.rs:31-43; signature factors cancel)."""
    return observer_energy / emitter_energy


def killing_redshift(freq: RayFrequencyData, u_t, u_phi):
    """Redshift against an emitter given by Killing coefficients
    (circular_orbit.rs:17-36): E_em = u^t p_t + u^φ p_φ."""
    emitter_energy = u_t * freq.p_t + u_phi * freq.p_phi
    return freq.observer_energy / emitter_energy
