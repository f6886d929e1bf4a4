"""Thin equatorial accretion disc (annulus in the z = 0 plane).

Reference: src/scene_objects/disc.rs. Segment-vs-plane parameter, radial
bounds, polar UV; the emitter moves on the local circular orbit and the
temperature comes from the disc temperature model at the geometry's radial
coordinate.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class Disc(struct.PyTreeNode):
    inner_radius: jnp.ndarray
    outer_radius: jnp.ndarray
    temperature_model: object  # ConstantTemperature | TemperatureLUT
    texture: object

    def segment_hit(self, cart_prev, cart_new):
        s = cart_prev[..., 1:4]
        e = cart_new[..., 1:4]
        d = e - s
        p1 = -s[..., 2]  # (center − start)·ẑ
        p2 = d[..., 2]
        safe_p2 = jnp.where(p2 != 0.0, p2, 1.0)
        t = p1 / safe_p2
        in_seg = (t >= 0.0) & (t <= 1.0) & (p2 != 0.0)

        point = s + t[..., None] * d
        rr = jnp.sum(point * point, axis=-1)
        in_annulus = (rr >= self.inner_radius ** 2) & (rr <= self.outer_radius ** 2)
        hit = in_seg & in_annulus

        phi = jnp.arctan2(point[..., 1], point[..., 0])
        r_norm = (jnp.sqrt(rr) - self.inner_radius) / (self.outer_radius - self.inner_radius)
        u = 0.5 + 0.5 * r_norm * jnp.cos(phi)
        v = 0.5 + 0.5 * r_norm * jnp.sin(phi)
        return hit, t, point, jnp.stack([u, v], axis=-1)

    def emitter_velocity(self, geometry, pos_native):
        """Circular-orbit emitter (disc.rs:101-110)."""
        return geometry.circular_orbit_velocity(pos_native)

    def temperature_at(self, geometry, point_cart4):
        from gr_raytracer_tpu.geometry import chart as charts

        r = geometry.radial_coordinate(point_cart4, charts.CARTESIAN)
        return self.temperature_model.at(r)

    def temperature_fail(self, geometry, point_cart4):
        """True where the temperature model rejects the sample — a disc hit
        below r_isco with a Novikov-Thorne LUT is the reference's per-pixel
        BelowRISCO error (temperature.rs:204-217); scene._shade_events maps
        it to a failed pixel."""
        model = self.temperature_model
        if not hasattr(model, "below_isco"):
            return jnp.zeros(point_cart4.shape[:-1], bool)
        from gr_raytracer_tpu.geometry import chart as charts

        r = geometry.radial_coordinate(point_cart4, charts.CARTESIAN)
        return model.below_isco(r)
