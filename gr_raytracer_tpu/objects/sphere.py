"""Textured sphere scene object.

Reference: src/scene_objects/sphere.rs. Segment-vs-sphere with a
surface-crossing precondition (start/end radii straddle the surface), local-
frame spherical UV, world-space intersection point, static-observer emitter.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


class Sphere(struct.PyTreeNode):
    radius: jnp.ndarray
    center: jnp.ndarray  # [4] Cartesian (t ignored)
    temperature: jnp.ndarray
    texture: object  # any texture pytree

    def segment_hit(self, cart_prev, cart_new):
        """Test [N] segments (Cartesian 4-points). Returns
        (hit [N], t [N], point_cart [N, 3] world, uv [N, 2]).

        Precondition (sphere.rs:74-77): the segment endpoints' radii straddle
        the surface — a segment fully through the sphere is a miss (known
        reference limitation, objects.rs:160)."""
        s = cart_prev[..., 1:4] - self.center[1:4]
        e = cart_new[..., 1:4] - self.center[1:4]
        r2 = self.radius * self.radius
        rs = jnp.sum(s * s, axis=-1)
        re = jnp.sum(e * e, axis=-1)
        crossing = ((rs >= r2) & (re <= r2)) | ((rs <= r2) & (re >= r2))

        d = e - s
        a = jnp.sum(d * d, axis=-1)
        b = 2.0 * jnp.sum(s * d, axis=-1)
        c = rs - r2
        disc = b * b - 4.0 * a * c
        sqrt_disc = jnp.sqrt(jnp.maximum(disc, 0.0))
        safe_a = jnp.where(a != 0.0, a, 1.0)
        t1 = (-b + sqrt_disc) / (2.0 * safe_a)
        t2 = (-b - sqrt_disc) / (2.0 * safe_a)
        t1_ok = (t1 >= 0.0) & (t1 <= 1.0)
        t2_ok = (t2 >= 0.0) & (t2 <= 1.0)
        t = jnp.where(t1_ok, t1, t2)  # prefer the + root (sphere.rs:50-54)
        solved = (disc >= 0.0) & (t1_ok | t2_ok) & (a != 0.0)
        hit = crossing & solved

        local = s + t[..., None] * d
        r_loc = jnp.sqrt(jnp.sum(local * local, axis=-1))
        safe_r = jnp.where(r_loc > 0.0, r_loc, 1.0)
        theta = jnp.arccos(jnp.clip(local[..., 2] / safe_r, -1.0, 1.0))
        phi = jnp.arctan2(local[..., 1], local[..., 0])
        u = 1.0 - (jnp.pi + phi) / (2.0 * jnp.pi)
        v = theta / jnp.pi
        world = local + self.center[1:4]
        return hit, t, world, jnp.stack([u, v], axis=-1)

    def emitter_velocity(self, geometry, pos_native):
        """Static observer (sphere.rs:141-150). Returns (u [N, 4], ok [N])."""
        u = geometry.stationary_velocity(pos_native)
        return u, jnp.ones(pos_native.shape[:-1], bool)

    def temperature_at(self, geometry, point_cart4):
        return jnp.broadcast_to(self.temperature, point_cart4.shape[:-1])
