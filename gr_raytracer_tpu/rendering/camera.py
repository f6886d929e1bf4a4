"""Relativistic pinhole camera (arXiv:1511.06025).

Reference behavior: src/rendering/camera.rs. The geometry's tetrad at the
camera position is rotated by intrinsic angles (φ pre-roll, θ tilt, ψ roll),
Lorentz-boosted to the camera four-velocity, then each pixel's null direction
is built on the image plane:

    w = e_z + i' e_x + j' e_y
    N = −e_z + 2 w / (1 + i'² + j'²)
    p = N − e_t      (past-directed: the traced photon *arrives* at the camera)

Ray generation is fully vectorized over the pixel grid and differentiable in
the camera pose and metric parameters (camera construction is traced).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry.base import validate_tetrad
from gr_raytracer_tpu.precision import einsum


class Camera(struct.PyTreeNode):
    position: jnp.ndarray  # [4], geometry-native chart
    velocity: jnp.ndarray  # [4]
    tetrad: jnp.ndarray  # [4, 4] rows (t, x, y, z), boosted
    spatial_handedness: jnp.ndarray  # ±1
    alpha: float = struct.field(pytree_node=False)  # vertical FOV (radians)
    rows: int = struct.field(pytree_node=False)
    columns: int = struct.field(pytree_node=False)
    spatial_signature: float = struct.field(pytree_node=False)
    chart: str = struct.field(pytree_node=False)


def _rotate(v1, v2, angle):
    """Rotate the (v1, v2) plane by `angle` (camera.rs:76-81)."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    return c * v1 + s * v2, -s * v1 + c * v2


def _spatial_handedness(geometry, position, tetrad):
    """Sign of the spatial triple product x·(y×z) in Cartesian components,
    with the chart-convention fallback for degenerate values
    (camera.rs:134-148)."""
    chart = geometry.chart
    a = geometry.spin
    x = charts.spatial_vector_to_cartesian(position, tetrad[..., 1, :], chart, a)
    y = charts.spatial_vector_to_cartesian(position, tetrad[..., 2, :], chart, a)
    z = charts.spatial_vector_to_cartesian(position, tetrad[..., 3, :], chart, a)
    triple = jnp.sum(x * jnp.cross(y, z), axis=-1)
    fallback = 1.0 if chart == charts.CARTESIAN else -1.0
    degenerate = ~jnp.isfinite(triple) | (jnp.abs(triple) <= 1e-12)
    return jnp.where(degenerate, fallback, jnp.where(triple >= 0.0, 1.0, -1.0))


def build_camera(
    geometry,
    position,
    velocity,
    alpha,
    rows,
    columns,
    phi=0.0,
    theta=0.0,
    psi=0.0,
    validate=True,
):
    """Construct the camera: rotate the geometry tetrad, boost, orient.

    `position`/`velocity` are in the geometry's native chart. With
    `validate=True` (host-side scene build) the pre- and post-boost tetrads
    are checked for orthonormality as in camera.rs:151-196.
    """
    position = jnp.asarray(position)
    velocity = jnp.asarray(velocity)
    tet = geometry.tetrad(position)
    if validate:
        validate_tetrad(geometry, position, tet)

    e_t, e_x, e_y, e_z = tet[..., 0, :], tet[..., 1, :], tet[..., 2, :], tet[..., 3, :]
    a_prime, b_prime = _rotate(e_x, e_y, jnp.asarray(phi))
    z_rot, a_two_prime = _rotate(e_z, a_prime, jnp.asarray(theta))
    x_rot, y_rot = _rotate(a_two_prime, b_prime, jnp.asarray(psi))
    rotated = jnp.stack([e_t, x_rot, y_rot, z_rot], axis=-2)

    lam = geometry.lorentz_transformation(position, velocity)
    boosted = einsum("...ij,...kj->...ki", lam, rotated)
    if validate:
        validate_tetrad(geometry, position, boosted)

    handedness = _spatial_handedness(geometry, position, boosted)
    sig = geometry.signature()
    assert abs(sig[1] - sig[2]) < 1e-12 and abs(sig[2] - sig[3]) < 1e-12

    return Camera(
        position=position,
        velocity=velocity,
        tetrad=boosted,
        spatial_handedness=handedness,
        alpha=float(alpha),
        rows=int(rows),
        columns=int(columns),
        spatial_signature=sig[3],
        chart=geometry.chart,
    )


def pixel_directions(camera, row_f, col_f):
    """Null directions for (possibly fractional, 0-based) pixel coordinates.

    row_f/col_f: [...] float arrays. Returns [..., 4]. Square pixels: alpha is
    the vertical FOV and both axes use the same angular scale
    (camera.rs:214-232).
    """
    tan_half = jnp.tan(camera.alpha / 2.0)
    scale = 2.0 * tan_half / camera.rows
    # 1-based pixel centers, offset from the image center.
    i_prime = camera.spatial_handedness * scale * ((col_f + 1.0) - (camera.columns + 1.0) / 2.0)
    j_prime = scale * ((row_f + 1.0) - (camera.rows + 1.0) / 2.0)

    e_x = camera.tetrad[1]
    e_y = camera.tetrad[2]
    e_z = camera.tetrad[3]
    w = e_z + i_prime[..., None] * e_x + j_prime[..., None] * e_y
    # spatial_signature cancels between w·w and the normalization
    # (camera.rs:226-231); the net factor is 1 + i'² + j'².
    denom = 1.0 + i_prime * i_prime + j_prime * j_prime
    return -e_z + 2.0 * w / denom[..., None]


def pixel_rays(camera, row_f, col_f):
    """(positions [..., 4], momenta [..., 4]) for pixel coordinates.

    Momenta are past-directed: p = N − e_t (camera.rs:234-245) — integration
    marches backward in time from the camera toward the emitter.
    """
    direction = pixel_directions(camera, row_f, col_f)
    momentum = direction - camera.tetrad[0]
    position = jnp.broadcast_to(camera.position, momentum.shape)
    return position, momentum


def pixel_rays_offset(camera, row, col, dx, dy):
    """Sub-pixel jittered rays: offsets dx, dy ∈ [0, 1) with (0.5, 0.5) the
    pixel center (camera.rs:247-254)."""
    return pixel_rays(camera, row + (dy - 0.5), col + (dx - 0.5))


def full_grid_rays(camera):
    """All H×W rays, flattened row-major: ([H*W, 4], [H*W, 4])."""
    rr, cc = jnp.meshgrid(
        jnp.arange(camera.rows, dtype=camera.position.dtype),
        jnp.arange(camera.columns, dtype=camera.position.dtype),
        indexing="ij",
    )
    return pixel_rays(camera, rr.ravel(), cc.ravel())
