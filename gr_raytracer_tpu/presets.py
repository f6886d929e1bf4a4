"""Built-in scene presets: the flagship Kerr blackbody-disc scene.

The builder is a pure traced function of a parameter pytree, so the rendered
image is differentiable with respect to every entry (metric parameters r_s
and a, camera pose, disc geometry/temperature) — the camera tetrad, the
Novikov-Thorne temperature LUT, and the scene objects are all rebuilt inside
the trace. Mirrors the reference's kerr.toml scene assembly
(src/cli/shared.rs:131-321) without file IO.
"""

from __future__ import annotations

import jax.numpy as jnp

from gr_raytracer_tpu.geometry.kerr import Kerr
from gr_raytracer_tpu.objects.disc import Disc
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import integrator as integ
from gr_raytracer_tpu.rendering import scene as scn
from gr_raytracer_tpu.rendering.temperature import build_disc_temperature
from gr_raytracer_tpu.rendering.texture import BlackBodyMap, CheckerMap


def kerr_flagship_params(dtype=None):
    """Default parameter pytree for the flagship scene (kerr.toml values:
    r_s = 1, a = 0.45, camera at (18, 0, 0.8) looking along −x)."""
    if dtype is None:
        dtype = jnp.result_type(float)
    as_ = lambda v: jnp.asarray(v, dtype)
    # Camera placement mirrors the reference's Kerr example
    # (docs/example-render-commands.md:30-38): at (-10, 0, -0.5), the KS
    # tetrad's forward axis is the Cartesian z-axis, so θ ≈ π/2, ψ ≈ -π/2
    # rotates it to +x, facing the hole.
    return {
        "radius": as_(1.0),
        "a": as_(0.45),
        "camera_position": as_([0.0, -10.0, 0.0, -0.5]),
        "camera_phi": as_(0.0),
        "camera_theta": as_(1.52),
        "camera_psi": as_(-1.57),
        "disc_inner": as_(1.0),  # scaled by r_isco at build
        "disc_outer": as_(6.0),
        "disc_temperature": as_(10000.0),
        "celestial_temperature": as_(0.0),
    }


def build_kerr_flagship(
    params,
    rows: int,
    cols: int,
    max_steps: int = 2000,
    max_radius: float = 40.0,
    step_size: float = 0.05,
    epsilon: float = 1e-5,
    validate: bool = False,
    differentiable: bool = False,
):
    """Kerr (Kerr-Schild) + blackbody Novikov-Thorne disc + checker celestial
    sphere. Fully traced: safe to call inside jit/grad/shard_map."""
    dtype = params["radius"].dtype
    geometry = Kerr(
        radius=params["radius"],
        a=params["a"],
        horizon_epsilon=jnp.asarray(1e-3, dtype),
    )
    position = params["camera_position"]
    velocity = geometry.stationary_velocity(position)
    camera = cam.build_camera(
        geometry,
        position,
        velocity,
        alpha=jnp.pi / 4,
        rows=rows,
        columns=cols,
        phi=params["camera_phi"],
        theta=params["camera_theta"],
        psi=params["camera_psi"],
        validate=validate,
    )

    temp_model = build_disc_temperature(
        params["radius"], params["a"], params["disc_temperature"], params["disc_outer"], dtype
    )
    # Disc intersection uses Cartesian (Kerr-Schild) distance while the
    # temperature model uses the BL-type radius; the minimum Cartesian inner
    # radius that keeps every sample at or above r_isco is sqrt(isco² + a²)
    # (the reference's kerr.toml choice and its BelowRISCO error message,
    # temperature.rs:204-217).
    disc = Disc(
        inner_radius=jnp.sqrt(temp_model.r_isco**2 + params["a"] ** 2) * params["disc_inner"],
        outer_radius=params["disc_outer"],
        temperature_model=temp_model,
        texture=BlackBodyMap.create(jnp.asarray(3.0, dtype), dtype=dtype),
    )
    celestial = CheckerMap.from_srgb(
        0.0, 36.0, 18.0, (8, 8, 24), (2, 2, 8), dtype=dtype
    )
    cfg = integ.IntegrationConfig(
        max_radius=jnp.asarray(max_radius, dtype),
        step_size=jnp.asarray(step_size, dtype),
        epsilon=jnp.asarray(epsilon, dtype),
        max_steps=max_steps,
        differentiable=differentiable,
    )
    return scn.Scene(
        geometry=geometry,
        camera=camera,
        objects=(disc,),
        celestial_map=celestial,
        celestial_temperature=params["celestial_temperature"],
        integration=cfg,
    )
