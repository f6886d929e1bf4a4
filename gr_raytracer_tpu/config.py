"""Scene configuration: TOML schema + scene assembly.

Parses the reference's TOML scene format unchanged (so the reference's
scene-definitions/*.toml work verbatim) and assembles a frozen pytree Scene.

Reference: src/configuration.rs (schema + validation),
src/cli/shared.rs:48-350 (camera-velocity resolution, future-directedness
assertion, object/texture construction).
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, field
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.geometry.euclidean import EuclideanSpace
from gr_raytracer_tpu.geometry.euclidean_spherical import EuclideanSpaceSpherical
from gr_raytracer_tpu.geometry.kerr import Kerr
from gr_raytracer_tpu.geometry.kerr_bl import KerrBL
from gr_raytracer_tpu.geometry.schwarzschild import Schwarzschild
from gr_raytracer_tpu.objects.disc import Disc
from gr_raytracer_tpu.objects.sphere import Sphere
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import integrator as integ
from gr_raytracer_tpu.rendering import scene as scn
from gr_raytracer_tpu.rendering.temperature import ConstantTemperature, build_disc_temperature
from gr_raytracer_tpu.rendering.texture import BitmapMap, BlackBodyMap, CheckerMap


class ConfigError(ValueError):
    """Invalid scene configuration (reference: RaytracerError::InvalidConfiguration)."""


@dataclass(frozen=True)
class RenderOptions:
    """Global CLI options (reference: cli/cli.rs:4-48 defaults)."""

    width: int = 500
    height: int = 500
    step_size: float = 0.01
    max_steps: int = 20000
    max_radius: float = 15000.0
    epsilon: float = 1e-5
    camera_position: tuple = (18.0, 0.0, 0.8)  # Cartesian (x, y, z)
    phi: float = 0.0
    theta: float = 0.0
    psi: float = 0.0
    tone_mapping: str = "reinhard"
    show_sampling_mask: bool = False
    sampling_mask_color: tuple = (255, 0, 255)


@dataclass(frozen=True)
class RenderConfig:
    """Parsed TOML scene (reference: configuration.rs:3-19)."""

    geometry_type: dict  # {"kind": name, **params}
    objects: tuple = ()
    celestial_texture: dict = field(
        default_factory=lambda: {"kind": "BlackBody", "beaming_exponent": 0.0}
    )
    celestial_temperature: float = 0.0
    camera_velocity: dict = field(default_factory=lambda: {"kind": "StaticObserver"})
    adaptive_sampling: scn.AdaptiveSamplingConfig = field(
        default_factory=scn.AdaptiveSamplingConfig
    )
    base_dir: str = "."


def _tagged(table: dict, what: str) -> dict:
    """serde external tagging: {"Kerr": {...}} -> {"kind": "Kerr", ...};
    a bare string tag ("StaticObserver") -> {"kind": ...}."""
    if isinstance(table, str):
        return {"kind": table}
    if not isinstance(table, dict) or len(table) != 1:
        raise ConfigError(f"{what}: expected a single-variant table, got {table!r}")
    ((kind, params),) = table.items()
    if params is None:
        params = {}
    if not isinstance(params, dict):
        raise ConfigError(f"{what}.{kind}: expected a table of parameters")
    return {"kind": kind, **params}


def parse_config(text: str, base_dir: str = ".") -> RenderConfig:
    raw = tomllib.loads(text)
    if "geometry_type" not in raw:
        raise ConfigError("missing geometry_type")
    geometry = _tagged(raw["geometry_type"], "geometry_type")
    if geometry["kind"] not in ("Euclidean", "EuclideanSpherical", "Schwarzschild", "Kerr", "KerrBL"):
        raise ConfigError(f"unknown geometry_type {geometry['kind']!r}")

    objects = []
    for i, entry in enumerate(raw.get("objects", [])):
        obj = _tagged(entry, f"objects[{i}]")
        if "texture" in obj:
            obj["texture"] = _tagged(obj["texture"], f"objects[{i}].texture")
        objects.append(obj)

    celestial = _tagged(
        raw.get("celestial_texture", {"BlackBody": {"beaming_exponent": 0.0}}),
        "celestial_texture",
    )
    velocity = _tagged(raw.get("camera_velocity", "StaticObserver"), "camera_velocity")

    aa_raw = raw.get("adaptive_sampling", {})
    aa = scn.AdaptiveSamplingConfig(
        enabled=aa_raw.get("enabled", True),
        samples_per_axis=aa_raw.get("samples_per_axis", 4),
        luminance_contrast_threshold=aa_raw.get("luminance_contrast_threshold", 0.15),
        opacity_contrast_threshold=aa_raw.get("opacity_contrast_threshold", 0.1),
        minimum_luminance=aa_raw.get("minimum_luminance"),
        object_hit_opacity_threshold=aa_raw.get("object_hit_opacity_threshold", 0.5),
        exclude_background_contrast=aa_raw.get("exclude_background_contrast", True),
    )
    try:
        aa.validate()
    except ValueError as e:
        raise ConfigError(str(e)) from e

    return RenderConfig(
        geometry_type=geometry,
        objects=tuple(objects),
        celestial_texture=celestial,
        celestial_temperature=raw.get("celestial_temperature", 0.0),
        camera_velocity=velocity,
        adaptive_sampling=aa,
        base_dir=base_dir,
    )


def load_config(path: str) -> RenderConfig:
    with open(path, "r") as f:
        return parse_config(f.read(), base_dir=os.path.dirname(os.path.abspath(path)))


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------


def build_geometry(cfg: RenderConfig, dtype):
    g = cfg.geometry_type
    kind = g["kind"]
    as_ = lambda k, d=None: jnp.asarray(g[k] if d is None else g.get(k, d), dtype)
    if kind == "Euclidean":
        return EuclideanSpace()
    if kind == "EuclideanSpherical":
        return EuclideanSpaceSpherical()
    if kind == "Schwarzschild":
        return Schwarzschild(radius=as_("radius"), horizon_epsilon=as_("horizon_epsilon"))
    if kind == "Kerr":
        return Kerr(radius=as_("radius"), a=as_("a"), horizon_epsilon=as_("horizon_epsilon"))
    if kind == "KerrBL":
        return KerrBL(radius=as_("radius"), a=as_("a"), horizon_epsilon=as_("horizon_epsilon"))
    raise ConfigError(f"unknown geometry kind {kind!r}")


class TextureFactory:
    """Bitmap cache keyed by resolved path (reference: texture.rs:261-296)."""

    def __init__(self, base_dir: str, dtype):
        self.base_dir = base_dir
        self.dtype = dtype
        self._cache: dict = {}

    def resolve_path(self, path: str) -> str:
        """Reference scene files use repo-root-relative paths
        ("resources/x.png"); try CWD, the scene file's directory, and its
        parent (scene-definitions/ layout)."""
        if os.path.isabs(path) or os.path.exists(path):
            return path
        for base in (self.base_dir, os.path.dirname(self.base_dir)):
            candidate = os.path.join(base, path)
            if os.path.exists(candidate):
                return candidate
        return path  # let the loader produce the error with the raw path

    def build(self, tex: dict):
        kind = tex["kind"]
        if kind == "Bitmap":
            path = self.resolve_path(tex["path"])
            key = (path, float(tex["beaming_exponent"]))
            if key not in self._cache:
                try:
                    self._cache[key] = BitmapMap.from_file(
                        path, tex["beaming_exponent"], dtype=self.dtype
                    )
                except OSError as e:
                    raise ConfigError(f"cannot load texture {tex['path']!r}: {e}") from e
            return self._cache[key]
        if kind == "Checker":
            return CheckerMap.from_srgb(
                tex["beaming_exponent"],
                tex["width"],
                tex["height"],
                tuple(tex["color1"]),
                tuple(tex["color2"]),
                dtype=self.dtype,
            )
        if kind == "BlackBody":
            key = ("__blackbody__", float(tex["beaming_exponent"]))
            if key not in self._cache:
                self._cache[key] = BlackBodyMap.create(tex["beaming_exponent"], dtype=self.dtype)
            return self._cache[key]
        raise ConfigError(f"unknown texture kind {kind!r}")


def _build_temperature_model(geometry, temperature, outer_radius, dtype):
    """Disc temperature: Novikov-Thorne LUT for black-hole geometries,
    constant elsewhere (reference: geometry get_temperature_computer)."""
    if isinstance(geometry, (Schwarzschild, Kerr, KerrBL)):
        return build_disc_temperature(
            geometry.radius, getattr(geometry, "a", 0.0), temperature, outer_radius, dtype
        )
    return ConstantTemperature(value=jnp.asarray(temperature, dtype))


def build_objects(cfg: RenderConfig, geometry, factory: TextureFactory, dtype):
    out = []
    for i, obj in enumerate(cfg.objects):
        kind = obj["kind"]
        tex = factory.build(obj["texture"])
        if kind == "Sphere":
            px, py, pz = obj["position"]
            out.append(
                Sphere(
                    radius=jnp.asarray(obj["radius"], dtype),
                    center=jnp.asarray([0.0, px, py, pz], dtype),
                    temperature=jnp.asarray(obj["temperature"], dtype),
                    texture=tex,
                )
            )
        elif kind == "Disc":
            if not obj["inner_radius"] < obj["outer_radius"]:
                raise ConfigError(
                    f"objects[{i}].Disc: inner_radius must be < outer_radius"
                )
            out.append(
                Disc(
                    inner_radius=jnp.asarray(obj["inner_radius"], dtype),
                    outer_radius=jnp.asarray(obj["outer_radius"], dtype),
                    temperature_model=_build_temperature_model(
                        geometry, obj["temperature"], obj["outer_radius"], dtype
                    ),
                    texture=tex,
                )
            )
        elif kind == "VolumetricDisc":
            from gr_raytracer_tpu.objects.volumetric_disc import build_volumetric_disc

            out.append(build_volumetric_disc(obj, geometry, tex, dtype, index=i))
        else:
            raise ConfigError(f"objects[{i}]: unknown object kind {kind!r}")
    return tuple(out)


def resolve_camera_velocity(geometry, position, velocity_cfg: dict, dtype):
    """Static / ZAMO / Explicit observer (cli/shared.rs:48-77); Explicit is
    normalization-checked (tolerance 1e-6)."""
    kind = velocity_cfg["kind"]
    if kind == "StaticObserver":
        return geometry.stationary_velocity(position)
    if kind == "Zamo":
        return geometry.zamo_velocity(position)
    if kind == "Explicit":
        u = jnp.asarray(velocity_cfg["components"], dtype)
        norm = float(geometry.inner_product(position, u, u))
        expected = geometry.signature()[0]
        if abs(norm - expected) > 1e-6:
            raise ConfigError(
                f"Explicit camera_velocity is not normalized: u.u = {norm} (expected {expected})"
            )
        return u
    raise ConfigError(f"unknown camera_velocity kind {kind!r}")


def assert_future_directed(context, geometry, position, vec):
    """s0 · <e_t, v> must be positive (cli/shared.rs:23-46, 79-86)."""
    e_t = geometry.tetrad(position)[..., 0, :]
    orientation = float(geometry.signature()[0]) * float(
        geometry.inner_product(position, e_t, vec)
    )
    t = float(vec[..., 0])
    if not (np.isfinite(t) and orientation > 0.0):
        raise ConfigError(
            f"{context} has wrong time orientation (orientation={orientation} with t={t})"
        )


def enable_host_cpu_platform():
    """Make a host CPU backend available ALONGSIDE the accelerator (call
    before any jax backend use). Scene assembly is hundreds of tiny eager
    ops; dispatched one-by-one over a tunneled TPU each costs ~0.3-1 s
    (≈4 min of the 1000² hero render went to scene build before this).
    No-op once backends are initialized or when cpu is already listed."""
    import jax

    plats = os.environ.get("JAX_PLATFORMS", "")
    if plats and "cpu" not in plats.split(","):
        try:
            jax.config.update("jax_platforms", plats + ",cpu")
        except Exception:
            pass


def create_scene_host(cfg: RenderConfig, opts: RenderOptions, dtype=None) -> scn.Scene:
    """create_scene with every eager precomputation pinned to the host CPU
    backend (when one exists), then one device_put of the finished pytree to
    the default device. Identical math — only the dispatch target changes."""
    import jax

    try:
        cpu = jax.devices("cpu")[0]
    except Exception:
        cpu = None
    default = jax.devices()[0]
    if cpu is None or default == cpu:
        return create_scene(cfg, opts, dtype)
    with jax.default_device(cpu):
        scene = create_scene(cfg, opts, dtype)
    return jax.device_put(scene, default)


def create_scene(cfg: RenderConfig, opts: RenderOptions, dtype=None) -> scn.Scene:
    """Full scene assembly (cli/shared.rs:131-321 + per-geometry adapters:
    the CLI camera position is Cartesian and converted to the geometry's
    chart)."""
    if dtype is None:
        dtype = jnp.result_type(float)
    geometry = build_geometry(cfg, dtype)

    x, y, z = opts.camera_position
    cart = jnp.asarray([0.0, x, y, z], dtype)
    position = charts.from_cartesian(cart, geometry.chart, geometry.spin)

    velocity = resolve_camera_velocity(geometry, position, cfg.camera_velocity, dtype)
    assert_future_directed("camera velocity", geometry, position, velocity)

    camera = cam.build_camera(
        geometry,
        position,
        velocity,
        alpha=jnp.pi / 4,
        rows=opts.height,
        columns=opts.width,
        phi=opts.phi,
        theta=opts.theta,
        psi=opts.psi,
        validate=True,
    )

    factory = TextureFactory(cfg.base_dir, dtype)
    objects = build_objects(cfg, geometry, factory, dtype)
    celestial = factory.build(cfg.celestial_texture)

    integration = integ.IntegrationConfig(
        max_radius=jnp.asarray(opts.max_radius, dtype),
        step_size=jnp.asarray(opts.step_size, dtype),
        epsilon=jnp.asarray(opts.epsilon, dtype),
        max_steps=opts.max_steps,
    )
    return scn.Scene(
        geometry=geometry,
        camera=camera,
        objects=objects,
        celestial_map=celestial,
        celestial_temperature=jnp.asarray(cfg.celestial_temperature, dtype),
        integration=integration,
        adaptive=cfg.adaptive_sampling,
    )
