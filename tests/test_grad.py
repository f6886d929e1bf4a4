"""Differentiability: autodiff gradients of a rendered-image loss vs central
finite differences, for metric parameters, camera pose, and disc/material
parameters (SURVEY.md stage 10 — the px-gradient metric of BASELINE.json).

The loss Reinhard-compresses the raw XYZ so the 1e13-scale blackbody
radiances don't drown the finite-difference step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gr_raytracer_tpu import presets
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import scene as scn

ROWS = COLS = 6
MAX_STEPS = 200


def loss_fn(params):
    scene = presets.build_kerr_flagship(
        params, ROWS, COLS, max_steps=MAX_STEPS, max_radius=25.0, step_size=0.1,
        differentiable=True,
    )
    rr, cc = jnp.meshgrid(
        jnp.arange(ROWS, dtype=jnp.float64),
        jnp.arange(COLS, dtype=jnp.float64),
        indexing="ij",
    )
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    c = scn.trace_rays(scene, x, p).color[..., :3]
    return jnp.sum(c / (1.0 + c))


@pytest.fixture(scope="module")
def grads():
    params = presets.kerr_flagship_params(jnp.float64)
    val, g = jax.jit(jax.value_and_grad(loss_fn))(params)
    return params, float(val), g


def fd(params, key, eps, component=None):
    f = jax.jit(loss_fn)

    def shift(sign):
        p = dict(params)
        if component is None:
            p[key] = params[key] + sign * eps
        else:
            p[key] = params[key].at[component].add(sign * eps)
        return f(p)

    return float((shift(+1.0) - shift(-1.0)) / (2.0 * eps))


def check(params, g, key, eps, component=None, rtol=5e-4):
    got = float(g[key] if component is None else g[key][component])
    want = fd(params, key, eps, component)
    assert np.isfinite(got)
    if abs(want) < 1e-12:
        assert abs(got) < 1e-8
    else:
        np.testing.assert_allclose(got, want, rtol=rtol)


def test_loss_positive_and_grads_finite(grads):
    params, val, g = grads
    assert val > 0.0
    for k, v in g.items():
        assert bool(jnp.all(jnp.isfinite(v))), k


def test_grad_spin(grads):
    params, _, g = grads
    check(params, g, "a", 1e-6)


def test_grad_schwarzschild_radius(grads):
    params, _, g = grads
    check(params, g, "radius", 1e-6)


def test_grad_camera_position(grads):
    params, _, g = grads
    check(params, g, "camera_position", 1e-6, component=1)


def test_grad_camera_angles(grads):
    params, _, g = grads
    check(params, g, "camera_theta", 1e-6)
    check(params, g, "camera_psi", 1e-6)


def test_grad_disc_temperature(grads):
    params, _, g = grads
    check(params, g, "disc_temperature", 1e-2, rtol=1e-3)


def test_grad_disc_outer_radius(grads):
    params, _, g = grads
    check(params, g, "disc_outer", 1e-5, rtol=5e-3)


def test_volumetric_raymarch_differentiable_path():
    """The differentiable raymarch (VolumetricDisc differentiable=True —
    cond-gated checkpointed scan; lax.while_loop has no reverse rule) must
    (a) reproduce the while_loop forward exactly and (b) match central
    finite differences on the physical parameters it exists to fit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gr_raytracer_tpu.geometry.kerr import Kerr
    from gr_raytracer_tpu.objects.volumetric_disc import VolumetricDisc
    from gr_raytracer_tpu.rendering.temperature import ConstantTemperature
    from gr_raytracer_tpu.rendering.texture import BlackBodyMap

    dtype = jnp.float64
    geo = Kerr(
        radius=jnp.asarray(1.0, dtype),
        a=jnp.asarray(0.3, dtype),
        horizon_epsilon=jnp.asarray(1e-3, dtype),
    )

    def make_disc(differentiable, **over):
        params = dict(
            inner_radius=2.2, outer_radius=5.0,
            temperature_model=ConstantTemperature(jnp.asarray(5000.0, dtype)),
            texture=BlackBodyMap.create(jnp.asarray(0.0, dtype), dtype=dtype),
            num_octaves=4, max_steps=500, step_size=0.01, thickness=0.3,
            density_multiplier=5.0, brightness_reference_temperature=1000.0,
            absorption=0.3, scattering=0.4, noise_scale=(2.0, 2.0, 2.0),
            noise_offset=0.4, dtype=dtype, differentiable=differentiable,
        )
        params.update(over)
        return VolumetricDisc.create(**params)

    # Chords through the emitting annulus, slightly tilted off-plane.
    rng = np.random.default_rng(11)
    n = 16
    phi = rng.uniform(0.0, 2 * np.pi, n)
    r0 = rng.uniform(2.6, 4.5, n)
    ro = np.stack([r0 * np.cos(phi), r0 * np.sin(phi), rng.uniform(-0.2, 0.2, n)], -1)
    tang = np.stack([-np.sin(phi), np.cos(phi), 0.1 * rng.standard_normal(n)], -1)
    rd = tang / np.linalg.norm(tang, axis=-1, keepdims=True)
    ro, rd = jnp.asarray(ro, dtype), jnp.asarray(rd, dtype)
    obs = jnp.ones((n,), dtype)
    # Sign convention: emitter_energy = u_t p_t + u_phi p_phi must be
    # POSITIVE for these scalars (u_t ~ 1.3, u_phi ~ 0.14 at r ~ 3.5).
    p_t = jnp.full((n,), 1.0, dtype)
    p_phi = jnp.full((n,), 0.2, dtype)
    act = jnp.ones((n,), bool)

    out_w = make_disc(False).raymarch(geo, ro, rd, obs, p_t, p_phi, act)
    out_d = make_disc(True).raymarch(geo, ro, rd, obs, p_t, p_phi, act)
    assert np.asarray(out_w).any(), "probe chords never emit"
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_w), rtol=1e-12, atol=1e-14)

    def loss(**over):
        disc = make_disc(True, **over)
        c = disc.raymarch(geo, ro, rd, obs, p_t, p_phi, act)[..., :3]
        return jnp.sum(c / (1.0 + c))

    # eps per parameter scaled to its gradient magnitude: central FD noise
    # is ~machine_eps·|f|/eps, and d loss/d absorption is ~5e-7 here — at
    # eps = 1e-6 the FD itself carries ~0.3% noise.
    for name, base, eps in (
        ("density_multiplier", 5.0, 1e-5),
        ("absorption", 0.3, 1e-4),
        ("noise_offset", 0.4, 1e-5),
    ):
        g = float(jax.grad(lambda v: loss(**{name: v}))(jnp.asarray(base, dtype)))
        fp = float(loss(**{name: jnp.asarray(base + eps, dtype)}))
        fm = float(loss(**{name: jnp.asarray(base - eps, dtype)}))
        fd = (fp - fm) / (2 * eps)
        assert np.isfinite(g) and abs(fd) > 0.0, f"{name}: g={g} fd={fd}"
        rel = abs(g - fd) / max(abs(fd), 1e-12)
        assert rel < 2e-4, f"{name}: vjp={g} fd={fd} rel={rel}"
