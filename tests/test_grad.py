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
