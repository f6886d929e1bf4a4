"""Kernel-VJP exactness (ops/geodesic_adjoint.py): the custom backward —
an in-kernel checkpointed reverse sweep — must match central finite
differences of the ACTUAL kernel forward to f64 roundoff. This is the
discrete-adjoint test: FD differentiates exactly the function the custom
VJP claims to differentiate, so agreement pins the sweep end-to-end
(step replay, masked λ propagation, event-payload injection, parameter
partials). Reference being differentiated: the Kerr-Schild Hamiltonian
RHS (kerr.rs:162-186) through the full march + shading + fold."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gr_raytracer_tpu import presets
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import fast_path

ROWS, COLS = 4, 8
MAX_STEPS = 200
K_CKPT = 32


def _build(params):
    return presets.build_kerr_flagship(
        params, ROWS, COLS, max_steps=MAX_STEPS, max_radius=40.0, step_size=0.05
    )


@pytest.fixture(scope="module")
def loss_fn():
    base = presets.kerr_flagship_params(jnp.float64)
    spec = fast_path.scene_kernel_spec(_build(base))
    rr, cc = jnp.meshgrid(
        jnp.arange(ROWS, dtype=jnp.float64),
        jnp.arange(COLS, dtype=jnp.float64),
        indexing="ij",
    )
    rf, cf = rr.ravel(), cc.ravel()
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.uniform(0.5, 1.5, (ROWS * COLS, 3)))

    def loss(params):
        scene = _build(params)
        x, p = cam.pixel_rays(scene.camera, rf, cf)
        s = fast_path.trace_rays_fast_diff(
            scene, x, p, interpret=True, spec=spec, k_ckpt=K_CKPT
        )
        c = s.color[..., :3]
        return jnp.sum(w * (c / (1.0 + c)))

    return base, loss


def test_diff_path_exercises_both_shading_branches(loss_fn):
    """The probe must hit the disc AND escape to the celestial sphere, or
    the FD check would only cover one cotangent route."""
    from gr_raytracer_tpu.rendering import scene as scn

    base, _ = loss_fn
    scene = _build(base)
    spec = fast_path.scene_kernel_spec(scene)
    rr, cc = jnp.meshgrid(
        jnp.arange(ROWS, dtype=jnp.float64),
        jnp.arange(COLS, dtype=jnp.float64),
        indexing="ij",
    )
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    s = fast_path.trace_rays_fast_diff(scene, x, p, interpret=True, spec=spec, k_ckpt=K_CKPT)
    classes = np.asarray(s.ray_class)
    assert (classes == scn.HIT).any() and (classes == scn.ESCAPED).any()


@pytest.mark.parametrize(
    "name,eps",
    [("a", 1e-6), ("radius", 1e-6), ("camera_position", 1e-6)],
)
def test_kernel_vjp_matches_finite_differences(loss_fn, name, eps):
    base, loss = loss_fn
    grads = jax.grad(loss)(base)
    g = np.asarray(grads[name])

    if name == "camera_position":
        # One spatial component (z): gradient w.r.t. the ray origins flows
        # through λ across the whole march.
        unit = jnp.zeros(4, jnp.float64).at[3].set(1.0)
        perturb = lambda s: dict(base, camera_position=base["camera_position"] + s * unit)
        g = g[3]
    else:
        perturb = lambda s: dict(base, **{name: base[name] + s})
        g = float(g)

    fd = (float(loss(perturb(eps))) - float(loss(perturb(-eps)))) / (2 * eps)
    assert np.isfinite(g) and np.isfinite(fd)
    denom = max(abs(fd), 1e-12)
    rel = abs(g - fd) / denom
    assert rel < 5e-5, f"{name}: vjp={g} fd={fd} rel={rel}"
