"""Inverse rendering demo: recover the Kerr spin from a target image.

The capability the Rust reference cannot have: the whole pipeline (camera →
geodesic integration → event shading → tone fold) is differentiable, so a
scalar image loss drives `jax.grad` on physical parameters. Here a target
frame is rendered at a known spin a*, then gradient descent recovers a*
from a mis-initialized spin — the "px-gradient" capability row of
BASELINE.json exercised end-to-end as an optimization loop.

Run: python scripts/fit_spin.py  (CPU f64, ~2 min; prints the trajectory)
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from gr_raytracer_tpu import presets
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import scene as scn

ROWS = COLS = 12
MAX_STEPS = 400
A_TRUE = 0.62
A_INIT = 0.40


def render(a):
    params = presets.kerr_flagship_params(jnp.float64)
    params = dict(params, a=jnp.asarray(a, jnp.float64))
    scene = presets.build_kerr_flagship(
        params, ROWS, COLS, max_steps=MAX_STEPS, max_radius=30.0, step_size=0.05,
        differentiable=True,
    )
    rr, cc = jnp.meshgrid(
        jnp.arange(ROWS, dtype=jnp.float64),
        jnp.arange(COLS, dtype=jnp.float64),
        indexing="ij",
    )
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    color = scn.trace_rays(scene, x, p).color
    # Log radiance: Reinhard would saturate the ~1e4 HDR disc pixels and
    # flush their gradients to ~1e-8; log1p keeps RELATIVE sensitivity
    # (d log1p(c)/da = (dc/da)/(1+c) ~ d log T/da ~ O(1)).
    return jnp.log1p(color[:, :3])


def main():
    target = jax.jit(render)(A_TRUE)

    @jax.jit
    def loss_and_grad(a):
        def loss(a):
            return jnp.mean((render(a) - target) ** 2)

        return jax.value_and_grad(loss)(a)

    a = A_INIT
    # Adam: the loss has discrete steps (pixels flipping HIT/ESCAPED don't
    # backprop — stop_gradient on classification) riding a smooth basin
    # (ISCO-scaled disc edge, redshift, temperature are all smooth in a);
    # momentum + scale invariance walks through the small flat shelves.
    m = v = 0.0
    lr, b1, b2, eps = 0.02, 0.9, 0.999, 1e-12
    print(f"target spin a* = {A_TRUE}; init a0 = {A_INIT}")
    for it in range(60):
        l, g = loss_and_grad(a)
        g = float(g)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        mh = m / (1 - b1 ** (it + 1))
        vh = v / (1 - b2 ** (it + 1))
        a = float(min(max(a - lr * mh / (vh**0.5 + eps), 0.01), 0.98))
        if it % 5 == 0 or it == 59:
            print(f"  it {it:2d}  loss {float(l):.3e}  dL/da {g:+.3e}  a {a:.4f}")
        if float(l) < 1e-10:
            break
    err = abs(a - A_TRUE)
    print(f"recovered a = {a:.5f} (|error| = {err:.2e})")
    if err > 2e-2:
        raise SystemExit("spin recovery did not converge")


if __name__ == "__main__":
    main()
