"""Inverse rendering: fit physical scene parameters to a target image.

The capability the reference cannot offer (it is a forward-only Rust binary
with no autodiff): the whole pipeline here — camera build, geodesic
integration, event shading, alpha fold — is differentiable, so a scalar
image loss drives `jax.grad` on physical parameters (spin, mass, camera
pose, disc temperature, ...). This module packages the recipe demonstrated
by scripts/fit_spin.py as a small API.

Loss design: the renderer returns HDR CIE XYZ radiance spanning ~6 decades
(a 1e4 blackbody disc next to a ~1 checker background). A plain L2 loss is
dominated by the brightest pixels and Reinhard tone-mapping flushes their
gradients to ~1e-8; `log1p` keeps RELATIVE sensitivity uniform
(d log1p(c)/dθ = (dc/dθ)/(1+c)), which is what makes small-probe gradient
descent converge (see tests/test_grad.py and the committed fit_spin demo).
"""

from __future__ import annotations

from typing import Callable, Iterable, Mapping, Optional

import jax
import jax.numpy as jnp


def log_radiance(color):
    """log1p of the XYZ radiance channels of an [N, 4] XYZA buffer."""
    return jnp.log1p(color[..., :3])


def image_loss(rendered, target):
    """Mean squared log-radiance error between two [N, 4] XYZA buffers
    (`target` may already be log-radiance of shape [N, 3])."""
    t = target if target.shape[-1] == 3 else log_radiance(target)
    return jnp.mean((log_radiance(rendered) - t) ** 2)


def pyramid_image_loss(rows: int, cols: int, pools=(1, 4, 16)):
    """Multiscale log-radiance loss for GEOMETRIC parameters (camera pose,
    spin): the average of `image_loss` over avg-pooled copies of the image.

    A pixelwise loss puts a misregistered start in a plateau — a 0.1-rad
    camera-tilt error displaces features by dozens of pixels at 256², so
    every pixel compares unrelated content and the gradient points at
    darkening, not aligning (the failure mode the joint 3-parameter fit hit:
    disc temperature collapsed while tilt overshot). Pooling by p makes the
    same displacement ~p× smaller in pooled pixels, restoring overlap and a
    smooth descent direction; the fine level keeps sharp-feature sensitivity
    once coarse levels have aligned the geometry. Use as
    `fit(..., loss_fn=pyramid_image_loss(rows, cols))` on [rows·cols, 4]
    buffers."""
    pools = tuple(int(p) for p in pools)
    for p in pools:
        if rows % p or cols % p:
            raise ValueError(f"pool {p} must divide image shape {rows}x{cols}")

    def pooled(img, p):
        if p == 1:
            return img
        return img.reshape(rows // p, p, cols // p, p, 3).mean(axis=(1, 3))

    def loss(rendered, target):
        r = log_radiance(rendered).reshape(rows, cols, 3)
        t = target if target.shape[-1] == 3 else log_radiance(target)
        t = t.reshape(rows, cols, 3)
        terms = [jnp.mean((pooled(r, p) - pooled(t, p)) ** 2) for p in pools]
        return sum(terms) / len(pools)

    return loss


def fit(
    render_fn: Callable,
    init_params: Mapping,
    target,
    trainable: Iterable[str],
    steps: int = 50,
    optimizer=None,
    learning_rate: float = 3e-2,
    loss_fn: Optional[Callable] = None,
    callback: Optional[Callable] = None,
):
    """Gradient-descend `trainable` keys of a parameter dict to match a
    target image.

    render_fn(params) -> [N, 4] XYZA radiance buffer (jit-compatible).
    target: [N, 4] XYZA buffer (or [N, 3] log-radiance) to match.
    trainable: parameter names whose gradients are applied; every other
        leaf is frozen (masked to zero update).
    optimizer: any optax GradientTransformation; default optax.adam(lr).
    loss_fn(rendered, target) -> scalar; default `image_loss`.
    callback(step, loss, params): optional per-step observer.

    Returns (params, losses) with losses a list of per-step floats.
    """
    import optax

    trainable = frozenset(trainable)
    unknown = trainable - set(init_params)
    if unknown:
        raise ValueError(f"trainable names not in params: {sorted(unknown)}")
    if optimizer is None:
        optimizer = optax.adam(learning_rate)
    loss_fn = loss_fn or image_loss
    # Freeze non-trainable leaves by masking their updates to zero — the
    # renderer still differentiates through them (they just never move).
    mask = {k: (k in trainable) for k in init_params}
    optimizer = optax.chain(
        optimizer, optax.masked(optax.set_to_zero(), {k: not m for k, m in mask.items()})
    )

    params = dict(init_params)
    opt_state = optimizer.init(params)
    t = jnp.asarray(target)

    @jax.jit
    def step_fn(params, opt_state):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(render_fn(p), t))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = step_fn(params, opt_state)
        losses.append(float(loss))
        if callback is not None:
            callback(i, losses[-1], params)
    return params, losses
