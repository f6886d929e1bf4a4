"""Inverse-rendering API: recover scene parameters by gradient descent.

Packages the px-gradient capability (BASELINE.json) as an optimization
loop — the reference (forward-only Rust) has no analog; the oracle is
self-consistency: a target rendered at known parameters must pull a
mis-initialized copy toward those values.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gr_raytracer_tpu import inverse, presets
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import scene as scn

ROWS = COLS = 8
A_TRUE = 0.62
A_INIT = 0.40


def _render(params):
    scene = presets.build_kerr_flagship(
        params, ROWS, COLS, max_steps=300, max_radius=30.0, step_size=0.05,
        differentiable=True,
    )
    rr, cc = jnp.meshgrid(
        jnp.arange(ROWS, dtype=jnp.float64),
        jnp.arange(COLS, dtype=jnp.float64),
        indexing="ij",
    )
    x, p = cam.pixel_rays(scene.camera, rr.ravel(), cc.ravel())
    return scn.trace_rays(scene, x, p).color


@pytest.fixture(scope="module")
def target():
    params = presets.kerr_flagship_params(jnp.float64)
    params = dict(params, a=jnp.asarray(A_TRUE, jnp.float64))
    return jax.jit(_render)(params)


def test_fit_recovers_spin(target):
    init = presets.kerr_flagship_params(jnp.float64)
    init = dict(init, a=jnp.asarray(A_INIT, jnp.float64))
    fitted, losses = inverse.fit(
        _render, init, target, trainable=["a"], steps=12, learning_rate=5e-2
    )
    # Loss decreases and the spin moves most of the way to a*.
    assert losses[-1] < losses[0]
    assert abs(float(fitted["a"]) - A_TRUE) < 0.4 * abs(A_INIT - A_TRUE)
    # Frozen parameters did not move.
    np.testing.assert_array_equal(
        np.asarray(fitted["camera_position"]), np.asarray(init["camera_position"])
    )
    np.testing.assert_array_equal(
        np.asarray(fitted["disc_temperature"]), np.asarray(init["disc_temperature"])
    )


def test_fit_rejects_unknown_trainable():
    init = presets.kerr_flagship_params(jnp.float64)
    with pytest.raises(ValueError, match="not in params"):
        inverse.fit(_render, init, jnp.zeros((1, 4)), trainable=["nope"], steps=1)


def test_image_loss_zero_at_target(target):
    assert float(inverse.image_loss(target, target)) == 0.0
    assert float(inverse.image_loss(target, inverse.log_radiance(target))) == 0.0


def test_fit_joint_two_parameters(target):
    """Joint recovery of spin AND disc temperature from the same target —
    the optimizer must make progress on both axes simultaneously."""
    t_true = float(presets.kerr_flagship_params(jnp.float64)["disc_temperature"])
    init = presets.kerr_flagship_params(jnp.float64)
    init = dict(
        init,
        a=jnp.asarray(A_INIT, jnp.float64),
        disc_temperature=jnp.asarray(t_true * 1.3, jnp.float64),
    )
    import optax

    # Per-parameter learning rates (spin is O(1), temperature O(1e4)).
    fitted, losses = inverse.fit(
        _render,
        init,
        target,
        trainable=["a", "disc_temperature"],
        steps=12,
        optimizer=optax.multi_transform(
            {"a": optax.adam(5e-2), "t": optax.adam(t_true * 0.05)},
            {k: ("t" if k == "disc_temperature" else "a") for k in init},
        ),
    )
    assert losses[-1] < losses[0]
    assert abs(float(fitted["a"]) - A_TRUE) < abs(A_INIT - A_TRUE)
    assert abs(float(fitted["disc_temperature"]) - t_true) < 0.3 * t_true


def test_pyramid_image_loss_basics(target):
    """pyramid_image_loss: zero at the target, positive off it, equals
    image_loss at pools=(1,), and rejects non-dividing pools."""
    loss1 = inverse.pyramid_image_loss(ROWS, COLS, (1,))
    lossp = inverse.pyramid_image_loss(ROWS, COLS, (1, 2, 4))
    assert float(lossp(target, target)) == 0.0
    shifted = target.at[..., :3].add(0.25)
    assert float(lossp(shifted, target)) > 0.0
    np.testing.assert_allclose(
        float(loss1(shifted, target)), float(inverse.image_loss(shifted, target)),
        rtol=1e-6,
    )
    with pytest.raises(ValueError, match="must divide"):
        inverse.pyramid_image_loss(ROWS, COLS, (3,))


def test_pyramid_loss_pooling_widens_basin(target):
    """A coarse pooled level must dominate the fine level's value for a
    misregistered copy of the SAME image (the property the 256² joint fit
    relies on): rolling the target by 2 px changes pooled-16 content far
    less than pixel content."""
    img = jnp.asarray(np.asarray(target).reshape(ROWS, COLS, 4))
    rolled = jnp.roll(img, 2, axis=1).reshape(ROWS * COLS, 4)
    fine = inverse.pyramid_image_loss(ROWS, COLS, (1,))
    coarse = inverse.pyramid_image_loss(ROWS, COLS, (4,))
    assert float(coarse(rolled, target)) < float(fine(rolled, target))
