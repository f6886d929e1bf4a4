"""Texture tests: bilinear bitmap corners, checker parity, blackbody LUT vs
direct integration, beaming semantics.

Mirrors texture.rs tests (:332-399 corners, :476-489 LUT-vs-direct <=2%)."""

import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu.rendering.blackbody import blackbody_xyz
from gr_raytracer_tpu.rendering.color import srgb8_to_xyza
from gr_raytracer_tpu.rendering.texture import BitmapMap, BlackBodyMap, CheckerMap

RED = (255, 0, 0, 128)
BLUE = (0, 0, 255, 128)


def checker_bitmap():
    """2×2 texture: red on the main diagonal, blue off it, alpha 128."""
    img = np.array([[RED, BLUE], [BLUE, RED]], np.float64)
    return BitmapMap(image=srgb8_to_xyza(jnp.asarray(img)), beaming_exponent=jnp.asarray(0.0))


def sample(tex, u, v, t=0.0, z=1.0):
    return np.asarray(
        tex.color_at_uv(jnp.asarray(u), jnp.asarray(v), jnp.asarray(t), jnp.asarray(z))
    )


def test_bitmap_corners():
    tex = checker_bitmap()
    red = np.asarray(srgb8_to_xyza(jnp.asarray(RED, jnp.float64)))
    blue = np.asarray(srgb8_to_xyza(jnp.asarray(BLUE, jnp.float64)))
    np.testing.assert_allclose(sample(tex, 0.0, 0.0), red, atol=1e-12)
    np.testing.assert_allclose(sample(tex, 0.999, 0.999), red, atol=1e-12)
    np.testing.assert_allclose(sample(tex, 0.0, 0.999), blue, atol=1e-12)
    np.testing.assert_allclose(sample(tex, 0.999, 0.0), blue, atol=1e-12)
    assert sample(tex, 0.0, 0.0)[3] == 128.0 / 255.0


def test_bitmap_bilinear_midpoint():
    tex = checker_bitmap()
    red = np.asarray(srgb8_to_xyza(jnp.asarray(RED, jnp.float64)))
    blue = np.asarray(srgb8_to_xyza(jnp.asarray(BLUE, jnp.float64)))
    # u=v=0.25 -> px=py=0.5 -> equal blend of the 4 texels.
    got = sample(tex, 0.25, 0.25)
    np.testing.assert_allclose(got, 0.5 * (red + blue), atol=1e-12)


def test_bitmap_beaming_changes_color_not_alpha():
    img = np.array([[RED, BLUE], [BLUE, RED]], np.float64)
    tex = BitmapMap(image=srgb8_to_xyza(jnp.asarray(img)), beaming_exponent=jnp.asarray(3.0))
    base = checker_bitmap()
    z = 1.3
    got = sample(tex, 0.0, 0.0, z=z)
    want = sample(base, 0.0, 0.0, z=z)
    np.testing.assert_allclose(got[:3], want[:3] * z**3, rtol=1e-12)
    assert got[3] == want[3]


def test_checker_pattern():
    tex = CheckerMap.from_srgb(0.0, 2.0, 2.0, (255, 0, 0), (0, 0, 255))
    red = np.asarray(srgb8_to_xyza(jnp.asarray((255, 0, 0), jnp.float64)))
    np.testing.assert_allclose(sample(tex, 0.1, 0.1)[:3], red[:3], atol=1e-12)
    blue = np.asarray(srgb8_to_xyza(jnp.asarray((0, 0, 255), jnp.float64)))
    np.testing.assert_allclose(sample(tex, 0.6, 0.1)[:3], blue[:3], atol=1e-12)
    np.testing.assert_allclose(sample(tex, 0.6, 0.6)[:3], red[:3], atol=1e-12)


def test_blackbody_lut_matches_direct_integration():
    """LUT at T·z vs direct z⁵·B(λz, T) integration, ≤2% per channel
    (texture.rs:476-489; the Wien shortcut is exact, the LUT interpolates)."""
    mapper = BlackBodyMap.create(0.0, dtype=jnp.float64)
    for temperature in [1_000.0, 5_000.0, 10_000.0, 100_000.0]:
        for redshift in [0.5, 1.0, 2.0]:
            lut = np.asarray(mapper.sample(jnp.asarray(temperature * redshift)))[:3]
            direct = np.asarray(
                blackbody_xyz(jnp.asarray(temperature), jnp.asarray(redshift))
            )[:3]
            np.testing.assert_allclose(lut, direct, rtol=0.02, atol=1e-14)


def test_blackbody_beaming_stacks_on_physical():
    mapper = BlackBodyMap.create(3.0, dtype=jnp.float64)
    base = BlackBodyMap.create(0.0, dtype=jnp.float64)
    z = 0.8
    got = sample(mapper, 0.0, 0.0, t=6000.0, z=z)
    want = sample(base, 0.0, 0.0, t=6000.0, z=z)
    np.testing.assert_allclose(got[:3], want[:3] * z**3, rtol=1e-12)


def test_blackbody_z_one_matches_lut_sample():
    """At z = 1 color_at_uv must be exactly the LUT entry at T_em
    (texture.rs:402-412)."""
    from gr_raytracer_tpu.rendering.texture import BlackBodyMap

    mapper = BlackBodyMap.create(0.0)
    for t in (1_000.0, 5_000.0, 10_000.0):
        observed = np.asarray(mapper.color_at_uv(0.0, 0.0, jnp.asarray(t), jnp.asarray(1.0)))
        lut = np.asarray(mapper.sample(jnp.asarray(t)))
        np.testing.assert_allclose(observed, lut, rtol=1e-12)


def test_blackbody_boost_increases_every_component():
    """Doubling z must raise each XYZ component — the Wien T·z shift plus the
    implicit z⁵ boost is present and not inverted (texture.rs:414-429)."""
    from gr_raytracer_tpu.rendering.texture import BlackBodyMap

    mapper = BlackBodyMap.create(0.0)
    base = np.asarray(mapper.color_at_uv(0.0, 0.0, jnp.asarray(6000.0), jnp.asarray(1.0)))
    boosted = np.asarray(mapper.color_at_uv(0.0, 0.0, jnp.asarray(6000.0), jnp.asarray(2.0)))
    assert (boosted[:3] > base[:3]).all()


def test_blackbody_direct_xyz_boost_doubles_wien_shift():
    """The direct (non-LUT) integration path: blackbody_xyz(T, z) equals
    z-scaled physics — cross-check z⁵·B(λz, T) against blackbody_xyz(T·z)·z⁵
    · (1/z⁵) consistency via the Wien identity B(λ·z, T) = B(λ, T·z)/z⁵."""
    from gr_raytracer_tpu.rendering import blackbody

    t, z = 6000.0, 1.5
    shifted = np.asarray(blackbody.blackbody_xyz(jnp.asarray(t), jnp.asarray(z)))
    wien = np.asarray(blackbody.blackbody_xyz(jnp.asarray(t * z), jnp.asarray(1.0)))
    np.testing.assert_allclose(shifted, wien, rtol=1e-10)
