"""Color pipeline tests (reference oracle values: src/rendering/color.rs tests
and src/rendering/scene.rs golden constants)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gr_raytracer_tpu.rendering import color


def test_srgb_to_xyz_roundtrip():
    c = jnp.array([255.0, 42.0, 10.0, 255.0])
    xyza = color.srgb8_to_xyza(c)
    back = color.xyz_to_srgb8(xyza[:3])
    np.testing.assert_array_equal(np.asarray(back), [255, 42, 10])


def test_known_xyz_values():
    # Constants the reference golden pixel tests rely on (scene.rs:386-405):
    # pure green (0,255,0) and pure red (255,0,0) map to matrix columns.
    green = color.srgb8_to_xyza(jnp.array([0.0, 255.0, 0.0]))
    np.testing.assert_allclose(
        np.asarray(green), [0.3575761, 0.7151522, 0.119192, 1.0], atol=1e-7
    )
    red = color.srgb8_to_xyza(jnp.array([255.0, 0.0, 0.0]))
    np.testing.assert_allclose(
        np.asarray(red), [0.4124564, 0.2126729, 0.0193339, 1.0], atol=1e-7
    )
    dark_green = color.srgb8_to_xyza(jnp.array([0.0, 100.0, 0.0]))
    np.testing.assert_allclose(
        np.asarray(dark_green),
        [0.04556866876322511, 0.09113733752645022, 0.015189552006485689, 1.0],
        atol=1e-12,
    )


def test_blend_transparent_foreground_keeps_background():
    bg = jnp.array([0.2, 0.4, 0.6, 1.0])
    fg = jnp.array([0.8, 0.1, 0.3, 0.0])
    out = color.blend(bg, fg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(bg))


def test_blend_two_fully_transparent_is_zero():
    bg = jnp.array([0.2, 0.4, 0.6, 0.0])
    fg = jnp.array([0.8, 0.1, 0.3, 0.0])
    out = color.blend(bg, fg)
    np.testing.assert_allclose(np.asarray(out), np.zeros(4))


def test_blend_mixes_channels():
    bg = jnp.array([0.2, 0.4, 0.6, 1.0])
    fg = jnp.array([0.6, 0.4, 0.2, 0.5])
    out = color.blend(bg, fg)
    np.testing.assert_allclose(np.asarray(out), [0.4, 0.4, 0.4, 1.0], atol=1e-15)


def test_beaming_multiplies_color_only():
    c = jnp.array([1.0, 2.0, 3.0, 0.5])
    out = color.apply_beaming(c, jnp.asarray(2.0), 3.0)
    np.testing.assert_allclose(np.asarray(out), [8.0, 16.0, 24.0, 0.5])


def test_reinhard_tone_map():
    lin = jnp.array([[1.0, 1.0, 1.0]])
    out = color.tone_map_linear_srgb(lin, method=color.TONE_MAPPING_REINHARD)
    luma = 0.2126 + 0.7152 + 0.0722
    np.testing.assert_allclose(np.asarray(out)[0], 1.0 / (1.0 + luma), rtol=1e-12)


def test_global_linear_tone_map_normalizes_max():
    lin = jnp.array([[0.5, 1.0, 2.0], [4.0, 0.1, 0.2]])
    out = np.asarray(color.tone_map_linear_srgb(lin, method=color.TONE_MAPPING_GLOBAL_LINEAR))
    assert out.max() == pytest.approx(1.0)
    np.testing.assert_allclose(out, np.asarray(lin) / 4.0)


def test_blackbody_srgb_swatches_exact():
    """Exact 8-bit sRGB of a sum-normalized blackbody at 1000 K (red) and
    10000 K (blue) — byte-for-byte the reference oracle
    (black_body_radiation.rs:63-73)."""
    from gr_raytracer_tpu.rendering import blackbody as bb

    for temperature, expected in ((1000.0, [255, 60, 0]), (10000.0, [137, 146, 172])):
        xyz = bb.blackbody_xyz(jnp.asarray(temperature))
        exposure = 1.0 / (xyz[0] + xyz[1] + xyz[2])
        srgb = color.xyz_to_srgb8(xyz[:3], exposure=exposure)
        np.testing.assert_array_equal(np.asarray(srgb), expected)
