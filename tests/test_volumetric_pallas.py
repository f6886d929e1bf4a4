"""Volumetric Pallas raymarch: parity vs the lax raymarch (interpret mode on
CPU; the compiled path runs on real TPU via the render driver). Covers the
Chebyshev replacements for the Novikov-Thorne radial LUT and the blackbody
log-T color LUT (ops/volumetric_pallas.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gr_raytracer_tpu.geometry.kerr import Kerr
from gr_raytracer_tpu.objects.volumetric_disc import VolumetricDisc
from gr_raytracer_tpu.ops import volumetric_pallas as vp
from gr_raytracer_tpu.rendering.temperature import build_disc_temperature
from gr_raytracer_tpu.rendering.texture import BlackBodyMap, CheckerMap


def make_disc(texture, geometry, inner=4.05, outer=16.0, max_steps=600, step_size=0.02):
    """Hero-scene-shaped volumetric disc (kerr-volumetric-streaky.toml
    parameters, shortened march for test speed)."""
    temp = build_disc_temperature(geometry.radius, geometry.a, 5000.0, outer)
    return VolumetricDisc.create(
        inner_radius=inner,
        outer_radius=outer,
        temperature_model=temp,
        texture=texture,
        num_octaves=8,
        perlin_seed=3,
        max_steps=max_steps,
        step_size=step_size,
        thickness=0.03,
        density_multiplier=500.0,
        brightness_reference_temperature=1000.0,
        absorption=0.3,
        scattering=0.4,
        noise_scale=(60.0, 2.0, 30.0),
        noise_offset=-0.2,
    )


def make_inputs(disc, n=512, seed=0):
    """Random rays entering the disc slab from above/below + some misses."""
    rng = np.random.default_rng(seed)
    r = rng.uniform(4.5, 14.0, n)
    phi = rng.uniform(0, 2 * np.pi, n)
    ro = np.stack([r * np.cos(phi), r * np.sin(phi), np.full(n, 0.09)], axis=-1)
    rd = np.stack(
        [rng.normal(0, 0.2, n), rng.normal(0, 0.2, n), -np.ones(n)], axis=-1
    )
    rd /= np.linalg.norm(rd, axis=-1, keepdims=True)
    # Conserved scalars shaped like real camera rays: emitter_energy
    # u_t p_t + u_φ p_φ must come out positive for emitting samples.
    obs = rng.uniform(0.9, 1.1, n)
    p_t = rng.uniform(0.8, 1.2, n)
    p_phi = rng.uniform(-0.5, 0.5, n)
    active = np.ones(n, bool)
    active[::17] = False
    ed = np.asarray(disc.exit_distance(jnp.asarray(ro), jnp.asarray(rd)))
    return (
        jnp.asarray(ro),
        jnp.asarray(rd),
        jnp.asarray(obs),
        jnp.asarray(p_t),
        jnp.asarray(p_phi),
        jnp.asarray(active),
        jnp.asarray(np.where(active, ed, 0.0)),
    )


@pytest.mark.parametrize("tex", ["blackbody", "checker"])
def test_volumetric_kernel_parity(tex):
    geometry = Kerr(radius=jnp.asarray(1.0), a=jnp.asarray(0.499), horizon_epsilon=jnp.asarray(1e-4))
    texture = (
        BlackBodyMap.create(jnp.asarray(0.0))
        if tex == "blackbody"
        else CheckerMap.from_srgb(2.0, 8.0, 8.0, (255, 120, 0), (120, 40, 0))
    )
    disc = make_disc(texture, geometry)
    assert vp.supports(disc, geometry)
    spec = vp.build_vol_spec(disc, geometry)
    ro, rd, obs, p_t, p_phi, active, ed = make_inputs(disc)

    ref = np.asarray(disc.raymarch(geometry, ro, rd, obs, p_t, p_phi, active))
    out = np.asarray(
        vp.raymarch(spec, ro, rd, obs, p_t, p_phi, active, ed, interpret=True)
    )

    # Alpha is LUT-free (pure march arithmetic): near-exact.
    np.testing.assert_allclose(out[:, 3], ref[:, 3], atol=1e-6)
    # Color: the kernel evaluates the blackbody integral via a ~1e-8 fit,
    # the lax path via the 1000-point linear LUT whose own error vs the
    # integral is ~1% at the steep low-T end (the reference budgets 2%,
    # texture.rs LUT-vs-direct test). Parity budget = that LUT error.
    scale = np.abs(ref[:, :3]).max()
    assert scale > 0
    np.testing.assert_allclose(out[:, :3], ref[:, :3], atol=1.5e-2 * scale)
    bright = np.abs(ref[:, :3]).max(axis=-1) > 1e-3 * scale
    rel = np.abs(out[bright, :3] - ref[bright, :3]) / np.abs(ref[bright, :3]).max(axis=-1, keepdims=True)
    assert rel.max() < 1.5e-2, rel.max()
    # Inactive lanes contribute nothing on both paths.
    assert (out[~np.asarray(active)] == 0).all()


def test_temperature_chebyshev_matches_lut():
    """T⁴ Chebyshev fit over the disc's emitting range [inner, outer]
    matches the Novikov-Thorne LUT to ~1e-4 of the peak temperature."""
    geometry = Kerr(radius=jnp.asarray(1.0), a=jnp.asarray(0.499), horizon_epsilon=jnp.asarray(1e-4))
    model = build_disc_temperature(geometry.radius, geometry.a, 5000.0, 16.0)
    spec = vp.build_temp_spec(model, 4.05, 16.0)
    r = jnp.linspace(spec.lo, spec.hi, 4001)
    t_lut = np.asarray(model.at(r))
    t4 = np.maximum(np.asarray(vp.cheb_eval(spec.coeffs, spec.lo, spec.hi, r)), 0.0)
    t_fit = np.sqrt(np.sqrt(t4))
    np.testing.assert_allclose(t_fit, t_lut, atol=2e-4 * t_lut.max())


def test_blackbody_chebyshev_matches_integral():
    """The split-domain log-XYZ Chebyshev fits (deg 16/12 over the two
    log₁₀T domains) reproduce the exact Planck×CIE integral to ≤5e-5
    relative — far tighter than the lax path's 1000-point LUT, whose error
    vs the same integral is ~1% (the reference budgets 2%)."""
    from gr_raytracer_tpu.rendering import blackbody

    texture = BlackBodyMap.create(jnp.asarray(0.0))
    spec = vp.build_tex_spec(texture)
    l = jnp.linspace(spec.lo, spec.hi, 1501)
    exact = np.asarray(blackbody.blackbody_xyz(10.0 ** l))[:, :3]
    in_hi = l >= spec.split
    fit = np.stack(
        [
            10.0
            ** np.asarray(
                vp.cheb_eval_dual(c, c2, spec.lo, spec.split, spec.hi, in_hi, l)
            )
            for c, c2 in ((spec.cx, spec.cx2), (spec.cy, spec.cy2), (spec.cz, spec.cz2))
        ],
        axis=-1,
    )
    sig = exact > 1e-12 * exact.max()
    rel = np.abs(fit[sig] - exact[sig]) / exact[sig]
    assert rel.max() < 5e-5, rel.max()


def test_saturation_early_exit_is_negligible(monkeypatch):
    """Dense lanes retire once transparency < SATURATION_EPS (a beyond-the-
    reference lever; volumetric_disc.rs marches the full budget). Truncation
    error bound: remaining emission weights decay geometrically from eps, so
    XYZ moves by < eps * intensity. Verify against an eps=0 (full-budget)
    march on a dense disc: saturated lanes exist, colors match tightly."""
    import gr_raytracer_tpu.objects.volumetric_disc as vd

    geometry = Kerr(radius=jnp.asarray(1.0), a=jnp.asarray(0.499), horizon_epsilon=jnp.asarray(1e-4))
    texture = BlackBodyMap.create(jnp.asarray(0.0))
    # 6x the hero density -> optical depth >> 16 across the slab.
    disc = make_disc(texture, geometry, max_steps=1200)
    disc = disc.replace(density_multiplier=jnp.asarray(3000.0, jnp.float64))
    ro, rd, obs, p_t, p_phi, active, ed = make_inputs(disc)

    fast = np.asarray(disc.raymarch(geometry, ro, rd, obs, p_t, p_phi, active))
    monkeypatch.setattr(vd, "SATURATION_EPS", 0.0)
    full = np.asarray(disc.raymarch(geometry, ro, rd, obs, p_t, p_phi, active))

    # The lever engages: some lanes reach (near-)full opacity.
    assert (full[:, 3] > 0.999).any()
    scale = np.abs(full[:, :3]).max()
    np.testing.assert_allclose(fast[:, :3], full[:, :3], atol=1e-5 * scale)
    np.testing.assert_allclose(fast[:, 3], full[:, 3], atol=1e-6)

    # The Pallas kernel applies the same rule: parity with the truncated lax
    # march stays within the standing LUT budget.
    monkeypatch.setattr(vd, "SATURATION_EPS", 1e-7)
    spec = vp.build_vol_spec(disc, geometry)
    out = np.asarray(vp.raymarch(spec, ro, rd, obs, p_t, p_phi, active, ed, interpret=True))
    np.testing.assert_allclose(out[:, 3], fast[:, 3], atol=1e-6)
    np.testing.assert_allclose(out[:, :3], fast[:, :3], atol=1.5e-2 * scale)
