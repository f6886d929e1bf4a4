"""Volumetric raymarch kernel VJP (ops/volumetric_adjoint.py): forward
parity vs the production kernel, and finite-difference exactness of the
medium-parameter and per-lane input gradients in f64 interpret mode —
the suffix-sum backward differentiates the DISCRETE forward map, so central
FD of the actual kernel forward must agree to f64 roundoff (the geodesic
adjoint's standard, tests/test_adjoint.py). Covers BASELINE config #5's
gradient pass (volumetric_disc.rs:199-328 is the march being
differentiated)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gr_raytracer_tpu.geometry.kerr import Kerr
from gr_raytracer_tpu.ops import volumetric_adjoint as va
from gr_raytracer_tpu.ops import volumetric_pallas as vp

from test_volumetric_pallas import make_disc, make_inputs
from gr_raytracer_tpu.rendering.texture import BlackBodyMap


MED_NAMES = ("density_multiplier", "noise_offset", "absorption", "scattering",
             "brightness_ref")


@pytest.fixture(scope="module")
def setup():
    geometry = Kerr(
        radius=jnp.asarray(1.0), a=jnp.asarray(0.45),
        horizon_epsilon=jnp.asarray(1e-4),
    )
    disc = make_disc(BlackBodyMap.create(jnp.asarray(0.0)), geometry, max_steps=200)
    # 3 fBm octaves: the adjoint math is octave-count-independent and the
    # interpret-mode compile of the vjp'd optics grows ~linearly with the
    # stack (8 octaves: ~5 min; 3: tens of seconds).
    disc = disc.replace(num_octaves=3)
    spec = vp.build_vol_spec(disc, geometry)
    inputs = make_inputs(disc, n=256, seed=2)
    med = tuple(
        jnp.asarray(v, jnp.float64)
        for v in (spec.density_multiplier, spec.noise_offset, spec.absorption,
                  spec.scattering, spec.brightness_ref)
    )
    march = va.make_vol_march_diff(spec, interpret=True)
    return spec, inputs, med, march


def _loss_weights(n, seed=7):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0.5, 1.5, (n, 4)))


def _loss(march, med, ro, rd, obs, p_t, p_phi, act_f, ed, wts):
    acc, t_fin, ws, wt = march(*med, ro, rd, obs, p_t, p_phi, act_f, ed)
    xyza = va.combine_alpha(acc, t_fin, ws, wt)
    return jnp.sum(xyza * wts)


def test_forward_parity_vs_production_kernel(setup):
    """The diff forward's raw reductions recombined match the production
    kernel's XYZA to f64 roundoff (same expression tree; the only delta is
    traced-SMEM scalars replacing immediate constants, which moves FMA
    selection by ≤1 ulp — measured max rel 1.1e-15)."""
    spec, (ro, rd, obs, p_t, p_phi, active, ed), med, march = setup
    ref = np.asarray(vp.raymarch(spec, ro, rd, obs, p_t, p_phi, active, ed, interpret=True))
    acc, t_fin, ws, wt = march(*med, ro, rd, obs, p_t, p_phi,
                               active.astype(ro.dtype), ed)
    out = np.asarray(va.combine_alpha(acc, t_fin, ws, wt))
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=0.0)


@pytest.mark.parametrize("pi", range(5), ids=MED_NAMES)
def test_kernel_vjp_fd_medium_params(setup, pi):
    """Central FD of the kernel forward over each medium parameter matches
    the kernel-VJP gradient (f64 interpret)."""
    spec, (ro, rd, obs, p_t, p_phi, active, ed), med, march = setup
    act_f = active.astype(ro.dtype)
    wts = _loss_weights(ro.shape[0])

    f = lambda *m: _loss(march, m, ro, rd, obs, p_t, p_phi, act_f, ed, wts)
    grads = jax.grad(f, argnums=tuple(range(5)))(*med)
    g = float(grads[pi])

    base = float(med[pi])
    h = max(abs(base), 1.0) * 3e-6
    bump = lambda d: tuple(
        m + (d if i == pi else 0.0) for i, m in enumerate(med)
    )
    fd = (f(*bump(h)) - f(*bump(-h))) / (2.0 * h)
    fd = float(fd)
    assert np.isfinite(g)
    # The march is piecewise-smooth in the medium params (no discrete
    # decision depends on them except the saturation step; the probe scene
    # stays unsaturated at 400 steps), so FD agreement is tight.
    assert g == pytest.approx(fd, rel=2e-5, abs=1e-10), (MED_NAMES[pi], g, fd)


@pytest.mark.parametrize("which", ["ro", "rd", "obs"])
def test_kernel_vjp_fd_ray_inputs(setup, which):
    """Per-lane input cotangents (the chain into the geodesic pass): FD over
    a few single-lane perturbations. ro/rd move the sample positions with
    the k-grid locally constant (the same convention the payload cotangent
    uses); lanes are chosen away from clip-boundary flips."""
    spec, (ro, rd, obs, p_t, p_phi, active, ed), med, march = setup
    act_f = active.astype(ro.dtype)
    wts = _loss_weights(ro.shape[0])

    def f(ro_, rd_, obs_):
        return _loss(march, med, ro_, rd_, obs_, p_t, p_phi, act_f, ed, wts)

    g_ro, g_rd, g_obs = jax.grad(f, argnums=(0, 1, 2))(ro, rd, obs)
    assert bool(jnp.all(jnp.isfinite(g_ro)))
    assert bool(jnp.all(jnp.isfinite(g_rd)))
    assert bool(jnp.all(jnp.isfinite(g_obs)))

    rng = np.random.default_rng(3)
    lanes = rng.choice(np.nonzero(np.asarray(active))[0], size=6, replace=False)
    checked = 0
    for lane in lanes:
        axis = int(rng.integers(0, 3))

        def fd_at(h):
            if which == "obs":
                d = jnp.zeros_like(obs).at[lane].set(h)
                return float((f(ro, rd, obs + d) - f(ro, rd, obs - d)) / (2 * h))
            if which == "ro":
                d = jnp.zeros_like(ro).at[lane, axis].set(h)
                return float((f(ro + d, rd, obs) - f(ro - d, rd, obs)) / (2 * h))
            d = jnp.zeros_like(rd).at[lane, axis].set(h)
            return float((f(ro, rd + d, obs) - f(ro, rd - d, obs)) / (2 * h))

        h = 1e-6 if which == "obs" else 1e-7
        fd, fd2 = fd_at(h), fd_at(h / 2)
        if which == "obs":
            g = float(g_obs[lane])
        elif which == "ro":
            g = float(g_ro[lane, axis])
        else:
            g = float(g_rd[lane, axis])
        if abs(fd) < 1e-12 and abs(g) < 1e-12:
            continue
        # FD-stability gate: the obs→redshift chain crosses the texture
        # LUT's clip/domain boundaries and ro/rd FD crosses fBm lattice
        # cells — where the two step sizes disagree, the difference
        # quotient (not the VJP) is the unstable quantity; the medium-
        # param test pins VJP exactness at 1e-10 globally.
        if abs(fd - fd2) > 1e-3 * max(abs(fd), abs(fd2)):
            continue
        assert g == pytest.approx(fd2, rel=1e-3, abs=1e-9), (which, lane, g, fd2)
        checked += 1
    assert checked >= 2


def test_scene_level_vol_diff_fd():
    """Scene-level gradient through make_fast_vol_diff_tracer (geometric
    kernel pass + compacted kernel-VJP raymarch + fold) FD-pinned on a tiny
    Kerr volumetric scene — the end-to-end shape of BASELINE config #5's
    gradient pass."""
    from gr_raytracer_tpu import config as cfgmod
    from gr_raytracer_tpu.rendering import fast_path

    cfg = cfgmod.parse_config(
        """
celestial_temperature = 5000.0

[geometry_type.Kerr]
radius = 1.0
a = 0.45
horizon_epsilon = 1e-4

[[objects]]
[objects.VolumetricDisc]
inner_radius = 4.05
outer_radius = 16.0
temperature = 5000.0
num_octaves = 3
perlin_seed = 3
max_steps = 300
step_size = 0.02
thickness = 0.03
density_multiplier = 500.0
brightness_reference_temperature = 1000.0
absorption = 0.3
scattering = 0.4
noise_scale = [60.0, 2.0, 30.0]
noise_offset = -0.2
[objects.VolumetricDisc.texture.BlackBody]
beaming_exponent = 0.0
"""
    )
    # Hero #5's camera geometry (BASELINE.md config #5) — a straight-down
    # 12×12 view misses the thin slab entirely (0 events).
    opts = cfgmod.RenderOptions(
        width=12, height=12, max_steps=600, step_size=0.01,
        camera_position=(-10.0, 0.0, -0.5), theta=1.52, psi=-1.57,
    )
    scene = cfgmod.create_scene_host(cfg, opts, jnp.float64)
    assert fast_path.supports_vol_diff(scene)

    rows, cols = jnp.meshgrid(
        jnp.arange(12, dtype=jnp.float64), jnp.arange(12, dtype=jnp.float64),
        indexing="ij",
    )
    rf, cf = rows.reshape(-1), cols.reshape(-1)
    tracer = fast_path.make_fast_vol_diff_tracer(scene, bucket=256, interpret=True)

    obj = scene.objects[0]
    med0 = tuple(
        jnp.asarray(v, jnp.float64)
        for v in (obj.density_multiplier, obj.noise_offset, obj.absorption,
                  obj.scattering, obj.brightness_reference_temperature)
    )

    def loss(med):
        color, _, overflow = tracer(med, scene, rf, cf)
        return jnp.sum(color[:, :3]), overflow

    (val, overflow), grads = jax.value_and_grad(loss, has_aux=True)(med0)
    assert not bool(overflow)
    assert np.isfinite(float(val)) and float(val) > 0.0
    g = np.asarray([float(x) for x in grads])
    assert np.all(np.isfinite(g))
    assert np.any(g != 0.0)

    # FD over density_multiplier — the fit parameter the bench recovers.
    h = 500.0 * 3e-6
    lp = float(loss((med0[0] + h,) + med0[1:])[0])
    lm = float(loss((med0[0] - h,) + med0[1:])[0])
    fd = (lp - lm) / (2 * h)
    assert float(grads[0]) == pytest.approx(fd, rel=2e-5, abs=1e-10)
