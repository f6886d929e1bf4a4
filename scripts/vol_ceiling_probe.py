"""Pure-ALU ceiling for the volumetric raymarch's per-sample expression
(r3 verdict item 2a: the vol analog of alu_ceiling_probe.py).

Hero #5 is volumetric-raymarch-bound (BASELINE.md): ~73% of its 733.7 s is
AA sub-rays at ~20.8k rays/s through ops/volumetric_pallas.py. This probe
marches synthetic full-occupancy blocks (no early exit, no clipping, every
lane live every step) through the EXACT production per-sample expression —
`volumetric_pallas._sample_optics` + the carry update, the same code object
the kernel runs — and through ablations that patch out one term at a time,
so the cost decomposes:

  full        _sample_optics + carry update (the production sample)
  no_tex      texture (3× deg-48 log-XYZ Clenshaw + exp) -> constants
  no_noise    fBm (9-octave + 1 extra hash Perlin) -> constants
  no_both     both patched out (envelopes + redshift + temperature + carry)
  noise_only  position advance + the noise stack alone
  advance     position advance + accumulate (loop floor)

The spec is built from the vendored kerr-volumetric-streaky scene so every
constant (octaves, Chebyshev degrees, envelopes) is the production one.

Usage: python scripts/vol_ceiling_probe.py [--steps N] [--n N] [--tile T]
       [--modes full,no_tex,...] [--json out.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gr_raytracer_tpu.ops import noise
from gr_raytracer_tpu.ops import volumetric_pallas as vp

SUB = 8


def build_spec():
    from gr_raytracer_tpu import config as cfgmod
    from gr_raytracer_tpu.utils import assets

    cfg = cfgmod.load_config(assets.scene_path("kerr-volumetric-streaky.toml"))
    opts = cfgmod.RenderOptions(
        width=8, height=8, max_steps=2000,
        camera_position=(-10.0, 0.0, -0.5), theta=1.52, psi=-1.57,
    )
    scene = cfgmod.create_scene(cfg, opts, jnp.float32)
    obj = next(o for o in scene.objects if hasattr(o, "noise_scale"))
    return vp.build_vol_spec(obj, scene.geometry)


def _probe_kernel(in_ref, out_ref, *, spec, steps, mode):
    data = in_ref[:, :]
    var = lambda i: data[i * SUB : (i + 1) * SUB]
    rox, roy, roz = var(0), var(1), var(2)
    rdx, rdy, rdz = var(3), var(4), var(5)
    obs_e, p_t, p_phi = var(6), var(7), var(8)
    d_s = spec.step_size
    sigma = spec.absorption + spec.scattering
    shape = rox.shape
    dtype = data.dtype

    def advance(k):
        d_o = k * d_s
        return rox + rdx * d_o, roy + rdy * d_o, roz + rdz * d_o

    if mode in ("full", "no_tex", "no_noise", "no_both"):

        def body(i, c):
            k, tr, cx, cy, cz, ws, wt = c
            px, py, pz = advance(k)
            density, emit_ok, ex, ey, ez, lalpha = vp._sample_optics(
                spec, px, py, pz, obs_e, p_t, p_phi
            )
            attenuation = jnp.exp(-d_s * density * sigma)
            tr_new = tr * attenuation
            weight = tr_new * attenuation * spec.scattering * density * d_s
            emit_f = jnp.where(emit_ok, 1.0, 0.0)
            wscale = weight * emit_f
            alpha_w = jnp.where(emit_ok, density * d_s, 0.0)
            return (
                k + 1.0,
                tr_new,
                cx + wscale * ex,
                cy + wscale * ey,
                cz + wscale * ez,
                ws + jnp.clip(lalpha, 0.0, 1.0) * alpha_w,
                wt + alpha_w,
            )

    elif mode == "noise_only":

        def body(i, c):
            k, tr, cx, cy, cz, ws, wt = c
            px, py, pz = advance(k)
            key = jnp.uint32(spec.key)
            n = noise.fbm_lanes(
                key,
                px * spec.noise_scale[0],
                py * spec.noise_scale[1],
                pz * spec.noise_scale[1],
                spec.num_octaves,
                0.5,
            )
            n = n + 0.5 * noise.perlin3_lanes(key, px * 0.5, py, pz)
            return (k + 1.0, tr, cx + n, cy, cz, ws, wt)

    else:  # advance

        def body(i, c):
            k, tr, cx, cy, cz, ws, wt = c
            px, py, pz = advance(k)
            return (k + 1.0, tr, cx + px * py * pz, cy, cz, ws, wt)

    z = jnp.zeros(shape, dtype)
    c0 = (z, jnp.ones(shape, dtype), z, z, z, z, z)
    c = jax.lax.fori_loop(0, steps, body, c0)
    out_ref[:, :] = jnp.concatenate([c[2], c[3], c[4], c[1]], axis=0)


def synthetic_lanes(spec, n):
    """Lanes inside the disc band: r in the emitting annulus, |h| within the
    vertical envelope, direction near-tangential so lanes STAY in the band
    for the whole probe march (full occupancy — the ceiling regime)."""
    rng = np.random.default_rng(0)
    r = rng.uniform(spec.inner * 1.2, spec.outer * 0.8, n)
    phi = rng.uniform(0.0, 2 * np.pi, n)
    h = rng.uniform(-0.3, 0.3, n) * spec.thickness
    ro = np.stack([r * np.cos(phi), r * np.sin(phi), h], axis=-1)
    tang = np.stack([-np.sin(phi), np.cos(phi), 0.02 * rng.standard_normal(n)], -1)
    rd = tang / np.linalg.norm(tang, axis=-1, keepdims=True)
    obs_e = np.ones(n)
    p_t = -np.ones(n)
    p_phi = 2.0 + 0.1 * rng.standard_normal(n)
    cols = [ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2], obs_e, p_t, p_phi]
    return np.stack([np.asarray(c, np.float32) for c in cols], axis=0)


def _patches(mode):
    const_tex = lambda spec, u, v, t, z: (t * 0 + 1.0, t * 0 + 1.0, t * 0 + 1.0, t * 0 + 1.0)
    const_fbm = lambda key, x, y, z, o, h=0.5: x * 0 + 0.35
    const_perlin = lambda key, x, y, z: x * 0 + 0.1
    ps = []
    if mode in ("no_tex", "no_both"):
        ps.append(mock.patch.object(vp, "_texture_color", const_tex))
    if mode in ("no_noise", "no_both"):
        ps.append(mock.patch.object(noise, "fbm_lanes", const_fbm))
        ps.append(mock.patch.object(noise, "perlin3_lanes", const_perlin))
    return ps


def run(spec, mode, tile, n, steps, repeats=3):
    lane = tile // SUB
    nvars = 9
    grid = (n // tile,)
    bspec = lambda rows: pl.BlockSpec(
        (rows * SUB, lane), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    data = synthetic_lanes(spec, n)
    # [9, n] -> (9*SUB, n//SUB) tiles, block-contiguous like vp._to_tiles
    tiled = np.concatenate(
        [vp._to_tiles(jnp.asarray(data[i]), n // (SUB * lane)) for i in range(nvars)], axis=0
    )
    kernel = functools.partial(_probe_kernel, spec=spec, steps=steps, mode=mode)
    fn = jax.jit(
        lambda a: pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[bspec(nvars)],
            out_specs=bspec(4),
            out_shape=jax.ShapeDtypeStruct((4 * SUB, n // SUB), jnp.float32),
            interpret=jax.default_backend() != "tpu",  # CPU smoke only
        )(a)
    )
    ctxs = _patches(mode)
    for c in ctxs:
        c.start()
    try:
        t0 = time.perf_counter()
        out = jax.device_get(fn(jnp.asarray(tiled)))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = jax.device_get(fn(jnp.asarray(tiled)))
            best = min(best, time.perf_counter() - t0)
    finally:
        for c in ctxs:
            c.stop()
    rate = n * steps / best
    assert np.isfinite(out).all()
    print(
        f"mode={mode:10s} tile={tile:5d} compile={compile_s:6.1f}s "
        f"march={best * 1e3:8.2f} ms  {rate / 1e6:8.1f} M samples/s",
        flush=True,
    )
    return rate


VPU_F32_PEAK = 7.1e12  # v5e VPU f32 FLOP/s estimate (BASELINE.md march roofline)


def utilization_block(spec, rates):
    """March-style utilization (r4 verdict item 3): XLA-counted FLOPs of the
    EXACT per-sample expression (same code object the kernel runs) × the
    measured sample rates ÷ the VPU f32 peak. This replaces the term-
    ablation decomposition as the scoreboard argument — patching terms out
    of a latency-hiding serial mix can make the kernel SLOWER (r4's
    committed artifact showed advance 558 M < full 698 M), so ablation
    deltas are not costs. The caveat that counted FLOPs under-weigh
    transcendentals (exp/rsqrt/divide occupy multiple VPU passes per
    counted FLOP, and this expression is transcendental-dense: fBm hash
    floors + exp envelopes + Clenshaw + exp) carries over from the march
    roofline verbatim."""
    n = 1024

    def one_sample(args):
        px, py, pz, obs_e, p_t, p_phi, tr = args
        d_s = spec.step_size
        sigma = spec.absorption + spec.scattering
        density, emit_ok, ex, ey, ez, lalpha = vp._sample_optics(
            spec, px, py, pz, obs_e, p_t, p_phi
        )
        attenuation = jnp.exp(-d_s * density * sigma)
        tr_new = tr * attenuation
        weight = tr_new * attenuation * spec.scattering * density * d_s
        emit_f = jnp.where(emit_ok, 1.0, 0.0)
        alpha_w = jnp.where(emit_ok, density * d_s, 0.0)
        return (
            tr_new,
            weight * emit_f * ex,
            weight * emit_f * ey,
            weight * emit_f * ez,
            jnp.clip(lalpha, 0.0, 1.0) * alpha_w,
        )

    shp = jax.ShapeDtypeStruct((n,), jnp.float32)
    compiled = jax.jit(one_sample).lower((shp,) * 7).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_sample = float(ca["flops"]) / n
    out = {
        "flops_per_sample_xla": round(flops_sample, 1),
        "vpu_f32_peak_est": VPU_F32_PEAK,
        "pct_of_peak": {
            k: round(100.0 * flops_sample * v / VPU_F32_PEAK, 1)
            for k, v in rates.items()
        },
        "note": "counted-FLOP utilization; transcendental-dense expression "
        "(fBm hash floors, exp envelopes, Clenshaw, exp) occupies multiple "
        "VPU passes per counted FLOP, same caveat as the march roofline",
    }
    print(f"[utilization] {out['flops_per_sample_xla']} FLOPs/sample (XLA), "
          f"pct_of_peak={out['pct_of_peak']}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--n", type=int, default=1 << 16)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--modes", default="full,no_tex,no_noise,no_both,noise_only,advance")
    ap.add_argument("--json", default=None)
    ap.add_argument("--vol-sustained", type=float, default=None,
                    help="production-kernel samples/s (bench.py vol_sustained) "
                    "to include in the utilization block")
    args = ap.parse_args()
    spec = build_spec()
    print(
        f"backend={jax.default_backend()} n={args.n} steps={args.steps} "
        f"octaves={spec.num_octaves} temp_deg={len(spec.temp.coeffs) - 1 if spec.temp.coeffs else 0} "
        f"bb_deg={len(spec.tex.cx) - 1 if spec.tex.cx else 0}"
    )
    rates = {}
    for mode in args.modes.split(","):
        rates[mode] = run(spec, mode, args.tile, args.n, args.steps)
    if "full" in rates:
        full_t = 1.0 / rates["full"]
        print("\ncost decomposition (per-sample time, share of full):")
        for mode, r in rates.items():
            if mode == "full":
                continue
            saved = full_t - 1.0 / r
            print(f"  full - {mode:10s}: {saved / full_t * 100:6.1f}% of the sample")
    util_rates = dict(rates)
    if args.vol_sustained:
        util_rates["production_vol_sustained"] = args.vol_sustained
    util = utilization_block(spec, util_rates)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {
                    "backend": jax.default_backend(),
                    "n": args.n,
                    "steps": args.steps,
                    "tile": args.tile,
                    "samples_per_s": {k: round(v, 1) for k, v in rates.items()},
                    "utilization": util,
                },
                f,
                indent=1,
            )
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
