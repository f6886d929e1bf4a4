"""Micro-probe: VPU sublane utilization of rank-1 (T,) lane blocks vs 2-D
(8, T//8) blocks in a Pallas while-loop march kernel.

Hypothesis: Mosaic lays a rank-1 (512,) f32 vector out as (1, 512) — one
sublane of the (8, 128) VPU tile — so every elementwise op wastes 7/8 of
the unit. Reshaping each per-ray variable to (8, 64)/(8, 128) should
recover up to 8x on pure-ALU march kernels (the geodesic and volumetric
raymarch kernels are exactly that shape of workload).

Usage: python scripts/layout_probe.py [n_rays] [n_steps]
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
ROWS = 8  # carried state rows (like the RK4 kernel's 8-dim ODE state)


def _work(x, y, z):
    # Representative per-step ALU mix: mul/add chains + a sqrt + exp.
    r = jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 1e-30))
    f = jnp.exp(-r * 0.01)
    x = x + 0.001 * (y * f - x * 1e-4)
    y = y + 0.001 * (z * f - y * 1e-4)
    z = z + 0.001 * (x * f - z * 1e-4)
    return x, y, z


def kernel_1d(in_ref, out_ref, *, steps):
    d = in_ref[:, :]
    x, y, z = d[0], d[1], d[2]

    def body(i, c):
        return _work(*c)

    x, y, z = jax.lax.fori_loop(0, steps, body, (x, y, z))
    out_ref[:, :] = jnp.stack([x, y, z] + [x] * (ROWS - 3), axis=0)


def kernel_2d(in_ref, out_ref, *, steps, sub):
    # Variables live as native (sub, lane) 2-D row-slices of the block —
    # Mosaic rejects in-kernel rank changes, so the BlockSpec delivers 2-D.
    d = in_ref[:, :]
    x, y, z = d[0 * sub : 1 * sub], d[1 * sub : 2 * sub], d[2 * sub : 3 * sub]

    def body(i, c):
        return _work(*c)

    x, y, z = jax.lax.fori_loop(0, steps, body, (x, y, z))
    out_ref[:, :] = jnp.concatenate([x, y, z] + [x] * (ROWS - 3), axis=0)


def run(tile, two_d):
    if two_d:
        # Lay the batch out as (ROWS*8, N//8): each variable occupies 8
        # sublane rows natively, lanes = tile//8 per block.
        sub, lane = 8, tile // 8
        grid = (N // tile,)
        spec = pl.BlockSpec((ROWS * sub, lane), lambda i: (0, i), memory_space=pltpu.VMEM)
        kern = functools.partial(kernel_2d, steps=STEPS, sub=sub)
        shape = (ROWS * sub, N // sub)
    else:
        grid = (N // tile,)
        spec = pl.BlockSpec((ROWS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
        kern = functools.partial(kernel_1d, steps=STEPS)
        shape = (ROWS, N)
    fn = jax.jit(
        lambda a: pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        )(a)
    )
    a = jnp.ones(shape, jnp.float32) * 0.5
    jax.device_get(fn(a))  # compile + warm
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = jax.device_get(fn(a))
    dt = (time.perf_counter() - t0) / reps
    rate = N * STEPS / dt
    print(
        f"tile={tile:5d} layout={'2d(8,%d)' % (tile // 8) if two_d else '1d'}"
        f"  {dt*1e3:8.2f} ms  {rate/1e6:9.1f} M lane-steps/s",
        flush=True,
    )
    return rate


if __name__ == "__main__":
    print(f"backend={jax.default_backend()} N={N} steps={STEPS}")
    r1 = run(512, False)
    r2 = run(1024, False)
    r3 = run(1024, True)
    r4 = run(2048, True)
    print(f"2d/1d speedup at 1024: {r3 / r2:.2f}x ; best 2d vs 512-1d: {max(r3, r4) / r1:.2f}x")
