"""Sharding tests on the 8-device virtual CPU mesh: sharded render equals
single-device render; the sharded train step produces finite replicated
gradients; ray padding.

The real multi-chip path is validated by __graft_entry__.dryrun_multichip
(driver) and bench.py; these tests pin correctness of the mesh code
(SURVEY.md §2.5 — data parallelism over pixels is the reference's only
strategy, rayon over the pixel buffer)."""

import jax
import jax.numpy as jnp
import numpy as np

from gr_raytracer_tpu import presets
from gr_raytracer_tpu.parallel import mesh as pmesh
from gr_raytracer_tpu.rendering import camera as cam
from gr_raytracer_tpu.rendering import scene as scn


def small_scene(rows=4, cols=8):
    params = presets.kerr_flagship_params(jnp.float64)
    scene = presets.build_kerr_flagship(params, rows, cols, max_steps=300, max_radius=25.0)
    rr, cc = jnp.meshgrid(
        jnp.arange(rows, dtype=jnp.float64), jnp.arange(cols, dtype=jnp.float64), indexing="ij"
    )
    return params, scene, rr.ravel(), cc.ravel()


def test_mesh_uses_all_devices():
    mesh = pmesh.ray_mesh()
    assert mesh.devices.size == 8


def test_sharded_render_matches_single_device():
    _, scene, rf, cf = small_scene()
    x, p = cam.pixel_rays(scene.camera, rf, cf)
    expected = np.asarray(scn.trace_rays(scene, x, p).color)

    mesh = pmesh.ray_mesh()
    tracer = pmesh.make_sharded_tracer(scene, mesh)
    xs, ps, n_valid = pmesh.shard_rays(mesh, x, p)
    got = np.asarray(jax.device_get(tracer(scene, xs, ps)))[:n_valid]
    # Fusion/reduction order differs per shard: pure f64 roundoff remains.
    np.testing.assert_allclose(got, expected, rtol=1e-10, atol=1e-10)


def test_pad_rays():
    arr = jnp.arange(10.0)[:, None]
    padded, n = pmesh.pad_rays(arr, 8)
    assert padded.shape[0] == 16 and n == 10
    padded2, n2 = pmesh.pad_rays(arr[:8], 8)
    assert padded2.shape[0] == 8 and n2 == 8


def test_sharded_train_step_gradients():
    params, scene, rf, cf = small_scene()
    mesh = pmesh.ray_mesh()
    builder = lambda p: presets.build_kerr_flagship(
        p, 4, 8, max_steps=64, max_radius=25.0, differentiable=True
    )
    step = pmesh.make_sharded_train_step(builder, params, mesh)
    sharding = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("rays"))
    target = jax.device_put(jnp.zeros((32, 3)), sharding)
    rf = jax.device_put(rf, sharding)
    cf = jax.device_put(cf, sharding)
    loss, grads = step(params, rf, cf, target)
    assert np.isfinite(float(loss))
    for key, leaf in grads.items():
        assert bool(jnp.all(jnp.isfinite(leaf))), key
    # The spin gradient must actually be nonzero for a lensed scene.
    assert float(jnp.abs(grads["radius"])) + float(jnp.abs(grads["a"])) > 0.0
