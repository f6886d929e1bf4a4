"""Device-mesh sharding of the ray grid (data parallelism over pixels).

The reference's only parallelism is a rayon thread pool over pixels
(src/rendering/raytracer.rs:218); the TPU-native equivalent is a 1-D device
mesh with the flattened H×W ray batch sharded across it via shard_map. Rays
are independent, so each shard runs its own fused integrate+intersect
while_loop with a *local* termination test — no per-iteration collective.
The only collectives in the whole pipeline are:

  * psum of scene/metric parameter gradients (the training step);
  * the frame-global reductions of the tone map / adaptive-sampling
    luminance floor (raytracer.py);
  * the final-image all-gather (implicit in the output sharding).

Multi-host: call jax.distributed.initialize() first; jax.devices() then spans
the pod slice and the same mesh code shards over ICI+DCN.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
if hasattr(jax, "shard_map"):

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        """Shim over the stable jax.shard_map (v0.8+: check_rep -> check_vma)."""
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=check_rep
        )

else:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def ray_mesh(devices=None, axis_name: str = RAY_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def pad_rays(arr, n_shards: int):
    """Pad axis 0 to a multiple of n_shards (extra rays are wasted lanes,
    masked out of the image on the host). Returns (padded, n_valid)."""
    n = arr.shape[0]
    rem = (-n) % n_shards
    if rem == 0:
        return arr, n
    pad = jnp.broadcast_to(arr[:1], (rem,) + arr.shape[1:])
    return jnp.concatenate([arr, pad], axis=0), n


def _replicated_specs(tree):
    return jax.tree.map(lambda _: P(), tree)


def make_sharded_tracer(scene_template, mesh: Mesh, axis_name: str = RAY_AXIS):
    """Build a jitted sharded `trace(scene, positions, momenta) -> color` over
    `mesh`. The scene is replicated; positions/momenta/colors are sharded on
    axis 0 (must be divisible by the mesh size — use pad_rays).

    `scene_template` only fixes the pytree *structure* (object set, static
    config); the traced scene argument carries the live parameters, so the
    same compiled tracer serves parameter sweeps and gradients.
    """
    from gr_raytracer_tpu.rendering import scene as scn

    scene_specs = _replicated_specs(scene_template)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(scene_specs, P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_rep=False,
    )
    def _trace_shard(scene, x, p):
        return scn.trace_rays(scene, x, p).color

    return jax.jit(_trace_shard)


def make_sharded_render_step(scene_template, mesh: Mesh, axis_name: str = RAY_AXIS):
    """Full differentiable step: sharded forward render + scalar image loss +
    backward pass with the parameter gradient psum over the mesh.

    Returns step(scene, positions, momenta, target) -> (loss, grads) where
    grads has the scene's pytree structure (replicated across devices — the
    psum is the ICI/DCN all-reduce of SURVEY.md §2.5).
    """
    from gr_raytracer_tpu.rendering import scene as scn

    scene_specs = _replicated_specs(scene_template)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(scene_specs, P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_rep=False,
    )
    def _loss_shard(scene, x, p, target):
        color = scn.trace_rays(scene, x, p).color
        local = jnp.sum((color[..., :3] - target) ** 2)
        return jax.lax.psum(local, axis_name)

    def step(scene, x, p, target):
        loss, grads = jax.value_and_grad(_loss_shard)(scene, x, p, target)
        return loss, grads

    return jax.jit(step)


def make_sharded_train_step(
    scene_builder, params_template, mesh: Mesh, axis_name: str = RAY_AXIS
):
    """Differentiable sharded render step parameterized at the *scene-builder*
    level: the camera tetrad, temperature LUT, and objects are rebuilt inside
    the trace from `params`, so gradients flow through scene construction
    (d loss / d r_s includes the camera-frame and ISCO dependence).

    scene_builder(params) -> Scene (pure, traced).
    Returns step(params, row_f, col_f, target) -> (loss, grads) with
    row_f/col_f/target sharded on axis 0 and grads replicated (psum over the
    mesh — the gradient all-reduce of SURVEY.md §2.5).
    """
    from gr_raytracer_tpu.rendering import camera as cam
    from gr_raytracer_tpu.rendering import scene as scn

    params_specs = _replicated_specs(params_template)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(params_specs, P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(),
        check_rep=False,
    )
    def _loss_shard(params, row_f, col_f, target):
        scene = scene_builder(params)
        x, p = cam.pixel_rays(scene.camera, row_f, col_f)
        color = scn.trace_rays(scene, x, p).color
        local = jnp.sum((color[..., :3] - target) ** 2)
        return jax.lax.psum(local, axis_name)

    def step(params, row_f, col_f, target):
        return jax.value_and_grad(_loss_shard)(params, row_f, col_f, target)

    return jax.jit(step)


def shard_rays(mesh: Mesh, positions, momenta, axis_name: str = RAY_AXIS):
    """Place padded ray arrays with the mesh sharding (device_put, so the
    subsequent jit consumes them without a reshard)."""
    sharding = NamedSharding(mesh, P(axis_name))
    n = mesh.devices.size
    x, n_valid = pad_rays(positions, n)
    p, _ = pad_rays(momenta, n)
    return jax.device_put(x, sharding), jax.device_put(p, sharding), n_valid
