"""gr_raytracer_tpu — a TPU-native differentiable general-relativity raytracer.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference Rust renderer (mdreem/gr_raytracer): null geodesics integrated
backwards from a pinhole camera through Euclidean / Schwarzschild / Kerr
(Kerr-Schild) / Kerr (Boyer-Lindquist, Carter-separated) spacetimes, with
sphere / thin-disc / Perlin volumetric-disc intersection, Killing-vector
redshift, relativistic beaming, black-body CIE-XYZ emission, adaptive
supersampling, and device-mesh sharding of the pixel grid.

Architecture (TPU-first, not a port):
  * the per-ray trajectory is never materialized — intersection testing and
    emission accumulation are fused into the integration loop carry
    (the reference records a Vec<Step> and walks it post-hoc,
    reference: src/rendering/integrator.rs:86-117, src/rendering/scene.rs:141-152);
  * rays are a vectorized batch dimension through one lax.while_loop with
    per-ray adaptive step size and done-masks;
  * metric derivatives are exact via jax.jacfwd (the reference uses central
    finite differences, reference: src/geometry/kerr.rs:162-186);
  * the pixel grid is sharded over a jax.sharding.Mesh for multi-chip scaling.
"""

__version__ = "0.1.0"
