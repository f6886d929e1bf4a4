"""Geometry abstraction: metric, tetrads, observers, geodesic solvers.

A `Geometry` is a frozen flax.struct dataclass (a pytree) whose numeric
parameters (Schwarzschild radius r_s, spin a, ...) are traced leaves, so the
rendered image is differentiable with respect to them. The chart is static
trace-time metadata.

Everything operates on batched arrays: positions/vectors are [..., 4],
equation-of-motion states are [..., 8].

Reference layer: src/geometry/geometry.rs (traits Geometry, GeodesicSolver,
InnerProduct, Signature, SupportQuantities), src/geometry/gram_schmidt.rs,
src/geometry/tetrad.rs.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from gr_raytracer_tpu.geometry import chart as charts
from gr_raytracer_tpu.precision import einsum

# Radius, in units of r_s, inside which a photon that exhausted the step
# budget is classified as trapped (reference: geometry.rs:100-106).
TRAPPED_ORBIT_RADIUS_FACTOR = 5.0


class Geometry(struct.PyTreeNode):
    """Base geometry. Subclasses define the chart, signature and fields."""

    # ---- static metadata ---------------------------------------------------
    @property
    def chart(self) -> str:
        raise NotImplementedError

    @property
    def spin(self):
        """BL-embedding spin used for chart conversions (0 unless Kerr)."""
        return 0.0

    def signature(self):
        """(s0, s1, s2, s3) as plain Python floats."""
        raise NotImplementedError

    # ---- metric ------------------------------------------------------------
    def metric(self, x):
        """Covariant metric g_{μν}(x): [..., 4] -> [..., 4, 4]."""
        raise NotImplementedError

    def inner_product(self, x, v, w):
        """g_{μν} v^μ w^ν at x. Default contracts the full metric; diagonal
        geometries override for speed."""
        g = self.metric(x)
        return einsum("...ij,...i,...j->...", g, v, w)

    # ---- frames ------------------------------------------------------------
    def tetrad(self, x):
        """Orthonormal frame at x: [..., 4, 4]; axis -2 indexes (t, x, y, z)
        with x vertical, y horizontal, z away from the camera."""
        raise NotImplementedError

    def lorentz_transformation(self, x, velocity):
        """Boost matrix Λ^μ_ν mapping the tetrad frame to the observer with
        four-velocity `velocity` (generic metric form; reference per-geometry
        implementations e.g. kerr.rs:333-380, schwarzschild.rs:134-179)."""
        g = self.metric(x)
        t = self.tetrad(x)[..., 0, :]
        s = self.signature()[0]
        gamma = s * einsum("...ij,...i,...j->...", g, t, velocity)
        tv = t + velocity
        tv_lower = einsum("...ij,...j->...i", g, tv)
        gt = einsum("...ij,...j->...i", g, t)
        eye = jnp.eye(4, dtype=x.dtype)
        outer1 = tv[..., :, None] * tv_lower[..., None, :]
        outer2 = velocity[..., :, None] * gt[..., None, :]
        return eye - s * (outer1 / (1.0 + gamma)[..., None, None] - 2.0 * outer2)

    # ---- stops / classification --------------------------------------------
    def inside_horizon(self, x):
        raise NotImplementedError

    def closed_orbit(self, x, step_index, max_steps):
        """Trapped-photon test at budget exhaustion (bool, batched)."""
        raise NotImplementedError

    def radial_coordinate(self, x, chart):
        """The geometry's radial coordinate of a point given in `chart`."""
        raise NotImplementedError

    # ---- observers (SupportQuantities) --------------------------------------
    def stationary_velocity(self, x):
        raise NotImplementedError

    def zamo_velocity(self, x):
        raise NotImplementedError

    def orbit_coefficients_at_radius(self, r):
        """(u_t, u_φ, ok) of the equatorial circular orbit at radius r;
        ok is False where no timelike orbit exists."""
        raise NotImplementedError

    def circular_orbit_killing_coefficients(self, x, chart=None):
        """(u_t, u_φ, ok) at the point's radius. `chart` is the chart `x` is
        expressed in (defaults to the geometry's native chart) — the
        volumetric raymarcher passes Cartesian sample points directly
        (reference: volumetric_disc.rs:252-258)."""
        r = self.radial_coordinate(x, chart or self.chart)
        return self.orbit_coefficients_at_radius(r)

    def circular_orbit_velocity(self, x):
        """(u [..., 4], ok) — assembled circular-orbit four-velocity at the
        native-chart point x."""
        u_t, u_phi, ok = self.circular_orbit_killing_coefficients(x)
        e_t = jnp.zeros_like(x).at[..., 0].set(1.0)
        u = u_t[..., None] * e_t + u_phi[..., None] * self.axial_killing(x)
        return u, ok

    def axial_killing(self, x):
        """∂_φ in this chart: (0,0,0,1) spherical/BL, (0,−y,x,0) Cartesian."""
        raise NotImplementedError

    # ---- geodesics ----------------------------------------------------------
    def make_solver(self, x0, p0):
        """Per-ray-batch geodesic solver. x0, p0: [..., 4] in this chart.
        Geometries with per-ray conserved quantities (KerrBL) extract them
        here (reference: kerr_bl.rs:505-577)."""
        raise NotImplementedError

    def constants_of_motion(self, x, p):
        """dict name -> [...] of conserved scalars, for drift monitoring."""
        return {}


class Solver(struct.PyTreeNode):
    """Batched geodesic solver: the ODE right-hand side plus state packing."""

    @property
    def chart(self) -> str:
        raise NotImplementedError

    def rhs(self, y):
        """dy/dλ: [..., 8] -> [..., 8]."""
        raise NotImplementedError

    def initial_state(self, x, p):
        """Default state packing: [x, p] (contravariant momentum)."""
        return jnp.concatenate([x, p], axis=-1)

    def momentum(self, y):
        """Contravariant momentum p^μ from the state."""
        return y[..., 4:8]


# ---------------------------------------------------------------------------
# Shared frame machinery
# ---------------------------------------------------------------------------


def gram_schmidt(geometry, x, vectors):
    """Metric-aware Gram-Schmidt (reference: gram_schmidt.rs:6-34).

    `vectors` is [..., n, 4]; orthonormalizes along axis -2 in order. The
    projection divides by <u, u> (= ±1 after normalization), so it is correct
    for either signature.
    """
    n = vectors.shape[-2]
    out = []
    for i in range(n):
        w = vectors[..., i, :]
        for u in out:
            num = geometry.inner_product(x, w, u)
            den = geometry.inner_product(x, u, u)
            w = w - (num / den)[..., None] * u
        norm = jnp.sqrt(jnp.abs(geometry.inner_product(x, w, w)))
        out.append(w / norm[..., None])
    return jnp.stack(out, axis=-2)


def validate_tetrad(geometry, x, tetrad, tol=None):
    """Host-side orthonormality check (reference: tetrad.rs:60-130).

    Raises ValueError if any of the 10 inner products deviates from the
    signature by more than `tol`. Call at scene-build time only. The default
    tolerance is the reference's 1e-5 in float64; float32 rounding through
    Gram-Schmidt + boost measures ~2e-7 with HIGHEST-precision contractions
    (precision.py), so 1e-4 leaves two decades of headroom.
    """
    import numpy as np

    if tol is None:
        tol = 1e-5 if np.asarray(tetrad).dtype == np.float64 else 1e-4
    sig = geometry.signature()
    for i in range(4):
        for j in range(i, 4):
            got = np.asarray(geometry.inner_product(x, tetrad[..., i, :], tetrad[..., j, :]))
            want = sig[i] if i == j else 0.0
            if not np.all(np.abs(got - want) < tol):
                raise ValueError(
                    f"tetrad not orthonormal: <e{i}, e{j}> = {got} (want {want})"
                )
