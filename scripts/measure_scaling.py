"""Record rays/s scaling over an N-device mesh into SCALING.json.

On the single-chip CI box this runs on a virtual 8-device CPU mesh
(mechanism validation); on a real pod slice run it as-is per host and the
efficiency column becomes the BASELINE.json >=85% target measurement.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/measure_scaling.py [rows cols]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Default to the virtual 8-device CPU mesh; set GR_SCALING_REAL=1 on a real
# pod slice to measure actual ICI scaling. This image pre-imports jax via
# sitecustomize, so the platform must be set through jax.config (backends
# initialize lazily), and XLA_FLAGS before first backend use.
if os.environ.get("GR_SCALING_REAL", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
    import jax

    jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from gr_raytracer_tpu import presets
from gr_raytracer_tpu.parallel import distributed

rows = int(sys.argv[1]) if len(sys.argv) > 1 else 32
cols = int(sys.argv[2]) if len(sys.argv) > 2 else 64

params = presets.kerr_flagship_params(jnp.float32)
scene = presets.build_kerr_flagship(params, rows, cols, max_steps=500, max_radius=25.0)

n = len(jax.devices())
counts = sorted({1, 2, n // 2, n} - {0})
path = os.path.join(os.path.dirname(__file__), "..", "SCALING.json")
out = distributed.record_scaling(scene, rows, cols, counts, path)
print({k: (v if not isinstance(v, dict) else v) for k, v in out.items()})
print("wrote", os.path.abspath(path))
