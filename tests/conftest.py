"""Test configuration: run everything on an 8-device virtual CPU mesh in f64.

The physics oracle tests need float64 (the reference is an f64 Rust binary);
CPU gives exact f64 plus a virtual multi-device mesh for sharding tests. The
real-TPU path is exercised by bench.py / __graft_entry__.py instead.
"""

import os

# Must be set before jax initializes. PALLAS_AXON_POOL_IPS forces the axon TPU
# plugin in this image; clearing it restores the plain CPU backend.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
