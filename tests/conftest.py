"""Test configuration: run everything on an 8-device virtual CPU mesh in f64.

The physics oracle tests need float64 (the reference is an f64 Rust binary);
CPU gives exact f64 plus a virtual multi-device mesh for sharding tests. The
real-TPU path is exercised by bench.py / __graft_entry__.py instead.

NOTE: this image's sitecustomize.py registers the axon TPU PJRT plugin and
imports jax at interpreter startup — before conftest runs — so setting
JAX_PLATFORMS in os.environ here is too late. jax.config.update("jax_platforms")
still works post-import because backends initialize lazily on first use;
XLA_FLAGS is likewise only read at backend initialization.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
