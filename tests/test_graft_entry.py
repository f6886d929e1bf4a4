"""Driver contract: entry() compiles and runs; dryrun_multichip executes a
full sharded train step (kept small — the driver runs the 8-device version)."""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

import __graft_entry__ as ge  # noqa: E402


def test_entry_forward():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (256, 4)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dryrun_two_devices():
    ge.dryrun_multichip(2)
