"""Test configuration: run on CPU with 8 virtual devices.

Tests must be fast and hardware-independent; sharding tests exercise a
virtual 8-device CPU mesh (the driver separately dry-runs the multi-chip
path via __graft_entry__.dryrun_multichip).

Two traps handled here:
* XLA_FLAGS must be set before the CPU backend initialises.
* The ambient environment may force a TPU platform at interpreter startup
  via sitecustomize (jax.config.update("jax_platforms", ...)), which wins
  over env vars — so we update jax.config directly, before any backend is
  initialised. Set GYM2048_TEST_PLATFORM to override (e.g. run on real TPU).
"""

import os

_platform = os.environ.get("GYM2048_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
