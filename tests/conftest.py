"""Test configuration: run on CPU with 8 virtual devices so multi-chip
sharding tests work without TPU hardware (SURVEY.md §4 test strategy)."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Force CPU: the ambient environment pins JAX to the TPU tunnel (via a
# sitecustomize that pre-imports jax and overrides jax_platforms), but tests
# must be hermetic and exercise the 8-device virtual mesh. The env var alone
# is not enough — jax is already imported — so update the config directly.
# Set CPFLOW_TEST_PLATFORM to override.
_platform = os.environ.get("CPFLOW_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
