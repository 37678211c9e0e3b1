"""Test harness: force an 8-device virtual CPU platform so multi-chip
sharding paths run without TPU hardware (SURVEY.md §4 test strategy).

Note: this environment pre-imports jax at interpreter startup (sitecustomize)
with a TPU plugin registered and JAX_PLATFORMS already set, so env vars alone
are too late — switch the platform through jax.config before any backend
initializes."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
