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

# Persistent XLA compilation cache (VERDICT r3 #7): the parity waves
# compile large XLA-CPU programs serially; without the cache EVERY pytest
# run recompiles them from scratch (90-110 min suite on this 1-core box).
# Keyed on program+flags+topology, so entries are exact-hit only.
# GWDEPTH_JAX_CACHE=0 disables (cold-timing / debugging cache suspicion).
if os.environ.get("GWDEPTH_JAX_CACHE", "1") != "0":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
