"""Test configuration: run on a virtual 8-device CPU mesh with fp64 enabled.

Mirrors the reference's test strategy (tests/Makefile:78-98 in the
reference: `mpirun -np N --oversubscribe` on one machine) — here, N virtual
XLA host-platform devices stand in for N TPU chips so the full sharded code
paths (GSPMD partitioning, collectives) execute without hardware.

NOTE: this environment has a sitecustomize that registers a real-TPU PJRT
plugin and bakes JAX_PLATFORMS=axon into jax.config at interpreter start, so
plain env vars cannot force CPU — we must go through jax.config.update
*before* the backend is first used.
"""

import os

# Must be set before the first jax backend use (jax itself is already
# imported by sitecustomize, but backends initialize lazily).
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compile cache makes repeated test runs fast despite the many
# distinct shapes the sweeps generate (this box has a single CPU core).
jax.config.update("jax_compilation_cache_dir", "/tmp/sbt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
