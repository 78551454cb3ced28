"""Test configuration: force an 8-device virtual CPU mesh.

Tests exercise multi-chip sharding without TPU pod hardware by splitting the
host CPU into 8 XLA devices (SURVEY.md §4). Must run before jax initializes.
"""

import os

# Force CPU: the session environment may export JAX_PLATFORMS=axon (TPU);
# tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Persistent compilation cache: this host has ONE CPU, so XLA compiles
# dominate suite time; caching them makes repeat runs mostly compile-free.
# Keyed on HLO hash — safe across code edits (changed programs miss).
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

jax.config.update("jax_enable_x64", False)
# Full fp32 matmuls for numerical parity tests (the runtime default keeps
# the faster bf16-multiply path for production/bench).
jax.config.update("jax_default_matmul_precision", "highest")
