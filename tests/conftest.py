"""Test harness: force an 8-virtual-device CPU mesh before jax initializes.

This is the TPU answer to 'test multi-node without a cluster' — XLA's host
platform is split into 8 devices so every sharding/collective path compiles
and runs in CI (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone does not override an externally-registered TPU plugin
# (e.g. the axon tunnel registers itself regardless); the config update does.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the suite is dominated by XLA:CPU compiles of
# tiny-but-deep graphs; caching cuts repeat runs from ~15 min to ~3 min.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
