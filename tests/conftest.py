"""Test config: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (the standard way to test TPU sharding on CPU)."""

import os

# force-override: the ambient env pins JAX_PLATFORMS=axon (real TPU tunnel);
# unit tests must run on local virtual CPU devices
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
# persistent compile cache: the suite re-traces many small programs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
