"""Test config: force an 8-device virtual CPU mesh so sharding tests run
without TPU hardware (the standard way to test TPU sharding on CPU).

NOTE: env vars (JAX_PLATFORMS / XLA_FLAGS) do NOT work here — the ambient
axon sitecustomize calls jax.config.update('jax_platforms', 'axon,cpu') at
interpreter start, which overrides the env. The config must be re-updated
after importing jax (and --xla_force_host_platform_device_count is gone in
jax 0.9; the option is jax_num_cpu_devices)."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")
# persistent compile cache: the suite re-traces many small programs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
