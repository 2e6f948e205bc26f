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
# NO persistent compile cache for the suite: XLA:CPU AOT export segfaults
# serializing some of the very large executables this suite compiles
# (reproducible "Fatal Python error" inside compilation_cache.
# put_executable_and_time at the hybrid step-kernel and book2 parity
# renders — jax has no max-entry-size gate to exclude just those). The
# in-process jit cache still dedups within a run.
jax.config.update("jax_enable_compilation_cache", False)


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_caches_between_modules():
    """XLA:CPU reproducibly SEGFAULTS in backend_compile_and_load once the
    process has accumulated ~130 tests' worth of compiled executables
    (tens of GB of live programs); individual tests pass in isolation.
    Dropping compiled programs between modules keeps the process inside
    the envelope; within-module compilation sharing is preserved."""
    yield
    jax.clear_caches()
    gc.collect()
