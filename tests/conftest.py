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

# Fast lane: `pytest -m "not slow"` runs in ~5 min (the full suite takes
# ~20 min on the 8-virtual-device CPU mesh and is the merge gate, not the
# iteration loop). Tests costing >=8 s are marked slow here centrally;
# entries are either full node names (with param brackets) or bare test
# function names (marks every parametrization).
SLOW_TESTS = {
    # hybrid step renderer statistical comparisons (big renders)
    "test_hybrid_book2_class_statistical",
    "test_hybrid_matches_wavefront_earth",
    "test_hybrid_matches_wavefront_triangles",
    "test_workqueue_fused_shade_matches_xla",
    "test_hybrid_ext_spheres_statistical",
    # fused bounce kernel vs wavefront (interpret mode is slow on CPU)
    "test_fused_matches_wavefront_perlin",
    "test_fused_light_mixture_scene",
    "test_fused_matches_wavefront_cornell",
    "test_fused_matches_wavefront_cornell_smoke",
    "test_fused_matches_wavefront_two_spheres",
    "test_fused_distributed_matches_xla_distributed",
    "test_fused_moving_sphere_lens_camera",
    # fused AD kernel pair
    "test_fused_ad_grads_match_packed",
    "test_fused_ad_forward_matches_packed",
    # train-step equivalences + gradient checks (full suite still gates)
    "test_packed_train_step_spp_step_matches_sp_axis",
    "test_packed_train_step_matches_unpacked",
    "test_train_step_loss_decreases_and_grads_flow",
    "test_packed_train_step_pixel_count_not_pack_aligned",
    "test_sharded_wavefront_matches_unsharded",
    "test_gradients_match_finite_differences",
    "test_all_param_gradients_finite",
    "test_sharded_workqueue_matches_single",
    "test_wavefront_matches_progressive_single_device",
    "test_fast_perlin_statistics_match_exact",
    "test_scene_hit_with_gate_and_cull_accel_matches_plain",
    "test_tri_custom_vjp_matches_xla_autodiff",
    "test_packed_scan_matches_unpacked",
    "test_all_simple_scenes_render_finite",
    "test_packed_scan_truncation_is_observable_not_silent",
    "test_scan_and_while_loops_agree",
    # per-scene goldens/parity: keep the cheap scenes in the fast lane
    # (cornell_box, cornell_smoke, two_spheres, random_spheres stay fast)
    "test_scene_matches_golden[book2_final]",
    "test_scene_matches_golden[earth]",
    "test_scene_matches_golden[triangles]",
    "test_scene_matches_golden[perlin_spheres]",
    "test_scene_matches_golden[random_spheres_2]",
    "test_channel_means_match_reference[book2_final]",
    "test_channel_means_match_reference[earth]",
    "test_channel_means_match_reference[triangles]",
    "test_channel_means_match_reference[perlin_spheres]",
    "test_channel_means_match_reference[random_spheres_2]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        name = item.nodeid.rsplit("::", 1)[-1]
        base = name.split("[", 1)[0]
        if name in SLOW_TESTS or base in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


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
