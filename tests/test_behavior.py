"""Behavioral parity checklist items (SURVEY.md section 8) not covered by
other test files: stratified sampling grid, luminance clamp semantics,
NaN policy, progressive merge."""

import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.models import integrator as integ


def test_stratified_offsets_match_reference_grid():
    """main.cpp:316-332: spp rounds DOWN to a square; offsets form the
    centered regular sqrt(spp)^2 grid."""
    offs, ns = integ.sample_offsets(10)  # rounds down to 9
    assert ns == 9
    o = np.asarray(offs)
    expect = np.array(
        [[(i + 0.5) / 3, (j + 0.5) / 3] for i in range(3) for j in range(3)],
        np.float32,
    )
    np.testing.assert_allclose(o, expect, atol=1e-7)

    offs1, ns1 = integ.sample_offsets(1)
    assert ns1 == 1
    np.testing.assert_allclose(np.asarray(offs1), [[0.5, 0.5]], atol=1e-7)


def test_merge_pass_incremental_average_and_clamp():
    """draw2 merge (main.cpp:221-229): incremental average; luminance clamp
    applies to the RUNNING AVERAGE, not the sample."""
    frame = jnp.asarray([[1.0, 1.0, 1.0]])
    color = jnp.asarray([[4.0, 4.0, 4.0]])
    out = integ.merge_pass(frame, color, jnp.int32(3), 1.0, jnp.float32(1e9))
    # avg of 3 samples at 1.0 plus one at 4.0 -> 1.75
    np.testing.assert_allclose(np.asarray(out), [[1.75, 1.75, 1.75]], rtol=1e-6)

    # clamp: a sample pushing the average's luminance over max_lum rescales
    # the whole average so its luminance == max_lum
    bright = jnp.asarray([[4000.0, 4000.0, 4000.0]])
    out2 = integ.merge_pass(frame, bright, jnp.int32(0), 1.0, jnp.float32(1000.0))
    from miniraytracer_tpu.ops import vecmath as vm

    np.testing.assert_allclose(float(vm.luminance(out2[0])), 1000.0, rtol=1e-4)
    # direction preserved
    np.testing.assert_allclose(np.asarray(out2[0] / out2[0, 0]), [1, 1, 1], rtol=1e-5)


def test_nan_sample_replaced_by_previous_pixel():
    """main.cpp:214-219: a non-finite sample reuses the previous running
    average instead of poisoning the pixel."""
    from miniraytracer_tpu.models.scenes import two_spheres
    from miniraytracer_tpu.ops import intersect as ix
    import miniraytracer_tpu.models.integrator as I

    scene = two_spheres(1.0)
    frame = jnp.full((4, 3), 0.25)
    pix = jnp.arange(4, dtype=jnp.uint32)

    orig = I.trace_paths

    def poisoned(scene, rays0, keys, max_bounces, loop="while"):
        rad, rays = orig(scene, rays0, keys, max_bounces, loop)
        bad = jnp.asarray([jnp.nan, 0.0, jnp.inf, 0.0])
        return rad._replace(x=rad.x + bad), rays

    I.trace_paths = poisoned
    try:
        out, _ = I.render_pixels(
            scene, frame, pix, jnp.int32(2), jnp.asarray([0.5, 0.5]),
            jnp.float32(1e9), width=2, height=2, max_bounces=2,
        )
    finally:
        I.trace_paths = orig
    out = np.asarray(out)
    assert np.isfinite(out).all()
    # poisoned pixels 0,2 keep the previous average exactly
    np.testing.assert_allclose(out[0], 0.25, atol=1e-7)
    np.testing.assert_allclose(out[2], 0.25, atol=1e-7)
    # clean pixels merged a real sample (changed)
    assert not np.allclose(out[1], 0.25) or not np.allclose(out[3], 0.25)


def test_sky_gating_by_scene_index():
    """main.cpp:110-116 via scene.use_sky: scenes below Cornell get the sky
    lerp, Cornell and later get black."""
    from miniraytracer_tpu.models import scenes as S

    for sid in range(9):
        scene = S.select_scene(sid, 1.0) if sid in (2, 3, 5) else None
        if scene is None:
            continue
        assert scene.use_sky == (sid < 5)


def test_fast_perlin_statistics_match_exact():
    """fast_perlin swaps table gradients for hash gradients: a DIFFERENT
    noise realization with matching statistics (both draw uniform in-ball
    lattice gradients). Default (parity) mode is unaffected."""
    import dataclasses

    from miniraytracer_tpu.models import scenes as S

    scene = S.perlin_spheres(1.0)
    assert scene.fast_perlin is False
    fast = dataclasses.replace(scene, fast_perlin=True)
    f1, _ = integ.render_wavefront(scene, 48, 48, 4, max_bounces=5)
    f2, _ = integ.render_wavefront(fast, 48, 48, 4, max_bounces=5)
    a, b = np.asarray(f1), np.asarray(f2)
    assert np.isfinite(b).all()
    assert abs(a.mean() - b.mean()) / a.mean() < 0.05
    assert abs(a.std() - b.std()) / a.std() < 0.1
    # genuinely different realization
    assert np.abs(a - b).mean() > 0.01
