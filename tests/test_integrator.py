import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.models import integrator, scenes
from miniraytracer_tpu.scene.builder import SceneBuilder


def _cam_builder(pos=(0, 0, 0), look=(0, 0, -1), vfov=40.0):
    b = SceneBuilder()
    b.set_camera(pos, look, [0, 1, 0], vfov, 1.0, 0.0, 1.0, 0.0, 1.0)
    return b


def test_miss_gives_sky_gradient():
    b = _cam_builder()
    b.use_sky = True
    scene = b.build()
    frame, _ = integrator.render(scene, 8, 8, spp=1, max_bounces=2)
    f = np.asarray(frame)
    # sky lerp on dir.y (main.cpp:113-116): red fades with height
    # (blue channel is constant 1.0 in the lerp); row 0 = bottom scanline
    assert f[-1, 4, 0] < f[0, 4, 0]
    assert np.isfinite(f).all()
    # analytic check for one pixel
    # center-ish ray dir ~ (0,0,-1): t = 0.5, color = 0.5*white + 0.5*(.5,.7,1)
    mid = f[4, 4]
    np.testing.assert_allclose(mid, [0.75, 0.85, 1.0], atol=0.06)


def test_black_background_when_no_sky():
    b = _cam_builder()
    b.use_sky = False
    scene = b.build()
    frame, _ = integrator.render(scene, 4, 4, spp=1, max_bounces=2)
    np.testing.assert_array_equal(np.asarray(frame), 0.0)


def test_direct_light_view_equals_emission():
    b = _cam_builder()
    light = b.diffuse_light(b.tex_const([2.0, 3.0, 4.0]), scale=1.5)
    b.xy_rect(-10, 10, -10, 10, -5, light)  # normal +z, facing camera
    b.use_sky = False
    scene = b.build()
    frame, _ = integrator.render(scene, 4, 4, spp=1, max_bounces=4)
    f = np.asarray(frame)
    np.testing.assert_allclose(f, np.broadcast_to([3.0, 4.5, 6.0], f.shape), rtol=1e-4)


def test_light_backside_is_dark():
    b = _cam_builder()
    light = b.diffuse_light(b.tex_const([5.0, 5.0, 5.0]))
    b.xy_rect(10, -10, -10, 10, -5, light)  # flipped: normal -z, away from cam
    b.use_sky = False
    scene = b.build()
    frame, _ = integrator.render(scene, 4, 4, spp=1, max_bounces=4)
    # one-sided rect: not even hit from behind -> miss -> black
    np.testing.assert_array_equal(np.asarray(frame), 0.0)


def test_mirror_reflects_light_and_drops_emission_semantics():
    # camera -> perfect mirror at z=-5 (normal +z) reflecting a light placed
    # behind the camera plane: pixel = albedo * emission (main.cpp:81-83)
    b = _cam_builder()
    albedo = [0.8, 0.6, 0.4]
    mirror = b.metal(b.tex_const(albedo), 1.0)
    b.xy_rect(-20, 20, -20, 20, -5, mirror)
    light = b.diffuse_light(b.tex_const([2.0, 2.0, 2.0]))
    b.xy_rect(20, -20, -20, 20, 5, light)  # flipped: normal -z, shines at mirror
    b.use_sky = False
    scene = b.build()
    frame, _ = integrator.render(scene, 4, 4, spp=1, max_bounces=4)
    f = np.asarray(frame)
    np.testing.assert_allclose(
        f, np.broadcast_to(np.asarray(albedo) * 2.0, f.shape), rtol=1e-3
    )


def test_depth_cap_returns_emission_only():
    # two parallel mirrors: ray bounces forever; with max_bounces small the
    # path must terminate at 0 (no emission anywhere) without NaN
    b = _cam_builder()
    mirror = b.metal(b.tex_const([0.9, 0.9, 0.9]), 1.0)
    b.xy_rect(-20, 20, -20, 20, -5, mirror)
    b.xy_rect(20, -20, -20, 20, 5, mirror)
    b.use_sky = False
    scene = b.build()
    frame, _ = integrator.render(scene, 4, 4, spp=1, max_bounces=6)
    f = np.asarray(frame)
    assert np.isfinite(f).all()
    np.testing.assert_array_equal(f, 0.0)


def test_lambertian_under_light_estimator_sanity():
    # diffuse floor lit by an overhead area light: biased (light-sampled)
    # and unbiased estimators must agree (MIS correctness) **in exact-cosine
    # mode**. In reference-compat mode they intentionally differ (the
    # reference's skewed lobe, pcg.cpp:87-98 / pcg.h:15-17).
    import dataclasses

    def build(with_light_list):
        b = _cam_builder(pos=(278, 278, -800), look=(278, 278, 100))
        white = b.lambertian(b.tex_const([0.73, 0.73, 0.73]))
        light = b.diffuse_light(b.tex_const([15.0, 15.0, 15.0]))
        l = b.xz_rect(343, 213, 227, 332, 554, light)
        b.xz_rect(0, 555, 0, 555, 0, white)  # floor
        if with_light_list:
            b.add_light(l)
        b.use_sky = False
        return dataclasses.replace(b.build(), exact_cosine=True)

    res, spp = 6, 256
    f_biased, _ = integrator.render(build(True), res, res, spp=spp, max_bounces=4)
    f_unbiased, _ = integrator.render(build(False), res, res, spp=spp, max_bounces=4)
    fb = np.asarray(f_biased)
    fu = np.asarray(f_unbiased)
    # compare scene-average brightness (pixels where floor visible: bottom half)
    mb = fb[:3].mean()
    mu = fu[:3].mean()
    assert mb > 0.01
    assert abs(mb - mu) / mb < 0.15, (mb, mu)


def test_scan_and_while_loops_agree():
    scene = scenes.cornell_box(1.0)
    f1, _ = integrator.render(scene, 6, 6, spp=4, max_bounces=4, loop="while")
    f2, _ = integrator.render(scene, 6, 6, spp=4, max_bounces=4, loop="scan")
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-5)


def test_glass_sphere_straight_through():
    # ray through the center of a glass sphere: refraction straight through,
    # ~96% transmission at eta=1.5 (schlick r0=0.04); expect the light behind
    # to dominate the pixel
    b = _cam_builder()
    b.sphere([0, 0, -5], 1.0, b.dielectric(1.5))
    light = b.diffuse_light(b.tex_const([1.0, 1.0, 1.0]))
    b.xy_rect(-20, 20, -20, 20, -10, light)
    b.use_sky = False
    scene = b.build()
    frame, _ = integrator.render(scene, 5, 5, spp=64, max_bounces=8)
    center = float(np.asarray(frame)[2, 2, 0])
    assert 0.85 < center <= 1.0001, center


def test_all_simple_scenes_render_finite():
    for sid in [scenes.SCENE_TWO_SPHERES, scenes.SCENE_PERLIN_SPHERES,
                scenes.SCENE_CORNELL_BOX, scenes.SCENE_CORNELL_SMOKE]:
        scene = scenes.select_scene(sid, 1.0)
        frame, stats = integrator.render(scene, 6, 6, spp=1, max_bounces=4)
        f = np.asarray(frame)
        assert np.isfinite(f).all(), scenes.SCENE_NAMES[sid]
        assert f.max() > 0, scenes.SCENE_NAMES[sid]


def test_packed_scan_matches_unpacked():
    """sample_radiance_packed with a generous budget completes every item and
    reproduces the unpacked scan estimator (same counter-keyed paths)."""
    import jax.numpy as jnp

    from miniraytracer_tpu.models.scenes import cornell_box

    scene = cornell_box(1.0)
    W = H = 24
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    off = jnp.asarray([0.5, 0.5], jnp.float32)
    r0, rays0 = integrator.sample_radiance(
        scene, pix, jnp.int32(0), off, width=W, height=H, max_bounces=8, loop="scan"
    )
    r1, done, rays1 = integrator.sample_radiance_packed(
        scene, pix, jnp.int32(0), off, width=W, height=H, max_bounces=8,
        pack=8, scan_steps=8 * 8 + 9,
    )
    assert bool(done.all())
    d = np.abs(np.asarray(r0.arr) - np.asarray(r1.arr))
    # identical up to rare fusion-rounding path divergence at branch
    # thresholds (same tolerance family as the workqueue renderer)
    assert np.median(d) == 0.0
    assert (d > 1e-5).mean() < 5e-3
    assert abs(float(rays0) - float(rays1)) / float(rays0) < 1e-2


def test_packed_scan_truncation_is_observable_not_silent():
    """With an under-budgeted scan, items are dropped (done=False) — never
    silently truncated into biased partial radiance."""
    import jax.numpy as jnp

    from miniraytracer_tpu.models.scenes import cornell_box

    scene = cornell_box(1.0)
    W = H = 16
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    off = jnp.asarray([0.5, 0.5], jnp.float32)
    r_full, done_full, _ = integrator.sample_radiance_packed(
        scene, pix, jnp.int32(0), off, width=W, height=H, max_bounces=8,
        pack=8, scan_steps=8 * 8 + 9,
    )
    r_tiny, done_tiny, _ = integrator.sample_radiance_packed(
        scene, pix, jnp.int32(0), off, width=W, height=H, max_bounces=8,
        pack=8, scan_steps=12,
    )
    assert not bool(done_tiny.all()) and bool(done_tiny.any())
    assert np.isfinite(np.asarray(r_tiny.arr)).all()
    # completed items carry the exact same radiance as in the full run
    m = np.asarray(done_tiny)
    np.testing.assert_allclose(
        np.asarray(r_tiny.arr)[m], np.asarray(r_full.arr)[m], atol=1e-6
    )
