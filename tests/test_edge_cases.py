"""Shape/degenerate-input edge cases (regression guards for the padding
and masking logic)."""

import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.models import integrator as integ
from miniraytracer_tpu.ops import intersect as ix
from miniraytracer_tpu.ops.vecmath import V3
from miniraytracer_tpu.scene.builder import SceneBuilder


def _empty_scene(sky=True):
    b = SceneBuilder()
    b.set_camera([0, 0, 0], [0, 0, -1], [0, 1, 0], 40, 1.0, 0.0, 1.0, 0.0, 1.0)
    b.use_sky = sky
    return b.build()


def test_empty_scene_renders_background():
    scene = _empty_scene(sky=True)
    frame, stats = integ.render_wavefront(scene, 8, 8, 1, max_bounces=2)
    f = np.asarray(frame)
    assert np.isfinite(f).all()
    assert f.min() > 0.4  # sky lerp is bright everywhere
    assert stats["rays"] == 64  # every primary ray misses once


def test_one_by_one_image():
    scene = _empty_scene(sky=False)
    frame, _ = integ.render_wavefront(scene, 1, 1, 1, max_bounces=1)
    np.testing.assert_array_equal(np.asarray(frame), np.zeros((1, 1, 3)))


def test_zero_direction_component_rays_no_nan():
    """Rays exactly parallel to rect planes / box slabs must not NaN."""
    b = SceneBuilder()
    b.set_camera([0, 0, 0], [0, 0, -1], [0, 1, 0], 40, 1.0, 0.0, 1.0, 0.0, 1.0)
    m = b.lambertian(b.tex_const([1, 1, 1]))
    b.xz_rect(-1, 1, -1, 1, 0.0, m)
    b.box([2, -1, -1], [3, 1, 1], m)
    scene = b.build()
    n = 4
    rays = ix.Rays(
        ro=V3(jnp.zeros(n), jnp.full(n, 0.5), jnp.zeros(n)),
        rd=V3(jnp.ones(n), jnp.zeros(n), jnp.zeros(n)),  # parallel to the rect
        time=jnp.zeros(n),
        inside=jnp.zeros(n, jnp.int32),
    )
    rec = ix.scene_hit(scene, rays)
    assert bool(jnp.isfinite(rec.t[rec.hit]).all())
    assert bool(jnp.isfinite(rec.p.x).all())


def test_tangent_ray_on_sphere_no_hit_no_nan():
    b = SceneBuilder()
    b.set_camera([0, 0, 0], [0, 0, -1], [0, 1, 0], 40, 1.0, 0.0, 1.0, 0.0, 1.0)
    b.sphere([0, 1.0, -5], 1.0, b.lambertian(b.tex_const([1, 1, 1])))
    scene = b.build()
    rays = ix.Rays(
        ro=V3(jnp.zeros(1), jnp.zeros(1), jnp.zeros(1)),
        rd=V3(jnp.zeros(1), jnp.zeros(1), jnp.full(1, -1.0)),  # grazes y=0
        time=jnp.zeros(1),
        inside=jnp.zeros(1, jnp.int32),
    )
    rec = ix.scene_hit(scene, rays)
    assert bool(jnp.isfinite(rec.t).all() | (rec.t >= 1e30).all())


def test_spp_not_square_rounds_down_everywhere():
    scene = _empty_scene(sky=True)
    f1, s1 = integ.render_wavefront(scene, 4, 4, 5, max_bounces=1)  # -> 4 spp
    f2, s2 = integ.render_wavefront(scene, 4, 4, 4, max_bounces=1)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-7)
