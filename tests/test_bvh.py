"""BVH traversal vs brute-force sweep (the reference keeps the linear
object_list around as its own comparison oracle, scene.cpp:115-116)."""

import jax.numpy as jnp
import numpy as np
import pytest

from miniraytracer_tpu.ops import bvh as bvh_mod, intersect as ix
from miniraytracer_tpu.ops.vecmath import V3, vnormalize
from miniraytracer_tpu.models.scenes import triangles, cornell_box


@pytest.fixture(scope="module")
def tri_scene():
    return triangles(1.0)


def _rays_towards_scene(rng, n):
    ro = V3(
        jnp.asarray(rng.uniform(50, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(50, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-700, -50, n).astype(np.float32)),
    )
    rd = vnormalize(V3(
        jnp.asarray(rng.standard_normal(n).astype(np.float32)),
        jnp.asarray(rng.standard_normal(n).astype(np.float32)),
        jnp.abs(jnp.asarray(rng.standard_normal(n).astype(np.float32))) + 0.1,
    ))
    return ro, rd


def test_bvh_matches_brute_force_on_meshes(tri_scene):
    scene = tri_scene
    bvh = bvh_mod.build_tri_bvh(scene)
    rng = np.random.default_rng(7)
    n = 512
    ro, rd = _rays_towards_scene(rng, n)
    inside = jnp.asarray((rng.uniform(size=n) < 0.25).astype(np.int32))
    rays = ix.Rays(ro=ro, rd=rd, time=jnp.zeros(n), inside=inside)
    tmax0 = jnp.full((n,), ix.INF)

    t_ref, i_ref = ix._chunked_min(
        lambda s, c: ix.tri_ts(scene, rays, s, c, ix.TMIN, tmax0), scene.n_tris, n
    )
    t_bvh, i_bvh = bvh_mod.bvh_tri_hit(bvh, scene, rays)

    t_ref, t_bvh = np.asarray(t_ref), np.asarray(t_bvh)
    hit_ref, hit_bvh = t_ref < 1e38, t_bvh < 1e38
    np.testing.assert_array_equal(hit_ref, hit_bvh)
    both = hit_ref & hit_bvh
    np.testing.assert_allclose(t_bvh[both], t_ref[both], rtol=1e-5, atol=1e-3)
    # exact nearest-hit (we FIX the reference's early-return quirk 9.1)
    assert (np.asarray(i_ref)[both] == np.asarray(i_bvh)[both]).all()


def test_bvh_exact_on_boxes():
    # cornell's box is a BOX prim now; rebuild it as baked triangles so the
    # triangle BVH has a mesh to index (this test is about the BVH)
    from miniraytracer_tpu.models.scenes import SceneBuilder, _cornell_camera

    b = SceneBuilder()
    b.name = "cornell_tris"
    _cornell_camera(b, 1.0)
    white = b.lambertian(b.tex_const([0.73, 0.73, 0.73]))
    b.box_tris([0, 0, 0], [165, 330, 165], white, rot_y_deg=15.0,
               offset=[265, 0, 295])
    scene = b.build()
    bvh = bvh_mod.build_tri_bvh(scene, leaf_size=2)
    rng = np.random.default_rng(8)
    n = 256
    ro = V3(
        jnp.asarray(rng.uniform(0, 555, n).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 555, n).astype(np.float32)),
        jnp.full((n,), -400.0),
    )
    rd = vnormalize(V3(
        jnp.asarray(rng.standard_normal(n).astype(np.float32)),
        jnp.asarray(rng.standard_normal(n).astype(np.float32)),
        jnp.ones((n,), jnp.float32),
    ))
    rays = ix.Rays(ro=ro, rd=rd, time=jnp.zeros(n), inside=jnp.zeros(n, jnp.int32))
    tmax0 = jnp.full((n,), ix.INF)
    t_ref, _ = ix._chunked_min(
        lambda s, c: ix.tri_ts(scene, rays, s, c, ix.TMIN, tmax0), scene.n_tris, n
    )
    t_bvh, _ = bvh_mod.bvh_tri_hit(bvh, scene, rays)
    np.testing.assert_allclose(np.asarray(t_bvh), np.asarray(t_ref), rtol=1e-5, atol=1e-3)


def test_bvh_none_for_empty_tris():
    b = cornell_box(1.0)
    import dataclasses

    empty = dataclasses.replace(b, tri_active=jnp.zeros_like(b.tri_active))
    assert bvh_mod.build_tri_bvh(empty) is None
