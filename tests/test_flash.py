"""Flash-intersect kernels (interpret mode) vs the XLA sweep.

The coefficients recast Moller-Trumbore / the sphere quadratic as
ray-feature inner products (ops/flash.py docstring); these tests pin both
the algebra and the Pallas kernel (hit set, winner index, t values) against
the reference XLA path on real scene geometry.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from miniraytracer_tpu.ops import flash, intersect as ix
from miniraytracer_tpu.ops.vecmath import V3, vnormalize
from miniraytracer_tpu.models.scenes import random_spheres, triangles

if not flash.HAVE_PALLAS:  # pragma: no cover
    pytest.skip("pallas unavailable", allow_module_level=True)


def _rand_rays(rng, n, lo, hi, y=(0.1, 3.0)):
    ro = V3(
        jnp.asarray(rng.uniform(lo, hi, n).astype(np.float32)),
        jnp.asarray(rng.uniform(*y, n).astype(np.float32)),
        jnp.asarray(rng.uniform(lo, hi, n).astype(np.float32)),
    )
    rd = vnormalize(V3(*[jnp.asarray(rng.standard_normal(n).astype(np.float32)) for _ in range(3)]))
    return ro, rd


def test_flash_tri_matches_xla_sweep():
    scene = triangles(1.0)
    rng = np.random.default_rng(1)
    n = 1024
    ro = V3(
        jnp.asarray(rng.uniform(100, 450, n).astype(np.float32)),
        jnp.asarray(rng.uniform(100, 450, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-800, -100, n).astype(np.float32)),
    )
    rd = vnormalize(V3(
        jnp.asarray(rng.standard_normal(n).astype(np.float32)),
        jnp.asarray(rng.standard_normal(n).astype(np.float32)),
        jnp.abs(jnp.asarray(rng.standard_normal(n).astype(np.float32))),
    ))
    inside = jnp.asarray((rng.uniform(size=n) < 0.2).astype(np.int32))
    rays = ix.Rays(ro=ro, rd=rd, time=jnp.zeros(n), inside=inside)
    tmax0 = jnp.full((n,), ix.INF)
    t_ref, i_ref = ix._chunked_min(
        lambda s, c: ix.tri_ts(scene, rays, s, c, ix.TMIN, tmax0), scene.n_tris, n
    )
    m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
    u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
    v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
    coeffs = flash.tri_coefficients(m, u, v, scene.tri_active)
    t_fl, i_fl = flash.flash_tri_hit(coeffs, ro, rd, inside, ix.TMIN, interpret=True)

    t_ref, t_fl = np.asarray(t_ref), np.asarray(t_fl)
    hit_ref, hit_fl = t_ref < 1e38, t_fl < 1e38
    # identical hit sets up to edge-grazing f32 ties (<0.5% allowed)
    assert (hit_ref == hit_fl).mean() > 0.995
    both = hit_ref & hit_fl
    np.testing.assert_allclose(t_fl[both], t_ref[both], rtol=5e-4, atol=2e-2)
    assert (np.asarray(i_ref)[both] == np.asarray(i_fl)[both]).mean() > 0.995


def test_flash_sphere_matches_xla_sweep():
    scene = random_spheres(1.0)  # includes MOVING spheres
    rng = np.random.default_rng(2)
    n = 1024
    ro, rd = _rand_rays(rng, n, -12, 12)
    time = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    inside = jnp.asarray((rng.uniform(size=n) < 0.2).astype(np.int32))
    rays = ix.Rays(ro=ro, rd=rd, time=time, inside=inside)
    tmax0 = jnp.full((n,), ix.INF)
    t_ref, i_ref = ix._chunked_min(
        lambda s, c: ix.sphere_ts(scene, rays, s, c, ix.TMIN, tmax0),
        scene.n_spheres, n,
    )
    coeffs = flash.sphere_coefficients(scene)
    t_fl, i_fl = flash.flash_sphere_hit(
        coeffs, ro, rd, time, inside, ix.TMIN, interpret=True
    )
    t_ref, t_fl = np.asarray(t_ref), np.asarray(t_fl)
    hit_ref, hit_fl = t_ref < 1e38, t_fl < 1e38
    assert (hit_ref == hit_fl).mean() > 0.995
    both = hit_ref & hit_fl
    np.testing.assert_allclose(t_fl[both], t_ref[both], rtol=2e-3, atol=2e-2)
    assert (np.asarray(i_ref)[both] == np.asarray(i_fl)[both]).mean() > 0.995


def test_tri_custom_vjp_matches_xla_autodiff(monkeypatch):
    """Hand-derived backward (flash.py) vs reverse-mode AD through the XLA
    sweep: gradients of sum(winner t) w.r.t. tri_m must agree."""
    import dataclasses
    from functools import partial

    monkeypatch.setattr(flash, "flash_tri_hit", partial(flash.flash_tri_hit, interpret=True))
    scene = triangles(1.0)
    rng = np.random.default_rng(4)
    n = 256
    ro = V3(jnp.full((n,), 278.0), jnp.full((n,), 278.0), jnp.full((n,), -790.0))
    rd = vnormalize(V3(
        jnp.asarray(rng.uniform(-0.3, 0.3, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-0.3, 0.3, n).astype(np.float32)),
        jnp.ones((n,), jnp.float32),
    ))
    inside = jnp.zeros((n,), jnp.int32)
    rays = ix.Rays(ro=ro, rd=rd, time=jnp.zeros(n), inside=inside)
    tmax0 = jnp.full((n,), ix.INF)
    import jax

    def loss_xla(tri_m):
        sc = dataclasses.replace(scene, tri_m=tri_m)
        t, _ = ix._chunked_min(
            lambda s, c: ix.tri_ts(sc, rays, s, c, ix.TMIN, tmax0), sc.n_tris, n
        )
        return jnp.sum(jnp.where(t < 1e38, t, 0.0))

    def loss_flash(tri_m):
        sc = dataclasses.replace(scene, tri_m=tri_m)
        m = V3(sc.tri_m[:, 0], sc.tri_m[:, 1], sc.tri_m[:, 2])
        u = V3(sc.tri_u[:, 0], sc.tri_u[:, 1], sc.tri_u[:, 2])
        v = V3(sc.tri_v[:, 0], sc.tri_v[:, 1], sc.tri_v[:, 2])
        coeffs = flash.tri_coefficients(m, u, v, sc.tri_active)
        t, _ = flash.flash_tri_hit_d(coeffs, ro, rd, inside, ix.TMIN)
        return jnp.sum(jnp.where(t < 1e38, t, 0.0))

    g0 = np.asarray(jax.grad(loss_xla)(scene.tri_m))
    g1 = np.asarray(jax.grad(loss_flash)(scene.tri_m))
    np.testing.assert_allclose(g1, g0, rtol=1e-3, atol=1e-4)


def test_sphere_custom_vjp_matches_xla_autodiff(monkeypatch):
    import dataclasses
    from functools import partial

    monkeypatch.setattr(flash, "flash_sphere_hit", partial(flash.flash_sphere_hit, interpret=True))
    scene = random_spheres(1.0)
    rng = np.random.default_rng(5)
    n = 512
    ro, rd = _rand_rays(rng, n, -12, 12)
    time = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    inside = jnp.zeros((n,), jnp.int32)
    rays = ix.Rays(ro=ro, rd=rd, time=time, inside=inside)
    tmax0 = jnp.full((n,), ix.INF)
    import jax

    def loss_xla(c0, rad):
        sc = dataclasses.replace(scene, sph_c0=c0, sph_radius=rad)
        t, _ = ix._chunked_min(
            lambda s, c: ix.sphere_ts(sc, rays, s, c, ix.TMIN, tmax0), sc.n_spheres, n
        )
        return jnp.sum(jnp.where(t < 1e38, t, 0.0))

    def loss_flash(c0, rad):
        sc = dataclasses.replace(scene, sph_c0=c0, sph_radius=rad)
        coeffs = flash.sphere_coefficients(sc)
        t, _ = flash.flash_sphere_hit_d(coeffs, ro, rd, time, inside, ix.TMIN)
        return jnp.sum(jnp.where(t < 1e38, t, 0.0))

    g0 = jax.grad(loss_xla, argnums=(0, 1))(scene.sph_c0, scene.sph_radius)
    g1 = jax.grad(loss_flash, argnums=(0, 1))(scene.sph_c0, scene.sph_radius)
    for a, b in zip(g0, g1):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(b).all()
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=np.abs(a).max() * 1e-4)


def test_tri_culled_vjp_matches_dense_vjp(monkeypatch):
    """Culled differentiable forward under the shared VJP == dense _d path
    (identical values AND gradients; the backward only needs winner rows)."""
    import dataclasses
    from functools import partial

    import jax

    monkeypatch.setattr(flash, "flash_tri_hit",
                        partial(flash.flash_tri_hit, interpret=True))
    monkeypatch.setattr(flash, "flash_tri_hit_resident",
                        partial(flash.flash_tri_hit_resident, interpret=True))
    monkeypatch.setattr(flash, "flash_tri_hit_streamed",
                        partial(flash.flash_tri_hit_streamed, interpret=True))
    scene = triangles(1.0)
    rng = np.random.default_rng(29)
    n = 256
    ro = V3(jnp.full((n,), 278.0), jnp.full((n,), 278.0), jnp.full((n,), -790.0))
    rd = vnormalize(V3(
        jnp.asarray(rng.uniform(-0.3, 0.3, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-0.3, 0.3, n).astype(np.float32)),
        jnp.ones((n,), jnp.float32),
    ))
    inside = jnp.zeros((n,), jnp.int32)

    def loss(tri_m, culled):
        sc = dataclasses.replace(scene, tri_m=tri_m)
        m = V3(sc.tri_m[:, 0], sc.tri_m[:, 1], sc.tri_m[:, 2])
        u = V3(sc.tri_u[:, 0], sc.tri_u[:, 1], sc.tri_u[:, 2])
        v = V3(sc.tri_v[:, 0], sc.tri_v[:, 1], sc.tri_v[:, 2])
        coeffs = flash.tri_coefficients(m, u, v, sc.tri_active)
        if culled:
            cull = flash.tri_cull_build(m, u, v, sc.tri_active, coeffs)
            t, _ = flash.flash_tri_hit_culled_d(cull, coeffs, ro, rd,
                                                inside, ix.TMIN)
        else:
            t, _ = flash.flash_tri_hit_d(coeffs, ro, rd, inside, ix.TMIN)
        return jnp.sum(jnp.where(t < 1e38, t, 0.0))

    v0, g0 = jax.value_and_grad(partial(loss, culled=False))(scene.tri_m)
    v1, g1 = jax.value_and_grad(partial(loss, culled=True))(scene.tri_m)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-6)


def test_sphere_culled_vjp_matches_dense_vjp(monkeypatch):
    import dataclasses
    from functools import partial

    import jax

    monkeypatch.setattr(flash, "flash_sphere_hit",
                        partial(flash.flash_sphere_hit, interpret=True))
    monkeypatch.setattr(
        flash, "flash_sphere_hit_gated",
        partial(flash.flash_sphere_hit_gated, interpret=True))
    monkeypatch.setattr(
        flash, "flash_sphere_hit_streamed",
        partial(flash.flash_sphere_hit_streamed, interpret=True))
    scene = random_spheres(1.0)
    rng = np.random.default_rng(31)
    n = 256
    ro, rd = _rand_rays(rng, n, -12, 12)
    time = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    inside = jnp.zeros((n,), jnp.int32)

    def loss(c0, culled):
        sc = dataclasses.replace(scene, sph_c0=c0)
        coeffs = flash.sphere_coefficients(sc)
        if culled:
            cull = flash.sph_cull_build(sc, coeffs)
            t, _ = flash.flash_sphere_hit_culled_d(cull, coeffs, ro, rd,
                                                   time, inside, ix.TMIN)
        else:
            t, _ = flash.flash_sphere_hit_d(coeffs, ro, rd, time, inside,
                                            ix.TMIN)
        return jnp.sum(jnp.where(t < 1e38, t, 0.0))

    import jax as _jax

    v0, g0 = _jax.value_and_grad(partial(loss, culled=False))(scene.sph_c0)
    v1, g1 = _jax.value_and_grad(partial(loss, culled=True))(scene.sph_c0)
    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-6)


def test_scene_hit_with_accel_dict_matches_plain():
    """scene_hit(accel=...) must agree with the plain path (interpret)."""
    scene = triangles(1.0)
    rng = np.random.default_rng(3)
    n = 256
    ro = V3(
        jnp.full((n,), 278.0), jnp.full((n,), 278.0), jnp.full((n,), -790.0)
    )
    rd = vnormalize(V3(
        jnp.asarray(rng.uniform(-0.3, 0.3, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-0.3, 0.3, n).astype(np.float32)),
        jnp.ones((n,), jnp.float32),
    ))
    rays = ix.Rays(ro=ro, rd=rd, time=jnp.zeros(n), inside=jnp.zeros(n, jnp.int32))
    rec0 = ix.scene_hit(scene, rays)
    m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
    u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
    v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
    from functools import partial
    import miniraytracer_tpu.ops.flash as fl

    accel = {"tri": fl.tri_coefficients(m, u, v, scene.tri_active)}
    orig = fl.flash_tri_hit
    fl.flash_tri_hit = partial(orig, interpret=True)
    try:
        rec1 = ix.scene_hit(scene, rays, accel=accel)
    finally:
        fl.flash_tri_hit = orig
    agree = np.asarray(rec0.hit) == np.asarray(rec1.hit)
    assert agree.mean() > 0.99
    both = np.asarray(rec0.hit) & np.asarray(rec1.hit)
    np.testing.assert_allclose(
        np.asarray(rec1.t)[both], np.asarray(rec0.t)[both], rtol=5e-4, atol=2e-2
    )


def test_flash_tri_culled_matches_uncut():
    """Cluster-culled sweep == plain flash sweep (hit set, t, winner), with
    and without ray sorting; winner indices come back in ORIGINAL
    numbering."""
    scene = triangles(1.0)
    rng = np.random.default_rng(7)
    n = 2048
    ro = V3(
        jnp.asarray(rng.uniform(50, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-50, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-600, 500, n).astype(np.float32)),
    )
    rd = vnormalize(V3(*[jnp.asarray(rng.standard_normal(n).astype(np.float32))
                         for _ in range(3)]))
    inside = jnp.asarray((rng.uniform(size=n) < 0.2).astype(np.int32))

    m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
    u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
    v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
    coeffs = flash.tri_coefficients(m, u, v, scene.tri_active)
    t_ref, i_ref = flash.flash_tri_hit(coeffs, ro, rd, inside, ix.TMIN,
                                       interpret=True)
    cull = flash.tri_cull_build(m, u, v, scene.tri_active, coeffs)
    for sort_rays in (False, True):
        t_c, i_c = flash.flash_tri_hit_culled(
            cull, ro, rd, inside, ix.TMIN, sort_rays=sort_rays, interpret=True
        )
        t_ref_np, t_c_np = np.asarray(t_ref), np.asarray(t_c)
        hit_ref, hit_c = t_ref_np < 1e38, t_c_np < 1e38
        assert (hit_ref == hit_c).mean() > 0.995, sort_rays
        both = hit_ref & hit_c
        np.testing.assert_allclose(t_c_np[both], t_ref_np[both],
                                   rtol=5e-4, atol=2e-2)
        assert (np.asarray(i_ref)[both] == np.asarray(i_c)[both]).mean() > 0.995


def test_flash_tri_resident_matches_uncut():
    """Resident-table compacted sweep == plain flash sweep, seeded and
    unseeded. Seeded lanes where no triangle beats the seed return exactly
    the seed (caller tie-rule contract)."""
    scene = triangles(1.0)
    rng = np.random.default_rng(11)
    n = 2048
    ro = V3(
        jnp.asarray(rng.uniform(50, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-50, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-600, 500, n).astype(np.float32)),
    )
    rd = vnormalize(V3(*[jnp.asarray(rng.standard_normal(n).astype(np.float32))
                         for _ in range(3)]))
    inside = jnp.asarray((rng.uniform(size=n) < 0.2).astype(np.int32))

    m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
    u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
    v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
    coeffs = flash.tri_coefficients(m, u, v, scene.tri_active)
    assert flash.resident_ok(
        flash.tri_cull_build(m, u, v, scene.tri_active, coeffs)
    )
    t_ref, i_ref = flash.flash_tri_hit(coeffs, ro, rd, inside, ix.TMIN,
                                       interpret=True)
    cull = flash.tri_cull_build(m, u, v, scene.tri_active, coeffs)
    t_r, i_r = flash.flash_tri_hit_resident(
        cull, ro, rd, inside, ix.TMIN, interpret=True
    )
    t_ref_np, t_r_np = np.asarray(t_ref), np.asarray(t_r)
    hit_ref, hit_r = t_ref_np < 1e38, t_r_np < 1e38
    assert (hit_ref == hit_r).all()
    both = hit_ref & hit_r
    np.testing.assert_array_equal(t_r_np[both], t_ref_np[both])
    np.testing.assert_array_equal(np.asarray(i_r)[both],
                                  np.asarray(i_ref)[both])

    # seeded: the seed prunes; triangle wins must still be exact
    seed = jnp.where(
        jnp.asarray(rng.uniform(size=n) < 0.5), jnp.float32(400.0),
        jnp.float32(flash.INF),
    )
    t_s, _ = flash.flash_tri_hit_resident(
        cull, ro, rd, inside, ix.TMIN, seed, interpret=True
    )
    t_s_np = np.asarray(t_s)
    better = t_ref_np < np.asarray(seed)
    np.testing.assert_array_equal(t_s_np[better], t_ref_np[better])
    np.testing.assert_array_equal(t_s_np[~better], np.asarray(seed)[~better])


def test_flash_tri_streamed_matches_uncut():
    """HBM-streamed double-buffered sweep == plain flash sweep (exact),
    seeded and unseeded, including the in-kernel DMA drain on early break."""
    scene = triangles(1.0)
    rng = np.random.default_rng(13)
    n = 1024
    ro = V3(
        jnp.asarray(rng.uniform(50, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-50, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-600, 500, n).astype(np.float32)),
    )
    rd = vnormalize(V3(*[jnp.asarray(rng.standard_normal(n).astype(np.float32))
                         for _ in range(3)]))
    inside = jnp.asarray((rng.uniform(size=n) < 0.2).astype(np.int32))

    m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
    u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
    v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
    coeffs = flash.tri_coefficients(m, u, v, scene.tri_active)
    cull = flash.tri_cull_build(m, u, v, scene.tri_active, coeffs)
    t_ref, i_ref = flash.flash_tri_hit(coeffs, ro, rd, inside, ix.TMIN,
                                       interpret=True)
    t_s, i_s = flash.flash_tri_hit_streamed(
        cull, ro, rd, inside, ix.TMIN, interpret=True
    )
    t_ref_np, t_s_np = np.asarray(t_ref), np.asarray(t_s)
    hit_ref, hit_s = t_ref_np < 1e38, t_s_np < 1e38
    assert (hit_ref == hit_s).all()
    both = hit_ref & hit_s
    np.testing.assert_array_equal(t_s_np[both], t_ref_np[both])
    np.testing.assert_array_equal(np.asarray(i_s)[both],
                                  np.asarray(i_ref)[both])

    seed = jnp.where(
        jnp.asarray(rng.uniform(size=n) < 0.5), jnp.float32(400.0),
        jnp.float32(flash.INF),
    )
    t_sd, _ = flash.flash_tri_hit_streamed(
        cull, ro, rd, inside, ix.TMIN, seed, interpret=True
    )
    t_sd_np = np.asarray(t_sd)
    better = t_ref_np < np.asarray(seed)
    np.testing.assert_array_equal(t_sd_np[better], t_ref_np[better])
    np.testing.assert_array_equal(t_sd_np[~better], np.asarray(seed)[~better])


def test_flash_sphere_streamed_matches_dense():
    """Sphere compacted-cluster streamed sweep == dense sphere sweep
    (exact), on the random_spheres scene (includes moving spheres, so the
    cluster AABBs must span both motion endpoints)."""
    scene = random_spheres(1.0)
    rng = np.random.default_rng(17)
    n = 1024
    ro = V3(
        jnp.asarray(rng.uniform(-12, 12, n).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 4, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-12, 12, n).astype(np.float32)),
    )
    rd = vnormalize(V3(*[jnp.asarray(rng.standard_normal(n).astype(np.float32))
                         for _ in range(3)]))
    time = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    inside = jnp.asarray((rng.uniform(size=n) < 0.2).astype(np.int32))

    coeffs = flash.sphere_coefficients(scene)
    cull = flash.sph_cull_build(scene, coeffs)
    t_d, i_d = flash.flash_sphere_hit(coeffs, ro, rd, time, inside, ix.TMIN,
                                      interpret=True)
    t_s, i_s = flash.flash_sphere_hit_streamed(
        cull, ro, rd, time, inside, ix.TMIN, interpret=True
    )
    t_d_np, t_s_np = np.asarray(t_d), np.asarray(t_s)
    hit_d, hit_s = t_d_np < 1e38, t_s_np < 1e38
    assert hit_d.any()
    assert (hit_d == hit_s).all()
    both = hit_d & hit_s
    np.testing.assert_array_equal(t_s_np[both], t_d_np[both])
    np.testing.assert_array_equal(np.asarray(i_s)[both],
                                  np.asarray(i_d)[both])


def test_flash_sphere_gated_matches_dense():
    """Unsorted per-tile-gated sphere sweep == dense sweep (exact)."""
    scene = random_spheres(1.0)
    rng = np.random.default_rng(19)
    n = 1024
    ro = V3(
        jnp.asarray(rng.uniform(-12, 12, n).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 4, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-12, 12, n).astype(np.float32)),
    )
    rd = vnormalize(V3(*[jnp.asarray(rng.standard_normal(n).astype(np.float32))
                         for _ in range(3)]))
    time = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    inside = jnp.asarray((rng.uniform(size=n) < 0.2).astype(np.int32))

    coeffs = flash.sphere_coefficients(scene)
    cull = flash.sph_cull_build(scene, coeffs)
    t_d, i_d = flash.flash_sphere_hit(coeffs, ro, rd, time, inside, ix.TMIN,
                                      interpret=True)
    t_g, i_g = flash.flash_sphere_hit_gated(
        cull, ro, rd, time, inside, ix.TMIN, interpret=True
    )
    t_d_np, t_g_np = np.asarray(t_d), np.asarray(t_g)
    hit_d, hit_g = t_d_np < 1e38, t_g_np < 1e38
    assert hit_d.any()
    assert (hit_d == hit_g).all()
    both = hit_d & hit_g
    np.testing.assert_array_equal(t_g_np[both], t_d_np[both])
    np.testing.assert_array_equal(np.asarray(i_g)[both],
                                  np.asarray(i_d)[both])


def test_tri_cull_build_covers_all_triangles():
    """Every active triangle lands in exactly one cluster, inside its
    cluster's AABB."""
    scene = triangles(1.0)
    m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
    u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
    v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
    coeffs = flash.tri_coefficients(m, u, v, scene.tri_active)
    cds, bounds, orig_of, cl_ord, _cstack = flash.tri_cull_build(m, u, v, scene.tri_active, coeffs)
    # each octant's visit order is a permutation of the clusters
    co = np.asarray(cl_ord)
    for o in range(8):
        assert sorted(co[o].tolist()) == list(range(co.shape[1]))
    orig = np.asarray(orig_of)
    t_count = scene.n_tris
    act = np.asarray(scene.tri_active).astype(bool)
    # permutation covers all rows exactly once (pad rows excluded)
    assert sorted(orig[: t_count].tolist()) == list(range(t_count))
    b = np.asarray(bounds)
    nc = b.shape[1]
    block = np.asarray(cds[0]).shape[0] // nc  # adaptive (64 at 11k tris)
    mx, ux, vx = (np.asarray(scene.tri_m), np.asarray(scene.tri_u),
                  np.asarray(scene.tri_v))
    for c in range(nc):
        rows = orig[c * block : (c + 1) * block]
        rows = [r for k, r in enumerate(rows)
                if c * block + k < t_count and act[r]]
        if not rows:
            continue
        a = mx[rows]
        verts = np.concatenate([a, a + ux[rows], a + vx[rows]], axis=0)
        assert (verts.min(axis=0) >= b[0:3, c] - 1e-4).all()
        assert (verts.max(axis=0) <= b[3:6, c] + 1e-4).all()


def test_scene_hit_with_gate_and_cull_accel_matches_plain():
    """scene_hit with BOTH sph_gate and tri_cull (the book2-class accel
    mix: gated sphere sweep seeds the culled triangle sweep) must agree
    with the plain XLA path (interpret)."""
    from functools import partial

    from miniraytracer_tpu.models.scenes import book2_final
    import miniraytracer_tpu.ops.flash as fl

    scene = book2_final(1.0)
    rng = np.random.default_rng(37)
    n = 512
    ro = V3(
        jnp.asarray(rng.uniform(-100, 600, n).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-500, 500, n).astype(np.float32)),
    )
    rd = vnormalize(V3(*[jnp.asarray(rng.standard_normal(n).astype(np.float32))
                         for _ in range(3)]))
    rays = ix.Rays(ro=ro, rd=rd,
                   time=jnp.asarray(rng.uniform(0, 1, n).astype(np.float32)),
                   inside=jnp.zeros(n, jnp.int32))
    rec0 = ix.scene_hit(scene, rays)

    m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
    u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
    v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
    coeffs = fl.tri_coefficients(m, u, v, scene.tri_active)
    sco = fl.sphere_coefficients(scene)
    accel = {
        "tri_cull": fl.tri_cull_build(m, u, v, scene.tri_active, coeffs),
        "sph_gate": fl.sph_cull_build(scene, sco),
    }
    patches = ("flash_tri_hit_culled", "flash_tri_hit_resident",
               "flash_tri_hit_streamed", "flash_sphere_hit_gated")
    origs = {p: getattr(fl, p) for p in patches}
    for p in patches:
        setattr(fl, p, partial(origs[p], interpret=True))
    try:
        rec1 = ix.scene_hit(scene, rays, accel=accel)
    finally:
        for p in patches:
            setattr(fl, p, origs[p])
    agree = np.asarray(rec0.hit) == np.asarray(rec1.hit)
    assert agree.mean() > 0.99
    both = np.asarray(rec0.hit) & np.asarray(rec1.hit)
    np.testing.assert_allclose(
        np.asarray(rec1.t)[both], np.asarray(rec0.t)[both],
        rtol=5e-4, atol=2e-2,
    )
    assert (np.asarray(rec1.mat)[both] == np.asarray(rec0.mat)[both]).mean() > 0.995


def test_scene_hit_with_culled_accel_matches_plain():
    """scene_hit with the tri_cull accel (seeded best-t, ray sorting) must
    agree with the plain XLA path, including surface attribution on lanes
    where the seed wins (interpret)."""
    scene = triangles(1.0)
    rng = np.random.default_rng(11)
    n = 512
    ro = V3(
        jnp.asarray(rng.uniform(50, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(0, 500, n).astype(np.float32)),
        jnp.asarray(rng.uniform(-700, 500, n).astype(np.float32)),
    )
    rd = vnormalize(V3(*[jnp.asarray(rng.standard_normal(n).astype(np.float32))
                         for _ in range(3)]))
    inside = jnp.asarray((rng.uniform(size=n) < 0.2).astype(np.int32))
    rays = ix.Rays(ro=ro, rd=rd, time=jnp.zeros(n), inside=inside)
    rec0 = ix.scene_hit(scene, rays)
    m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
    u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
    v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
    from functools import partial
    import miniraytracer_tpu.ops.flash as fl

    coeffs = fl.tri_coefficients(m, u, v, scene.tri_active)
    accel = {"tri_cull": fl.tri_cull_build(m, u, v, scene.tri_active, coeffs)}
    orig = fl.flash_tri_hit_culled
    orig_res = fl.flash_tri_hit_resident
    fl.flash_tri_hit_culled = partial(orig, interpret=True)
    fl.flash_tri_hit_resident = partial(orig_res, interpret=True)
    try:
        rec1 = ix.scene_hit(scene, rays, accel=accel)
    finally:
        fl.flash_tri_hit_culled = orig
        fl.flash_tri_hit_resident = orig_res
    agree = np.asarray(rec0.hit) == np.asarray(rec1.hit)
    assert agree.mean() > 0.99
    both = np.asarray(rec0.hit) & np.asarray(rec1.hit)
    np.testing.assert_allclose(
        np.asarray(rec1.t)[both], np.asarray(rec0.t)[both], rtol=5e-4, atol=2e-2
    )
    # material ids must match (correct surface attribution incl. seed ties)
    assert (np.asarray(rec1.mat)[both] == np.asarray(rec0.mat)[both]).mean() > 0.99


def test_custom_vjp_nan_lanes_stay_out_of_gradients(monkeypatch):
    """Dead lanes (NaN-masked origins, the ext-AD convention) and miss
    lanes carry the placeholder winner index 0 — their 0-weight x
    NaN-feature products must NOT scatter NaN into primitive row 0's
    cotangent (regression: book2's on-chip ext-AD grads were non-finite)."""
    import dataclasses
    from functools import partial

    import jax

    monkeypatch.setattr(flash, "flash_sphere_hit",
                        partial(flash.flash_sphere_hit, interpret=True))
    monkeypatch.setattr(flash, "flash_tri_hit",
                        partial(flash.flash_tri_hit, interpret=True))
    sph_scene = random_spheres(1.0)
    tri_scene = triangles(1.0)
    rng = np.random.default_rng(11)
    n = 256
    ro, rd = _rand_rays(rng, n, -12, 12)
    NAN = jnp.float32(np.nan)
    # half the lanes dead: NaN origins/directions (never hit anything)
    dead = jnp.asarray(np.arange(n) >= n // 2)
    ro = V3(*(jnp.where(dead, NAN, c) for c in (ro.x, ro.y, ro.z)))
    rd = V3(*(jnp.where(dead, NAN, c) for c in (rd.x, rd.y, rd.z)))
    time = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    inside = jnp.zeros((n,), jnp.int32)

    def loss_sph(c0, rad, t_in):
        sc = dataclasses.replace(sph_scene, sph_c0=c0, sph_radius=rad)
        coeffs = flash.sphere_coefficients(sc)
        t, _ = flash.flash_sphere_hit_d(coeffs, ro, rd, t_in, inside, ix.TMIN)
        return jnp.sum(jnp.where(t < 1e38, t, 0.0))

    gc0, grad_, gtime = jax.grad(loss_sph, argnums=(0, 1, 2))(
        sph_scene.sph_c0, sph_scene.sph_radius, time)
    for g in (gc0, grad_, gtime):
        assert np.isfinite(np.asarray(g)).all()
    # live lanes still produce signal
    assert np.abs(np.asarray(gc0)).max() > 0

    def loss_tri(tri_m):
        sc = dataclasses.replace(tri_scene, tri_m=tri_m)
        m = V3(sc.tri_m[:, 0], sc.tri_m[:, 1], sc.tri_m[:, 2])
        u = V3(sc.tri_u[:, 0], sc.tri_u[:, 1], sc.tri_u[:, 2])
        v = V3(sc.tri_v[:, 0], sc.tri_v[:, 1], sc.tri_v[:, 2])
        coeffs = flash.tri_coefficients(m, u, v, sc.tri_active)
        t, _ = flash.flash_tri_hit_d(coeffs, ro, rd, inside, ix.TMIN)
        return jnp.sum(jnp.where(t < 1e38, t, 0.0))

    gtm = np.asarray(jax.grad(loss_tri)(tri_scene.tri_m))
    assert np.isfinite(gtm).all()
    assert np.abs(gtm).max() > 0


def test_box_hit_d_matches_xla_autodiff():
    """flash.box_hit_d's hand-derived VJP vs XLA autodiff of the same
    sweep (reference box.h:12-21 one-sided faces): forward bit-equal,
    gradients w.r.t. every box table AND the rays match. Includes rotated
    + offset boxes so the rotate_y chain (box_cs/box_off cotangents) is
    exercised. NaN dead lanes are checked separately: they poison the XLA
    autodiff oracle (the very failure the masked custom backward fixes)."""
    import jax

    from miniraytracer_tpu.models.scenes import SceneBuilder

    b = SceneBuilder()
    b.name = "box_vjp_scene"
    b.set_camera([0, 2, 6], [0, 0.8, 0], [0, 1, 0], 45.0, 1.0,
                 aperture=0.0, focus_dist=6.0, t0=0.0, t1=0.0)
    mat = b.lambertian(b.tex_const([0.5, 0.5, 0.5]))
    rs = np.random.RandomState(3)
    for gx in range(6):
        for gz in range(6):
            x0, z0 = -3.0 + gx, -3.0 + gz
            h = 0.3 + 0.5 * rs.rand()
            b.box([0, 0, 0], [0.8, h, 0.8], mat,
                  rot_y_deg=float(rs.uniform(-40, 40)),
                  offset=[x0, 0.0, z0])
    scene = b.build()

    rng = np.random.default_rng(7)
    n = 512
    ro, rd = _rand_rays(rng, n, -4, 4, y=(0.2, 2.5))
    args = (scene.box_lo, scene.box_hi, scene.box_cs, scene.box_off)

    def loss(fn, blo, bhi, bcs, boff, rox, roy, roz, rdx, rdy, rdz):
        t, _ = fn(blo, bhi, bcs, boff, scene.box_active,
                  V3(rox, roy, roz), V3(rdx, rdy, rdz), ix.TMIN)
        w = jnp.arange(n, dtype=jnp.float32) * 0.01 + 1.0  # non-uniform cot
        return jnp.sum(jnp.where(t < 1e38, t * w, 0.0))

    ray_args = (ro.x, ro.y, ro.z, rd.x, rd.y, rd.z)
    t_d, i_d = flash.box_hit_d(*args, scene.box_active, ro, rd, ix.TMIN)
    t_x, i_x = flash._box_sweep_raw(*args, scene.box_active, ro, rd, ix.TMIN)
    np.testing.assert_array_equal(np.asarray(t_d), np.asarray(t_x))
    np.testing.assert_array_equal(np.asarray(i_d), np.asarray(i_x))
    assert (np.asarray(t_d) < 1e38).sum() > 50  # scene actually hit

    g_d = jax.grad(lambda *a: loss(flash.box_hit_d, *a),
                   argnums=tuple(range(10)))(*args, *ray_args)
    g_x = jax.grad(lambda *a: loss(flash._box_sweep_raw, *a),
                   argnums=tuple(range(10)))(*args, *ray_args)
    names = ("box_lo", "box_hi", "box_cs", "box_off",
             "rox", "roy", "roz", "rdx", "rdy", "rdz")
    for name, a, bb in zip(names, g_d, g_x):
        a, bb = np.asarray(a), np.asarray(bb)
        assert np.isfinite(a).all(), f"{name}: non-finite custom grad"
        scale = max(np.abs(bb).max(), 1e-8)
        np.testing.assert_allclose(
            a, bb, rtol=2e-4, atol=1e-5 * scale,
            err_msg=f"box_hit_d {name} cotangent mismatch")
    assert np.abs(np.asarray(g_x[0])).max() > 0  # box_lo signal exists
    assert np.abs(np.asarray(g_x[2])).max() > 0  # rotation signal exists

    # NaN dead lanes: the custom backward masks them out of every
    # cotangent (the XLA oracle goes NaN here — measured book2 ext-AD
    # failure class); live-lane signal must survive
    NAN = jnp.float32(np.nan)
    dead = jnp.asarray(np.arange(n) >= n - n // 8)
    ro_n = V3(*(jnp.where(dead, NAN, c) for c in (ro.x, ro.y, ro.z)))
    rd_n = V3(*(jnp.where(dead, NAN, c) for c in (rd.x, rd.y, rd.z)))
    g_n = jax.grad(lambda *a: loss(flash.box_hit_d, *a),
                   argnums=tuple(range(4)))(
        *args, ro_n.x, ro_n.y, ro_n.z, rd_n.x, rd_n.y, rd_n.z)
    for name, a in zip(names, g_n):
        a = np.asarray(a)
        assert np.isfinite(a).all(), f"{name}: NaN leaked from dead lanes"
    assert np.abs(np.asarray(g_n[0])).max() > 0

