"""Hybrid step renderer (ops/hybrid.py) vs the XLA wavefront.

The hybrid path = flash cluster kernels for big primitive sets + ONE fused
Pallas step kernel for shade/merge/regeneration per bounce (the reference
trace() body, main.cpp:66-118, split at the scene_hit seam). Estimator-
identical to render_wavefront by construction; where the external flash
kernels share no numerics with the XLA sweeps (coefficient-form quadratics
vs componentwise), marginal lanes can flip discrete decisions (Fresnel,
mixture picks), so those scenes are compared statistically — the same
drift class as the documented CPU-vs-reference parity.

Runs in interpret mode on the CPU test mesh (conftest forces cpu).
"""

import numpy as np

from miniraytracer_tpu.models import integrator as integ
from miniraytracer_tpu.models import scenes as S
from miniraytracer_tpu.models.scenes import SceneBuilder
from miniraytracer_tpu.ops import hybrid


def _ext_sphere_scene(n_sph=80, n_tri=0, vol=False):
    """>64 spheres so the sphere set goes through the external flash
    kernel; materials reused so the SMEM mat/tex tables stay small."""
    b = SceneBuilder()
    b.name = "iso"
    b.set_camera([0, 3, 12], [0, 1, 0], [0, 1, 0], 40.0, 1.0,
                 aperture=0.0, focus_dist=10.0, t0=0.0, t1=0.0)
    gray = b.lambertian(b.tex_const([0.5, 0.5, 0.5]))
    red = b.lambertian(b.tex_const([0.7, 0.2, 0.2]))
    met = b.metal(b.tex_const([0.9, 0.9, 0.9]), 0.8)
    glass = b.dielectric(1.5)
    lightm = b.diffuse_light(b.tex_const([1, 1, 1]), 7.0)
    b.sphere([0, -1000, 0], 1000, gray)
    b.add_light(b.xz_rect(-2, 2, -2, 2, 8, lightm))
    rng = np.random.RandomState(0)
    mats = [gray, red, met, glass]
    for i in range(n_sph):
        p = rng.uniform(-6, 6, 3)
        p[1] = rng.uniform(0.2, 3)
        b.sphere(p.tolist(), rng.uniform(0.1, 0.4), mats[i % 4])
    for i in range(n_tri):
        p = rng.uniform(-6, 6, 3)
        p[1] = rng.uniform(0.2, 3)
        a = p + rng.uniform(-0.4, 0.4, 3)
        c = p + rng.uniform(-0.4, 0.4, 3)
        b.triangle(p.tolist(), a.tolist(), c.tolist(), mats[i % 4])
    if vol:
        b.volume_sphere([0, 1, 0], 4.0, 0.05, b.tex_const([0.6, 0.7, 0.9]))
    b.use_sky = True
    return b.build()


def _exact(scene, W, H, spp, bounces, tol=1e-5):
    f_x, st_x = integ.render_wavefront(scene, W, H, spp, max_bounces=bounces)
    f_h, st_h = hybrid.render_wavefront_hybrid(
        scene, W, H, spp, max_bounces=bounces, interpret=True)
    assert st_x["rays"] == st_h["rays"], (st_x["rays"], st_h["rays"])
    d = np.abs(np.asarray(f_x) - np.asarray(f_h)).max()
    assert d < tol, f"max frame diff {d}"


def _statistical(scene, W, H, spp, bounces, mean_tol=5e-3, ray_tol=0.02):
    f_x, st_x = integ.render_wavefront(scene, W, H, spp, max_bounces=bounces)
    f_h, st_h = hybrid.render_wavefront_hybrid(
        scene, W, H, spp, max_bounces=bounces, interpret=True)
    drift = abs(st_x["rays"] - st_h["rays"]) / max(st_x["rays"], 1.0)
    assert drift < ray_tol, (st_x["rays"], st_h["rays"])
    mx = np.asarray(f_x).mean(axis=(0, 1))
    mh = np.asarray(f_h).mean(axis=(0, 1))
    rel = np.abs(mx - mh) / np.maximum(np.abs(mx), 1e-6)
    assert rel.max() < mean_tol, f"channel means {mx} vs {mh}"


def test_hybrid_gating():
    assert hybrid.can_hybrid(S.earth(1.0), for_tpu=False)
    assert hybrid.can_hybrid(S.triangles(1.0), for_tpu=False)
    # per-sphere materials blow the SMEM mat table budget -> qualify via
    # ext-material mode (winner material evaluated in XLA, rides the
    # candidate rows)
    rs = S.random_spheres(1.0)
    assert hybrid.can_hybrid(rs, for_tpu=False)
    assert hybrid.ext_mat_mode(rs)
    meta, _tables = hybrid.pack_scene_hybrid(rs)
    assert meta["ext_mat"] and meta["M"] == 1 and not meta["image"]
    # book2's 400 box prims go through the external XLA sweep (its 11
    # materials still fit SMEM -- no ext-material mode)
    assert hybrid.can_hybrid(S.book2_final(1.0), for_tpu=False)
    assert not hybrid.ext_mat_mode(S.book2_final(1.0))
    assert hybrid._ext_types(S.book2_final(1.0)) == (True, False, True)


def test_hybrid_matches_wavefront_earth():
    """No external types here — the step kernel + deferred image-texel
    gather must match the wavefront exactly (image uv from the winner
    normal == the reference's get_sphere_uv argument, sphere.cpp:6-11)."""
    _exact(S.earth(1.0), 12, 12, 4, 8)


def test_hybrid_matches_wavefront_triangles():
    """11.3k tris through the external resident cluster kernel; this
    fixed-seed crop has no marginal lanes, so the match is exact."""
    _exact(S.triangles(1.0), 8, 8, 1, 4)


def test_hybrid_ext_spheres_statistical():
    """External flash sphere quadratic differs from the XLA componentwise
    sweep at ~1e-5 rel t; discrete decisions on marginal lanes can flip,
    so compare channel means (measured 5e-6 rel at this config)."""
    _statistical(_ext_sphere_scene(), 16, 16, 16, 8)


def test_workqueue_fused_shade_matches_xla():
    """The work-queue renderer with the shade-step kernel vs its XLA
    shading phase: same claims, same estimator. Uses >128 lanes so state
    spans MULTIPLE (8,128)-tile sublane rows — regression for the i_ref[0]
    bug that broadcast row 0's nested-dielectric counters over the whole
    block (caught on-chip as 23% shorter glass paths)."""
    import jax.numpy as jnp

    sc = _ext_sphere_scene(n_sph=80)
    W = H = 18  # 324 lanes -> 3 sublane rows
    offs, ns = integ.sample_offsets(4)
    n_pix = W * H
    a0, c0, r0 = integ.render_workqueue_pixels(
        sc, n_pix, n_pix, offs, ns, jnp.float32(1e9),
        width=W, height=H, max_bounces=8)
    a1, c1, r1 = integ.render_workqueue_pixels(
        sc, n_pix, n_pix, offs, ns, jnp.float32(1e9),
        width=W, height=H, max_bounces=8, fused_shade=True, interpret=True)
    assert abs(float(r0) - float(r1)) / float(r0) < 2e-3, (r0, r1)
    f0 = np.asarray((a0 * (1.0 / jnp.maximum(c0, 1.0))).arr)
    f1 = np.asarray((a1 * (1.0 / jnp.maximum(c1, 1.0))).arr)
    rel = np.abs(f0.mean(0) - f1.mean(0)) / np.maximum(f0.mean(0), 1e-6)
    assert rel.max() < 5e-3, rel


def test_hybrid_book2_class_statistical():
    """book2's feature mix — both external types + volumes + image + moving
    spheres — at an in-SMEM box count (book2 itself routes its 400 box
    prims through the EXTERNAL XLA sweep; the in-SMEM unroll here also
    covers the kernel's box branch)."""
    img = np.random.RandomState(3).uniform(0.05, 1.0, (32, 64, 3))
    b = SceneBuilder()
    b.name = "book2_class"
    b.set_camera([0, 3, 12], [0, 1, 0], [0, 1, 0], 40.0, 1.0,
                 aperture=0.0, focus_dist=10.0, t0=0.0, t1=1.0)
    gray = b.lambertian(b.tex_const([0.5, 0.5, 0.5]))
    green = b.lambertian(b.tex_const([0.48, 0.83, 0.53]))
    b.add_light(b.xz_rect(2, -2, -2, 2, 8,
                          b.diffuse_light(b.tex_const([1, 1, 1]), 7.0)))
    for i in range(24):
        x0 = -6 + (i % 6) * 2.0
        z0 = -6 + (i // 6) * 2.0
        b.box([x0, 0, z0], [x0 + 1.9, 0.2 + 0.1 * (i % 5), z0 + 1.9], green)
    rng_ = np.random.RandomState(0)
    for i in range(80):
        p = rng_.uniform(-5, 5, 3)
        p[1] = rng_.uniform(0.5, 3)
        b.sphere(p.tolist(), 0.25, gray)
    b.sphere([0, 1.5, 2], 1.0, b.lambertian(b.tex_image(
        img.astype(np.float32))))
    b.sphere([-2, 1.5, 1], 0.8, b.dielectric(1.5))
    b.sphere([2, 1.2, 0], 0.6, gray, center1=[2.4, 1.2, 0], t0=0.0, t1=1.0)
    b.volume_sphere([0, 1, 0], 30.0, 0.01, b.tex_const([1, 1, 1]))
    b.use_sky = False
    sc = b.build()
    assert hybrid.can_hybrid(sc, for_tpu=False)
    _statistical(sc, 10, 10, 4, 6, mean_tol=2e-2, ray_tol=0.05)


def _ext_mat_scene(n_sph=70):
    """PER-SPHERE materials (> MAX_MATS) on an external sphere set: the
    ext-material path — winner material/texture evaluated in XLA, riding
    the candidate rows. Checker ground + metals/dielectrics + an in-SMEM
    rect light whose material must survive the SMEM compaction."""
    b = SceneBuilder()
    b.name = "ext_mat"
    b.set_camera([0, 3, 12], [0, 1, 0], [0, 1, 0], 40.0, 1.0,
                 aperture=0.0, focus_dist=10.0, t0=0.0, t1=0.0)
    checker = b.lambertian(b.tex_checker([0.2, 0.3, 0.1], [0.9, 0.9, 0.9],
                                         0.6))
    b.sphere([0, -1000, 0], 1000, checker)
    lightm = b.diffuse_light(b.tex_const([1, 1, 1]), 7.0)
    b.add_light(b.xz_rect(-2, 2, -2, 2, 8, lightm))
    rng = np.random.RandomState(7)
    for i in range(n_sph):
        p = rng.uniform(-6, 6, 3)
        p[1] = rng.uniform(0.2, 3)
        roll = i % 3
        if roll == 0:
            m = b.lambertian(b.tex_const(rng.uniform(0.1, 0.9, 3).tolist()))
        elif roll == 1:
            m = b.metal(b.tex_const(rng.uniform(0.5, 1.0, 3).tolist()),
                        rng.uniform(0.0, 0.5))
        else:
            m = b.dielectric(1.5)
        b.sphere(p.tolist(), rng.uniform(0.1, 0.4), m)
    b.use_sky = True
    return b.build()


def test_hybrid_ext_mat_statistical():
    """Per-sphere materials through the ext-material rows: hybrid must
    reproduce the wavefront estimator (marginal-lane flips only, from the
    flash quadratic's ~1e-5 rel t difference)."""
    scene = _ext_mat_scene()
    assert hybrid.can_hybrid(scene, for_tpu=False)
    assert hybrid.ext_mat_mode(scene)
    _statistical(scene, 16, 16, 16, 8)


def test_hybrid_ext_mat_production_scenes_statistical():
    """The two reference scenes the mode unlocks."""
    _statistical(S.random_spheres(1.0), 16, 16, 4, 8)
    _statistical(S.random_spheres_2(1.0), 16, 16, 4, 8)
