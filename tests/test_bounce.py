"""Fused Pallas bounce kernel (ops/bounce.py) vs the XLA wavefront.

The fused kernel re-implements the ENTIRE wavefront body — scene_hit,
shade, merge, regeneration (the reference trace() body, main.cpp:66-118,
plus draw2 merge semantics, main.cpp:214-231) — so these tests demand
estimator-identical output: same ray counts, frames equal to float
reassociation tolerance, against render_wavefront on the same scene.

Runs in interpret mode on the CPU test mesh (conftest forces cpu).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from miniraytracer_tpu.models import integrator as integ
from miniraytracer_tpu.models import scenes as S
from miniraytracer_tpu.models.scenes import SceneBuilder
from miniraytracer_tpu.ops import bounce


def _compare(scene, W=20, H=20, spp=4, bounces=8, tol=1e-5):
    f_x, st_x = integ.render_wavefront(scene, W, H, spp, max_bounces=bounces)
    f_f, st_f = bounce.render_wavefront_fused(
        scene, W, H, spp, max_bounces=bounces, interpret=True
    )
    assert st_x["rays"] == st_f["rays"], (st_x["rays"], st_f["rays"])
    d = np.abs(np.asarray(f_x) - np.asarray(f_f)).max()
    assert d < tol, f"max frame diff {d}"


def test_fused_matches_wavefront_two_spheres():
    _compare(S.two_spheres(1.0))


def test_fused_matches_wavefront_cornell():
    _compare(S.cornell_box(1.0))


def test_fused_matches_wavefront_cornell_smoke():
    _compare(S.cornell_smoke(1.0))


def test_fused_moving_sphere_lens_camera():
    """Moving sphere + thin-lens aperture + shutter interval: exercises the
    in-kernel camera regen (lens disk, time sample at packed offsets 18-20)
    and the motion-blur center lerp."""
    b = SceneBuilder()
    b.name = "moving"
    b.set_camera([0, 1, 5], [0, 0.5, 0], [0, 1, 0], 40.0, 1.0,
                 aperture=0.4, focus_dist=5.0, t0=0.0, t1=1.0)
    gray = b.lambertian(b.tex_const([0.5, 0.5, 0.5]))
    red = b.lambertian(b.tex_const([0.8, 0.2, 0.2]))
    b.sphere([0, -1000, 0], 1000, gray)
    b.sphere([-0.6, 0.5, 0], 0.5, red, center1=[0.6, 0.5, 0], t0=0.0, t1=1.0)
    b.sphere([1.2, 0.4, -0.5], 0.4, b.metal(b.tex_const([0.9, 0.9, 0.9]), 0.7))
    b.sphere([-1.2, 0.4, 0.5], 0.4, b.dielectric(1.5))
    b.use_sky = True
    _compare(b.build(), W=16, H=16, spp=4, bounces=8)


def test_fused_light_mixture_scene():
    """Sphere + rect lights via the 50/50 mixture pdf path in-kernel."""
    b = SceneBuilder()
    b.name = "lights"
    b.set_camera([278, 278, -800], [278, 278, 0], [0, 1, 0], 40.0, 1.0,
                 aperture=0.0, focus_dist=10.0, t0=0.0, t1=0.0)
    white = b.lambertian(b.tex_const([0.73, 0.73, 0.73]))
    lightm = b.diffuse_light(b.tex_const([1, 1, 1]), 15.0)
    b.yz_rect(0, 555, 0, 555, 555, b.lambertian(b.tex_const([0.12, 0.45, 0.15])))
    b.yz_rect(0, 555, 0, 555, 0, b.lambertian(b.tex_const([0.65, 0.05, 0.05])))
    b.xz_rect(0, 555, 0, 555, 0, white)
    b.xz_rect(0, 555, 0, 555, 555, white)
    b.xy_rect(0, 555, 0, 555, 555, white)
    lr = b.xz_rect(213, 343, 227, 332, 554, lightm)
    ls = b.sphere([400, 90, 190], 90, lightm)
    b.add_light(lr)
    b.add_light(ls)
    _compare(b.build(), W=16, H=16, spp=4, bounces=8)


def test_fused_matches_wavefront_perlin():
    """perlin_spheres goes through the in-kernel turbulence path on TPU
    (can_fuse is backend-gated to False on this CPU mesh, so drive the
    fused renderer directly in interpret mode) — regression for the
    ptab NameError introduced by the wave_step extraction."""
    _compare(S.perlin_spheres(1.0), W=12, H=12, spp=4, bounces=6)


def test_fused_distributed_matches_xla_distributed():
    """Sharded fused path ((dp, sp) mesh, traced sample blocks) must match
    the sharded XLA wavefront exactly (same per-(pixel,sample) keys)."""
    from miniraytracer_tpu.parallel import render as prender
    from miniraytracer_tpu.parallel.mesh import make_mesh

    scene = S.cornell_box(1.0)
    mesh = make_mesh(4, 2)
    f_x, st_x = prender.render_wavefront_distributed(
        scene, 16, 16, 9, mesh, max_bounces=6, fused=False)
    f_f, st_f = prender.render_wavefront_distributed(
        scene, 16, 16, 9, mesh, max_bounces=6, fused=True, interpret=True)
    assert st_f["renderer"] == "wavefront-fused"
    assert st_x["rays"] == st_f["rays"]
    d = np.abs(np.asarray(f_x) - np.asarray(f_f)).max()
    assert d < 1e-5, f"max frame diff {d}"


def test_can_fuse_gating():
    # big scenes / perlin / image scenes must not claim fuse eligibility
    assert not bounce.can_fuse(S.perlin_spheres(1.0))
    assert not bounce.can_fuse(S.random_spheres(1.0))
    # small const/checker scenes are eligible modulo backend (cpu here)
    sc = S.cornell_box(1.0)
    meta, tables = bounce.pack_scene(sc)
    assert meta["S"] == sc.n_spheres and meta["R"] == sc.n_rects
    # camera tail layout: lens_radius, time0, time1 at offsets 18..20
    camv = np.asarray(tables[7])
    assert camv.shape[0] == 21
    assert camv[18] == pytest.approx(float(sc.camera.lens_radius))
    assert camv[19] == pytest.approx(float(sc.camera.time0))
    assert camv[20] == pytest.approx(float(sc.camera.time1))
