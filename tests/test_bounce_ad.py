"""Fused custom-VJP bounce step (ops/bounce_ad.py) vs the XLA packed AD path.

The fused AD path replaces the scan BODY of integrator.sample_radiance_packed
with a Pallas kernel pair (forward step + vjp-replay backward). These tests
demand:

- estimator equality of the per-pixel (finite sum, valid count) forward
  against folding sample_radiance_packed's per-item radiance (same
  counter-keyed RNG per (pixel, sample) — reference trace() semantics,
  main.cpp:66-118, keep-lanes-busy queue work_queue.cpp:158-175);
- gradient equality of an SSE loss w.r.t. the full TrainParams set
  (parallel/train.py) against jax.grad through the XLA packed path.

Runs in interpret mode on the CPU test mesh (conftest forces cpu).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from miniraytracer_tpu.models import integrator as integ
from miniraytracer_tpu.models import scenes as S
from miniraytracer_tpu.models.scenes import SceneBuilder
from miniraytracer_tpu.ops import bounce_ad
from miniraytracer_tpu.parallel.train import apply_params, extract_params


def _sphere_light_scene():
    """Small scene exercising every TrainParams leaf: spheres (center/radius
    grads), a box (triangle base-vertex grads), metal gloss + light scale
    (mat_param), const + checker textures (tex_c0/c1)."""
    b = SceneBuilder()
    b.name = "ad_scene"
    b.set_camera([0, 2, 6], [0, 0.8, 0], [0, 1, 0], 45.0, 1.0,
                 aperture=0.0, focus_dist=6.0, t0=0.0, t1=0.0)
    ground = b.lambertian(b.tex_checker([0.2, 0.3, 0.1], [0.9, 0.9, 0.9], 10.0))
    b.sphere([0, -1000, 0], 1000, ground)
    b.sphere([-1.1, 0.6, 0], 0.6, b.lambertian(b.tex_const([0.7, 0.3, 0.3])))
    b.sphere([1.1, 0.5, 0.3], 0.5, b.metal(b.tex_const([0.8, 0.8, 0.9]), 0.6))
    b.box([-0.5, 0.0, -1.5], [0.5, 1.2, -0.7],
          b.lambertian(b.tex_const([0.4, 0.6, 0.8])))
    lm = b.diffuse_light(b.tex_const([1.0, 1.0, 1.0]), 7.0)
    ls = b.sphere([0, 4.0, 1.0], 0.8, lm)
    b.add_light(ls)
    b.use_sky = True
    return b.build()


def _fold_packed(scene, pix, spp, W, H, B, scan_steps):
    """(sum, nvalid) per pixel from the XLA packed renderer on the SAME
    (pixel, sample) item set the fused path owns per lane."""
    n = pix.shape[0]
    samp = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), n)
    pix_items = jnp.tile(pix, spp)
    offs, _ = integ.sample_offsets(64)
    off_items = offs[samp % offs.shape[0]]
    pack = spp
    pad = (-pix_items.shape[0]) % pack
    if pad:
        pix_items = jnp.concatenate(
            [pix_items, jnp.full((pad,), pix[-1], jnp.uint32)])
        samp = jnp.concatenate([samp, samp[-1:].repeat(pad)])
        off_items = jnp.concatenate(
            [off_items, jnp.broadcast_to(off_items[-1:], (pad, 2))])
    rad, done, rays = integ.sample_radiance_packed(
        scene, pix_items, samp, off_items, width=W, height=H,
        max_bounces=B, pack=pack, scan_steps=scan_steps)
    rad3 = rad.arr[:n * spp].reshape(spp, n, 3)
    done = done[:n * spp].reshape(spp, n, 1)
    val = done & jnp.isfinite(rad3).all(axis=-1, keepdims=True)
    summ = jnp.where(val, rad3, 0.0).sum(axis=0)
    nv = val.astype(jnp.float32).sum(axis=0)[:, 0]
    return summ, nv, done


def _scan_steps(spp, bounces):
    # every sample completes: worst case spp chained max-depth paths per lane
    return spp * (bounces + 1) + 2


@pytest.mark.parametrize("scene_fn", [S.cornell_box, _sphere_light_scene])
def test_fused_ad_forward_matches_packed(scene_fn):
    scene = scene_fn(1.0) if scene_fn is S.cornell_box else scene_fn()
    W = H = 12
    spp, B = 2, 6
    steps = _scan_steps(spp, B)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sum_x, nv_x, done = _fold_packed(scene, pix, spp, W, H, B, steps)
    assert bool(done.all()), "packed reference run must fully complete"
    sum_f, nv_f, rays = bounce_ad.sample_pixel_sums_fused(
        scene, pix, 0, spp, width=W, height=H, max_bounces=B,
        scan_steps=steps, interpret=True)
    np.testing.assert_array_equal(np.asarray(nv_f), np.asarray(nv_x))
    d = np.abs(np.stack([sum_f.x, sum_f.y, sum_f.z], -1) -
               np.asarray(sum_x)).max()
    assert d < 1e-5, f"max sum diff {d}"
    assert float(rays) > 0


def _loss_fused(params, scene, pix, spp, W, H, B, steps, target):
    sc = apply_params(scene, params)
    summ, nv, _ = bounce_ad.sample_pixel_sums_fused(
        sc, pix, 0, spp, width=W, height=H, max_bounces=B,
        scan_steps=steps, interpret=True)
    mean = jnp.stack([summ.x, summ.y, summ.z], -1) / jnp.maximum(nv, 1.0)[:, None]
    err = jnp.where(nv[:, None] > 0, mean - target, 0.0)
    return jnp.sum(err * err)


def _loss_packed(params, scene, pix, spp, W, H, B, steps, target):
    sc = apply_params(scene, params)
    summ, nv, _ = _fold_packed(sc, pix, spp, W, H, B, steps)
    mean = summ / jnp.maximum(nv, 1.0)[:, None]
    err = jnp.where(nv[:, None] > 0, mean - target, 0.0)
    return jnp.sum(err * err)


@pytest.mark.parametrize("scene_fn", [S.cornell_box, _sphere_light_scene])
def test_fused_ad_grads_match_packed(scene_fn):
    scene = scene_fn(1.0) if scene_fn is S.cornell_box else scene_fn()
    W = H = 10
    spp, B = 2, 6
    steps = _scan_steps(spp, B)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    params = extract_params(scene)
    target = jnp.full((W * H, 3), 0.25, jnp.float32)

    lf, gf = jax.value_and_grad(_loss_fused)(
        params, scene, pix, spp, W, H, B, steps, target)
    lx, gx = jax.value_and_grad(_loss_packed)(
        params, scene, pix, spp, W, H, B, steps, target)

    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    any_nonzero = False
    for name, a, b in zip(gf._fields, gf, gx):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), f"{name}: non-finite fused grad"
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"TrainParams.{name} cotangent mismatch")
        any_nonzero |= bool(np.abs(b).max() > 0)
    assert any_nonzero, "degenerate test: all reference grads are zero"


# ---------------------------------------------------------------------------
# Hybrid-ext mode: big primitive sets through the differentiable culled
# flash kernels (bounce_ad.can_fuse_ad_ext scenes, e.g. triangles)
# ---------------------------------------------------------------------------


def _ext_tri_scene():
    """>MAX_PRIMS triangles (forces the external-candidate path) + an
    in-SMEM rect floor, rect light, lambertian materials."""
    b = SceneBuilder()
    b.name = "ext_ad_scene"
    b.set_camera([0, 2, 6], [0, 0.8, 0], [0, 1, 0], 45.0, 1.0,
                 aperture=0.0, focus_dist=6.0, t0=0.0, t1=0.0)
    b.xz_rect(-4, 4, -4, 4, 0.0, b.lambertian(b.tex_const([0.4, 0.4, 0.4])))
    red = b.lambertian(b.tex_const([0.7, 0.3, 0.3]))
    rs = np.random.RandomState(0)
    for gx in range(9):
        for gz in range(9):
            x0, z0 = -1.5 + gx / 3.0, -1.5 + gz / 3.0
            y = 0.5 + 0.2 * rs.rand()
            a = [x0, y, z0]
            c = [x0 + 0.3, y, z0]
            d = [x0, y + 0.25, z0 + 0.3]
            e = [x0 + 0.3, y + 0.22, z0 + 0.3]
            b.triangle(a, c, d, red)
            b.triangle(c, e, d, red)
    lm = b.diffuse_light(b.tex_const([1.0, 1.0, 1.0]), 6.0)
    ls = b.xz_rect(-0.8, 0.8, -0.8, 0.8, 4.0, lm)
    b.add_light(ls)
    b.use_sky = True
    return b.build()


@pytest.fixture()
def _interpret_flash(monkeypatch):
    """CPU: compiled pallas_call is unavailable — force interpret mode in
    the flash kernels the differentiable external candidate uses."""
    from functools import partial

    from miniraytracer_tpu.ops import flash

    for name in ("flash_tri_hit", "flash_tri_hit_resident",
                 "flash_tri_hit_streamed", "flash_sphere_hit",
                 "flash_sphere_hit_gated", "flash_sphere_hit_streamed"):
        monkeypatch.setattr(flash, name,
                            partial(getattr(flash, name), interpret=True))


@pytest.mark.slow
def test_fused_ad_ext_forward_matches_packed(_interpret_flash):
    scene = _ext_tri_scene()
    assert bounce_ad.can_fuse_ad_ext(scene, for_tpu=False)
    W = H = 12
    spp, B = 2, 4
    steps = _scan_steps(spp, B)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sum_x, nv_x, done = _fold_packed(scene, pix, spp, W, H, B, steps)
    assert bool(done.all())
    sum_f, nv_f, rays = bounce_ad.sample_pixel_sums_fused(
        scene, pix, 0, spp, width=W, height=H, max_bounces=B,
        scan_steps=steps, interpret=True, use_ext=True)
    np.testing.assert_array_equal(np.asarray(nv_f), np.asarray(nv_x))
    d = np.abs(np.stack([sum_f.x, sum_f.y, sum_f.z], -1)
               - np.asarray(sum_x)).max()
    assert d < 1e-5, f"max sum diff {d}"
    assert float(rays) > 0


@pytest.mark.slow
def test_fused_ad_ext_grads_match_packed(_interpret_flash):
    scene = _ext_tri_scene()
    W = H = 10
    spp, B = 2, 4
    steps = _scan_steps(spp, B)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    params = extract_params(scene)
    target = jnp.full((W * H, 3), 0.25, jnp.float32)

    def loss_ext(params):
        sc = apply_params(scene, params)
        summ, nv, _ = bounce_ad.sample_pixel_sums_fused(
            sc, pix, 0, spp, width=W, height=H, max_bounces=B,
            scan_steps=steps, interpret=True, use_ext=True)
        mean = (jnp.stack([summ.x, summ.y, summ.z], -1)
                / jnp.maximum(nv, 1.0)[:, None])
        err = jnp.where(nv[:, None] > 0, mean - target, 0.0)
        return jnp.sum(err * err)

    lf, gf = jax.value_and_grad(loss_ext)(params)
    lx, gx = jax.value_and_grad(_loss_packed)(
        params, scene, pix, spp, W, H, B, steps, target)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    any_nonzero = False
    for name in params._fields:
        a = np.asarray(getattr(gf, name))
        b = np.asarray(getattr(gx, name))
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"TrainParams.{name} cotangent mismatch (ext mode)")
        any_nonzero |= bool(np.abs(b).max() > 0)
    assert any_nonzero
    # the whole point: triangle-geometry gradients flow through the
    # external kernels
    assert np.abs(np.asarray(gx.tri_m)).max() > 0


def _ext_img_scene():
    """_ext_tri_scene + an image-textured sphere (earth-class): exercises
    the deferred-texel path of the hybrid-ext AD step."""
    b = SceneBuilder()
    b.name = "ext_img_scene"
    b.set_camera([0, 2, 6], [0, 0.8, 0], [0, 1, 0], 45.0, 1.0,
                 aperture=0.0, focus_dist=6.0, t0=0.0, t1=0.0)
    b.xz_rect(-4, 4, -4, 4, 0.0, b.lambertian(b.tex_const([0.4, 0.4, 0.4])))
    rs = np.random.RandomState(1)
    img = (rs.rand(8, 16, 3) * 255).astype(np.uint8)
    b.sphere([0, 1.6, -0.5], 0.7, b.lambertian(b.tex_image(img)))
    red = b.lambertian(b.tex_const([0.7, 0.3, 0.3]))
    for gx in range(9):
        for gz in range(9):
            x0, z0 = -1.8 + gx / 3.0, -1.8 + gz / 3.0
            y = 0.3 + 0.1 * rs.rand()
            a = [x0, y, z0]
            c = [x0 + 0.3, y, z0]
            d = [x0, y + 0.2, z0 + 0.3]
            b.triangle(a, c, d, red)
    lm = b.diffuse_light(b.tex_const([1.0, 1.0, 1.0]), 6.0)
    ls = b.xz_rect(-0.8, 0.8, -0.8, 0.8, 4.0, lm)
    b.add_light(ls)
    b.use_sky = True
    return b.build()


@pytest.mark.slow
def test_fused_ad_ext_image_matches_packed(_interpret_flash):
    """Forward + gradient parity for the deferred-texel (image) ext path."""
    scene = _ext_img_scene()
    assert scene.has_image
    assert bounce_ad.can_fuse_ad_ext(scene, for_tpu=False)
    W = H = 10
    spp, B = 2, 4
    steps = _scan_steps(spp, B)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sum_x, nv_x, done = _fold_packed(scene, pix, spp, W, H, B, steps)
    assert bool(done.all())
    sum_f, nv_f, _ = bounce_ad.sample_pixel_sums_fused(
        scene, pix, 0, spp, width=W, height=H, max_bounces=B,
        scan_steps=steps, interpret=True, use_ext=True)
    np.testing.assert_array_equal(np.asarray(nv_f), np.asarray(nv_x))
    d = np.abs(np.stack([sum_f.x, sum_f.y, sum_f.z], -1)
               - np.asarray(sum_x)).max()
    assert d < 1e-5, f"max sum diff {d}"

    params = extract_params(scene)
    target = jnp.full((W * H, 3), 0.25, jnp.float32)

    def loss_ext(params):
        sc = apply_params(scene, params)
        summ, nv, _ = bounce_ad.sample_pixel_sums_fused(
            sc, pix, 0, spp, width=W, height=H, max_bounces=B,
            scan_steps=steps, interpret=True, use_ext=True)
        mean = (jnp.stack([summ.x, summ.y, summ.z], -1)
                / jnp.maximum(nv, 1.0)[:, None])
        err = jnp.where(nv[:, None] > 0, mean - target, 0.0)
        return jnp.sum(err * err)

    lf, gf = jax.value_and_grad(loss_ext)(params)
    lx, gx = jax.value_and_grad(_loss_packed)(
        params, scene, pix, spp, W, H, B, steps, target)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for name in params._fields:
        a = np.asarray(getattr(gf, name))
        b = np.asarray(getattr(gx, name))
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(
            a, b, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"TrainParams.{name} cotangent mismatch (ext image)")


def _ext_mat_ad_scene(n_sph=70):
    """Per-sphere materials (> MAX_MATS) on an ext sphere set, checker
    ground sphere, one moving sphere — the ext-material AD path (winner
    material evaluated differentiably in XLA, riding the candidate rows)."""
    b = SceneBuilder()
    b.name = "ext_mat_ad"
    b.set_camera([0, 3, 12], [0, 1, 0], [0, 1, 0], 40.0, 1.0,
                 aperture=0.0, focus_dist=10.0, t0=0.0, t1=1.0)
    checker = b.lambertian(b.tex_checker([0.2, 0.3, 0.1], [0.9, 0.9, 0.9],
                                         0.6))
    b.sphere([0, -1000, 0], 1000, checker)
    lightm = b.diffuse_light(b.tex_const([1, 1, 1]), 7.0)
    b.add_light(b.xz_rect(-2, 2, -2, 2, 8, lightm))
    rs = np.random.RandomState(7)
    for i in range(n_sph):
        p = rs.uniform(-6, 6, 3)
        p[1] = rs.uniform(0.2, 3)
        roll = i % 3
        if roll == 0:
            m = b.lambertian(b.tex_const(rs.uniform(0.1, 0.9, 3).tolist()))
        elif roll == 1:
            m = b.metal(b.tex_const(rs.uniform(0.5, 1.0, 3).tolist()),
                        rs.uniform(0.0, 0.5))
        else:
            m = b.dielectric(1.5)
        if i == 0:
            c = p.tolist()
            b.sphere(c, 0.3, m, center1=[c[0] + 0.3, c[1], c[2]],
                     t0=0.0, t1=1.0)
        else:
            b.sphere(p.tolist(), rs.uniform(0.1, 0.4), m)
    b.use_sky = True
    return b.build()


@pytest.mark.slow
def test_fused_ad_ext_mat_matches_packed(_interpret_flash):
    """Forward + gradient parity for the ext-MATERIAL path (per-sphere
    materials beyond the SMEM budget): tex_c0 / mat_param / sph_c0
    cotangents must flow through the XLA material evaluation and the
    culled kernels back to the full TrainParams."""
    from miniraytracer_tpu.ops import hybrid as H

    scene = _ext_mat_ad_scene()
    assert H.ext_mat_mode(scene)
    assert bounce_ad.can_fuse_ad_ext(scene, for_tpu=False)
    W = H2 = 10
    spp, B = 2, 4
    steps = _scan_steps(spp, B)
    pix = jnp.arange(W * H2, dtype=jnp.uint32)
    sum_x, nv_x, done = _fold_packed(scene, pix, spp, W, H2, B, steps)
    assert bool(done.all())
    sum_f, nv_f, _ = bounce_ad.sample_pixel_sums_fused(
        scene, pix, 0, spp, width=W, height=H2, max_bounces=B,
        scan_steps=steps, interpret=True, use_ext=True)
    np.testing.assert_array_equal(np.asarray(nv_f), np.asarray(nv_x))
    # the ext sphere set runs the flash quadratic, the packed CPU path the
    # XLA componentwise sweep — ~1e-5 rel t formulation noise accumulates
    # through the bounces (no discrete flips at this seed/config; see
    # test_hybrid_ext_spheres_statistical for the same effect)
    d = np.abs(np.stack([sum_f.x, sum_f.y, sum_f.z], -1)
               - np.asarray(sum_x)).max()
    assert d < 2e-3, f"max sum diff {d}"

    params = extract_params(scene)
    target = jnp.full((W * H2, 3), 0.25, jnp.float32)

    def loss_ext(params):
        sc = apply_params(scene, params)
        summ, nv, _ = bounce_ad.sample_pixel_sums_fused(
            sc, pix, 0, spp, width=W, height=H2, max_bounces=B,
            scan_steps=steps, interpret=True, use_ext=True,
            pack_plan=H.smem_plan(scene))
        mean = (jnp.stack([summ.x, summ.y, summ.z], -1)
                / jnp.maximum(nv, 1.0)[:, None])
        err = jnp.where(nv[:, None] > 0, mean - target, 0.0)
        return jnp.sum(err * err)

    lf, gf = jax.value_and_grad(loss_ext)(params)
    lx, gx = jax.value_and_grad(_loss_packed)(
        params, scene, pix, spp, W, H2, B, steps, target)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-3)
    for name in params._fields:
        a = np.asarray(getattr(gf, name))
        bb = np.asarray(getattr(gx, name))
        scale = max(np.abs(bb).max(), 1e-8)
        np.testing.assert_allclose(
            a, bb, rtol=1e-2, atol=2e-3 * scale,
            err_msg=f"TrainParams.{name} cotangent mismatch (ext-material)")
    # per-sphere albedo gradients flow through the XLA texture eval
    assert np.abs(np.asarray(gf.tex_c0)).max() > 0
    assert np.abs(np.asarray(gf.sph_c0)).max() > 0


def _ext_box_scene():
    """>MAX_PRIMS boxes (forces the external box sweep — the book2 ground
    class) + an in-SMEM rect floor and a rect light. Exercises
    flash.box_hit_d inside the hybrid-ext AD step."""
    b = SceneBuilder()
    b.name = "ext_box_scene"
    b.set_camera([0, 3.5, 8], [0, 0.6, 0], [0, 1, 0], 45.0, 1.0,
                 aperture=0.0, focus_dist=8.0, t0=0.0, t1=0.0)
    b.xz_rect(-6, 6, -6, 6, -0.05,
              b.lambertian(b.tex_const([0.4, 0.4, 0.4])))
    green = b.lambertian(b.tex_const([0.3, 0.6, 0.3]))
    rs = np.random.RandomState(5)
    for gx in range(9):
        for gz in range(8):
            x0, z0 = -2.2 + gx * 0.5, -2.0 + gz * 0.5
            h = 0.15 + 0.45 * rs.rand()
            b.box([0, 0, 0], [0.45, h, 0.45], green,
                  rot_y_deg=float(rs.uniform(-25, 25)),
                  offset=[x0, 0.0, z0])
    b.sphere([-1.2, 1.3, 0.5], 0.45,
             b.lambertian(b.tex_const([0.7, 0.3, 0.3])))
    lm = b.diffuse_light(b.tex_const([1.0, 1.0, 1.0]), 6.0)
    ls = b.xz_rect(-1.0, 1.0, -1.0, 1.0, 5.0, lm)
    b.add_light(ls)
    b.use_sky = True
    return b.build()


@pytest.mark.slow
def test_fused_ad_ext_box_matches_packed(_interpret_flash):
    """book2's scene class: external boxes through the hand-derived
    box_hit_d VJP. Forward estimator-equal AND TrainParams gradients
    equal to the packed scan (box geometry itself is not a TrainParams
    leaf; what must survive is the ray chain THROUGH box hits —
    reference box.h:12-21, rect.cpp:26-107)."""
    from miniraytracer_tpu.ops import hybrid as Hy

    scene = _ext_box_scene()
    assert Hy._ext_types(scene)[2], "scene must have external boxes"
    assert bounce_ad.can_fuse_ad_ext(scene, for_tpu=False)
    W = H = 10
    spp, B = 2, 4
    steps = _scan_steps(spp, B)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sum_x, nv_x, done = _fold_packed(scene, pix, spp, W, H, B, steps)
    assert bool(done.all())
    sum_f, nv_f, rays = bounce_ad.sample_pixel_sums_fused(
        scene, pix, 0, spp, width=W, height=H, max_bounces=B,
        scan_steps=steps, interpret=True, use_ext=True)
    np.testing.assert_array_equal(np.asarray(nv_f), np.asarray(nv_x))
    d = np.abs(np.stack([sum_f.x, sum_f.y, sum_f.z], -1)
               - np.asarray(sum_x)).max()
    assert d < 1e-5, f"max sum diff {d}"

    params = extract_params(scene)
    target = jnp.full((W * H, 3), 0.25, jnp.float32)

    def loss_ext(params):
        sc = apply_params(scene, params)
        summ, nv, _ = bounce_ad.sample_pixel_sums_fused(
            sc, pix, 0, spp, width=W, height=H, max_bounces=B,
            scan_steps=steps, interpret=True, use_ext=True)
        mean = (jnp.stack([summ.x, summ.y, summ.z], -1)
                / jnp.maximum(nv, 1.0)[:, None])
        err = jnp.where(nv[:, None] > 0, mean - target, 0.0)
        return jnp.sum(err * err)

    lf, gf = jax.value_and_grad(loss_ext)(params)
    lx, gx = jax.value_and_grad(_loss_packed)(
        params, scene, pix, spp, W, H, B, steps, target)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    any_nonzero = False
    for name in params._fields:
        a = np.asarray(getattr(gf, name))
        bb = np.asarray(getattr(gx, name))
        scale = max(np.abs(bb).max(), 1e-8)
        np.testing.assert_allclose(
            a, bb, rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"TrainParams.{name} cotangent mismatch (ext-box)")
        any_nonzero |= bool(np.abs(bb).max() > 0)
    assert any_nonzero
    # shading on the boxes flows back to their albedo texture
    assert np.abs(np.asarray(gx.tex_c0)).max() > 0


def _ext_mat_img_ad_scene(n_sph=70):
    """_ext_mat_ad_scene + image textures ON the ext-material set (the
    random_spheres_2 class): exercises the deferred ext texel row
    (em_img >= 0) through the kernel's is_ext img merge and the
    between-step gather, including dielectric lanes whose tex id
    defaults to the image (albedo unread -> no gather, index -1)."""
    from miniraytracer_tpu.models.scenes import _load_earthmap

    b = SceneBuilder()
    b.name = "ext_mat_img_ad"
    b.set_camera([0, 3, 12], [0, 1, 0], [0, 1, 0], 40.0, 1.0,
                 aperture=0.0, focus_dist=10.0, t0=0.0, t1=1.0)
    img = b.tex_image(_load_earthmap())
    checker = b.lambertian(b.tex_checker([0.2, 0.3, 0.1], [0.9, 0.9, 0.9],
                                         0.6))
    b.sphere([0, -1000, 0], 1000, checker)
    lightm = b.diffuse_light(b.tex_const([1, 1, 1]), 7.0)
    b.add_light(b.xz_rect(-2, 2, -2, 2, 8, lightm))
    rs = np.random.RandomState(7)
    for i in range(n_sph):
        p = rs.uniform(-6, 6, 3)
        p[1] = rs.uniform(0.2, 3)
        roll = i % 4
        if roll == 0:
            m = b.lambertian(img)  # deferred texel lanes
        elif roll == 1:
            m = b.lambertian(b.tex_const(rs.uniform(0.1, 0.9, 3).tolist()))
        elif roll == 2:
            m = b.metal(b.tex_const(rs.uniform(0.5, 1.0, 3).tolist()),
                        rs.uniform(0.0, 0.5))
        else:
            m = b.dielectric(1.5)
        b.sphere(p.tolist(), rs.uniform(0.15, 0.45), m)
    b.use_sky = True
    return b.build()


@pytest.mark.slow
def test_fused_ad_ext_mat_image_matches_packed(_interpret_flash):
    """rs2-class coverage the plain ext-mat test lacks: the deferred ext
    texel index row is actually EXERCISED (>= 0 on lambertian-image
    winners) — a sign/indexing bug in em_img, the is_ext img_id override
    or the between-step texel multiply fails here, not only on-chip."""
    from miniraytracer_tpu.ops import hybrid as H

    scene = _ext_mat_img_ad_scene()
    assert H.ext_mat_mode(scene) and scene.has_image
    plan = H.smem_plan(scene)
    assert dict(plan)["ext_defer"], "deferral must be active for this test"
    assert bounce_ad.can_fuse_ad_ext(scene, for_tpu=False)
    # the deferred index row must actually fire for this scene: probe one
    # candidate batch directly
    from miniraytracer_tpu.ops import intersect as ix
    from miniraytracer_tpu.ops.vecmath import V3, vnormalize

    n = 256
    rngp = np.random.default_rng(3)
    ro = V3(*[jnp.asarray(rngp.uniform(-6, 6, n).astype(np.float32))
              for _ in range(3)])
    rd = vnormalize(V3(*[jnp.asarray(
        rngp.standard_normal(n).astype(np.float32)) for _ in range(3)]))
    rays = ix.Rays(ro=ro, rd=rd, time=jnp.zeros((n,)),
                   inside=jnp.zeros((n,), jnp.int32))
    er = bounce_ad._external_candidate_d(
        scene, bounce_ad._ext_accel_d(scene), rays,
        jnp.ones((n,), bool), 0.001, plan)
    assert len(er) == 11
    assert int((np.asarray(er[10]) >= 0).sum()) > 0, (
        "no deferred texel fired — scene does not cover the em_img path")

    W = H2 = 10
    spp, B = 2, 4
    steps = _scan_steps(spp, B)
    pix = jnp.arange(W * H2, dtype=jnp.uint32)
    sum_x, nv_x, done = _fold_packed(scene, pix, spp, W, H2, B, steps)
    assert bool(done.all())
    sum_f, nv_f, _ = bounce_ad.sample_pixel_sums_fused(
        scene, pix, 0, spp, width=W, height=H2, max_bounces=B,
        scan_steps=steps, interpret=True, use_ext=True)
    np.testing.assert_array_equal(np.asarray(nv_f), np.asarray(nv_x))
    d = np.abs(np.stack([sum_f.x, sum_f.y, sum_f.z], -1)
               - np.asarray(sum_x)).max()
    assert d < 2e-3, f"max sum diff {d}"

    params = extract_params(scene)
    target = jnp.full((W * H2, 3), 0.25, jnp.float32)

    def loss_ext(params):
        sc = apply_params(scene, params)
        summ, nv, _ = bounce_ad.sample_pixel_sums_fused(
            sc, pix, 0, spp, width=W, height=H2, max_bounces=B,
            scan_steps=steps, interpret=True, use_ext=True,
            pack_plan=plan)
        mean = (jnp.stack([summ.x, summ.y, summ.z], -1)
                / jnp.maximum(nv, 1.0)[:, None])
        err = jnp.where(nv[:, None] > 0, mean - target, 0.0)
        return jnp.sum(err * err)

    lf, gf = jax.value_and_grad(loss_ext)(params)
    lx, gx = jax.value_and_grad(_loss_packed)(
        params, scene, pix, spp, W, H2, B, steps, target)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-3)
    for name in params._fields:
        a = np.asarray(getattr(gf, name))
        bb = np.asarray(getattr(gx, name))
        scale = max(np.abs(bb).max(), 1e-8)
        np.testing.assert_allclose(
            a, bb, rtol=1e-2, atol=2e-3 * scale,
            err_msg=f"TrainParams.{name} cotangent mismatch (ext-mat-img)")
    assert np.abs(np.asarray(gf.tex_c0)).max() > 0


@pytest.mark.slow
def test_fused_ad_sub_steps_match_single(_interpret_flash):
    """k_sub > 1 (multi-bounce per kernel call — the round-5 headline
    amortization) must be estimator-identical to k_sub=1: the sub-stepped
    kernel iterates the exact same step math with the global step index
    threaded through claim gating. Forward equality is asserted here
    (bit-exact); GRADIENT k-sub parity runs compiled on-chip in
    benchmarks/checkup.py — the interpret-mode in-kernel vjp of k chained
    bounce bodies is impractically slow/memory-hungry on CPU (measured
    >17 min / 10-29 GB at k=2-4 on tiny configs, which is also why auto
    keeps k_sub=1 under interpret)."""
    scene = _sphere_light_scene()
    W = H = 8
    spp, B = 2, 4
    steps = _scan_steps(spp, B)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    s1, nv1, r1 = bounce_ad.sample_pixel_sums_fused(
        scene, pix, 0, spp, width=W, height=H, max_bounces=B,
        scan_steps=steps, interpret=True, sub_steps=1)
    s2, nv2, r2 = bounce_ad.sample_pixel_sums_fused(
        scene, pix, 0, spp, width=W, height=H, max_bounces=B,
        scan_steps=steps, interpret=True, sub_steps=2)
    np.testing.assert_array_equal(np.asarray(nv1), np.asarray(nv2))
    np.testing.assert_array_equal(np.asarray(s1.arr), np.asarray(s2.arr))
    assert float(r1) == float(r2)
