"""Material-level branch coverage (material.h semantics) beyond the
integration tests: Schlick values, nested dielectric isInside transitions,
metal fuzz bounds, emission one-sidedness at the shade level."""

import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.models import materials as M
from miniraytracer_tpu.ops import intersect as ix
from miniraytracer_tpu.ops.vecmath import V3, vnormalize
from miniraytracer_tpu.ops import rng
from miniraytracer_tpu.scene.builder import SceneBuilder


def _scene_with(mat_fn):
    b = SceneBuilder()
    b.set_camera([0, 0, 0], [0, 0, -1], [0, 1, 0], 40, 1.0, 0.0, 1.0, 0.0, 1.0)
    m = mat_fn(b)
    b.sphere([0, 0, -5], 1.0, m)
    return b.build()


def _shade_normal_incidence(scene, inside=0, n_rays=4096):
    """Rays hitting the sphere head-on at z=-4, normal +z."""
    n = n_rays
    rec = ix.HitRecord(
        t=jnp.full((n,), 4.0),
        p=V3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, -4.0)),
        n=V3(jnp.zeros(n), jnp.zeros(n), jnp.ones(n)),
        u=jnp.zeros(n), v=jnp.zeros(n),
        mat=jnp.full((n,), int(scene.mat_type.shape[0] - 1), jnp.int32),
        hit=jnp.ones(n, bool),
    )
    rays = ix.Rays(
        ro=V3.zeros((n,)),
        rd=V3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, -1.0)),
        time=jnp.zeros(n),
        inside=jnp.full((n,), inside, jnp.int32),
    )
    keys = rng.ray_key(jnp.arange(n, dtype=jnp.uint32), jnp.zeros(n, jnp.uint32))
    return M.shade(scene, rays, rec, keys, jnp.ones(n, bool)), rays


def test_fresnel_schlick_normal_incidence():
    # r0 = ((1-n)/(1+n))^2 (material.h:106-110)
    r0 = float(M.fresnel_schlick(jnp.float32(1.0), jnp.float32(1.5)))
    np.testing.assert_allclose(r0, ((1 - 1.5) / (1 + 1.5)) ** 2, rtol=1e-6)
    # grazing: cos = 0 -> 1
    np.testing.assert_allclose(float(M.fresnel_schlick(jnp.float32(0.0), jnp.float32(1.5))), 1.0, rtol=1e-6)


def test_dielectric_inside_counter_transitions():
    """material.h:158-173: refract entering -> inside+1; refract exiting ->
    inside-1 (floored at 0); reflect keeps the counter."""
    scene = _scene_with(lambda b: b.dielectric(1.5))
    sc, rays = _shade_normal_incidence(scene, inside=0)
    ins = np.asarray(sc.new_inside)
    rdz = np.asarray(sc.new_rd.z)
    # at normal incidence reflect_prob = r0 = 0.04: ~96% refract (inside=1,
    # continuing -z), ~4% reflect (inside=0, flipped +z)
    frac_refract = (ins == 1).mean()
    assert 0.93 < frac_refract < 0.99
    refr = ins == 1
    np.testing.assert_allclose(rdz[refr], -1.0, atol=1e-5)
    np.testing.assert_allclose(rdz[~refr], 1.0, atol=1e-5)
    # all lanes scatter, specular branch drops emission
    assert bool(np.asarray(sc.scattered).all())
    assert not bool(np.asarray(sc.add_emitted).any())

    # nested entering: already inside one shell (inside=1), hitting another
    # front face -> refract increments to 2, reflect keeps 1 (the reference
    # decides enter/exit from the NORMAL, not the counter; material.h:158-173)
    sc2, _ = _shade_normal_incidence(scene, inside=1)
    ins2 = np.asarray(sc2.new_inside)
    assert set(np.unique(ins2)) <= {1, 2}
    assert (ins2 == 2).mean() > 0.9  # mostly refraction at eta=1/1.5


def test_metal_fuzz_within_gloss_cone_and_resets_inside():
    scene = _scene_with(lambda b: b.metal(b.tex_const([0.8, 0.8, 0.8]), 0.7))
    sc, _ = _shade_normal_incidence(scene, inside=0)
    # reflect of -z about +z = +z; fuzz radius (1-gloss)=0.3 around it
    rd = np.stack([np.asarray(sc.new_rd.x), np.asarray(sc.new_rd.y), np.asarray(sc.new_rd.z)], 1)
    np.testing.assert_allclose(np.linalg.norm(rd, axis=1), 1.0, atol=1e-4)
    # angle from +z bounded by asin(0.3)
    cos_min = np.cos(np.arcsin(0.3)) - 1e-4
    assert (rd[:, 2] >= cos_min).all()
    assert (np.asarray(sc.new_inside) == 0).all()
    # attenuation = albedo
    np.testing.assert_allclose(np.asarray(sc.weight.x), 0.8, atol=1e-6)


def test_diffuse_light_one_sided_emission_at_shade_level():
    scene = _scene_with(lambda b: b.diffuse_light(b.tex_const([2.0, 3.0, 4.0]), scale=1.5))
    sc, _ = _shade_normal_incidence(scene, inside=0)
    # dot(n, rd) = dot(+z, -z) < 0 -> emits albedo*scale
    np.testing.assert_allclose(np.asarray(sc.emitted.x), 3.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sc.emitted.z), 6.0, atol=1e-5)
    assert not bool(np.asarray(sc.scattered).any())  # lights never scatter


def test_lambertian_cosine_weight_estimator():
    """No lights: weight = albedo * scattering_pdf / pdf. With the
    reference's non-normalized lobe both terms use the SAME direction, so
    the ratio is finite and positive for upward hemispheres."""
    scene = _scene_with(lambda b: b.lambertian(b.tex_const([0.5, 0.5, 0.5])))
    sc, _ = _shade_normal_incidence(scene, inside=0)
    w = np.asarray(sc.weight.x)
    assert np.isfinite(w).all() and (w >= 0).all()
    # scattered directions in the upper hemisphere around +z
    assert (np.asarray(sc.new_rd.z) > -1e-6).all()
    assert bool(np.asarray(sc.add_emitted).all())  # diffuse keeps emission
