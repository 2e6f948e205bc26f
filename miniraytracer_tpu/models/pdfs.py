"""Sampling PDFs: cosine lobe, light-object solid angle, 50/50 mixture.

Data-oriented equivalent of pdf.h's virtual `value/generate` classes. The
"biased object" light list (scene.h:19-25) is a static-count loop over
(light_type, light_idx) rows; values are *averaged* over the list and
generation picks a light uniformly — matching object_list pdf semantics
(scene_object.h:65-77).

Formulas:
- cosine pdf value: max(cos,0)/pi (pdf.h:24-30)
- sphere light:  1/solid-angle of the subtended cone if the ray hits it
  (sphere.cpp:63-72); generate = cone sample (sphere.cpp:74-79)
- rect light:    dist^2/(cos * area) if hit (rect.cpp:92-102); generate =
  uniform point on rect (rect.cpp:104-107); implemented for any axis-rect
  (the reference only implements xz_rect — scenes only use xz lights)
- mixture: 0.5/0.5 (pdf.h:64-80)
"""

from __future__ import annotations

import jax.numpy as jnp

from miniraytracer_tpu.ops import rng, vecmath as vm
from miniraytracer_tpu.ops import intersect as ix
from miniraytracer_tpu.scene import types as T

PI = rng.PI


def cosine_pdf_value(n, d):
    """(N,) pdf of direction d under cosine lobe around n (pdf.h:24-30)."""
    c = vm.dot(d, n)
    return jnp.where(c > 0, c / PI, 0.0)


def isotropic_pdf_value(d):
    return jnp.full(d.shape[:-1], 1.0 / (2.0 * PI))  # pdf.h:41-43 (1/2pi, kept)


def _light_sphere_pdf_value(scene: T.SceneData, si, origin, d, time, inside):
    """sphere::pdf_value (sphere.cpp:63-72) for sphere row si, batched rays."""
    n = origin.shape[0]
    rays = ix.Rays(ro=origin, rd=d, time=time, inside=jnp.zeros((n,), jnp.int32))
    ts = ix.sphere_ts(scene, rays, si, 1, ix.TMIN, jnp.full((n,), ix.INF))[:, 0]
    hit = ts < ix.INF
    cen = ix._sphere_center(scene, jnp.full((n,), si, jnp.int32), time)
    r = scene.sph_radius[si]
    dist_sq = vm.sdot(cen - origin)
    cos_max = jnp.sqrt(jnp.clip(1.0 - r * r / dist_sq, 0.0, 1.0))
    solid_angle = 2.0 * PI * (1.0 - cos_max)
    return jnp.where(hit & (solid_angle > 0), 1.0 / jnp.maximum(solid_angle, 1e-12), 0.0)


def _light_rect_pdf_value(scene: T.SceneData, ri, origin, d, time):
    """xz_rect::pdf_value (rect.cpp:92-102), generalized to any axis-rect."""
    n = origin.shape[0]
    rays = ix.Rays(ro=origin, rd=d, time=time, inside=jnp.zeros((n,), jnp.int32))
    ts = ix.rect_ts(scene, rays, ri, 1, ix.TMIN, jnp.full((n,), ix.INF))[:, 0]
    hit = ts < ix.INF
    area = (scene.rect_i1[ri] - scene.rect_i0[ri]) * (scene.rect_j1[ri] - scene.rect_j0[ri])
    nrm = scene.rect_ek[ri] * scene.rect_sign[ri]
    cosine = jnp.abs(vm.dot(d, nrm))
    dist_sq = ts * ts
    val = dist_sq / jnp.maximum(cosine * area, 1e-12)
    return jnp.where(hit, val, 0.0)


def light_pdf_value(scene: T.SceneData, origin, d, time):
    """Average pdf over the light list (object_list::pdf_value,
    scene_object.h:65-71). Static python loop: n_lights is tiny."""
    acc = jnp.zeros(origin.shape[0])
    inside0 = jnp.zeros(origin.shape[0], jnp.int32)
    for ltype, lidx in scene.lights:
        if ltype == T.PRIM_SPHERE:
            acc = acc + _light_sphere_pdf_value(scene, lidx, origin, d, time, inside0)
        else:
            acc = acc + _light_rect_pdf_value(scene, lidx, origin, d, time)
    return acc / max(scene.n_lights, 1)


def light_pdf_generate(scene: T.SceneData, origin, time, u_pick, u_a, u_b):
    """Direction sample towards a uniformly picked light
    (object_list::pdf_generate, scene_object.h:73-77). Unnormalized."""
    nL = max(scene.n_lights, 1)
    pick = jnp.clip((u_pick * nL).astype(jnp.int32), 0, nL - 1)
    out = jnp.zeros_like(origin)
    for li, (ltype, lidx) in enumerate(scene.lights):
        if ltype == T.PRIM_SPHERE:
            cen = ix._sphere_center(scene, jnp.full(origin.shape[:1], lidx, jnp.int32), time)
            to_c = cen - origin
            dist_sq = vm.sdot(to_c)
            uo, vo, wo = vm.onb_from_w(vm.normalize(to_c))
            local = rng.sample_towards_sphere(scene.sph_radius[lidx], dist_sq, u_a, u_b)
            d = vm.onb_local_to_world(uo, vo, wo, local)
        else:
            # uniform point on the rect (rect.cpp:104-107)
            ii = scene.rect_i0[lidx] + u_a * (scene.rect_i1[lidx] - scene.rect_i0[lidx])
            jj = scene.rect_j0[lidx] + u_b * (scene.rect_j1[lidx] - scene.rect_j0[lidx])
            point = (
                ii[:, None] * scene.rect_ei[lidx]
                + jj[:, None] * scene.rect_ej[lidx]
                + scene.rect_k[lidx] * scene.rect_ek[lidx]
            )
            d = point - origin
        out = jnp.where((pick == li)[:, None], d, out)
    return out
