"""Sampling PDFs: cosine lobe, light-object solid angle, 50/50 mixture.

Data-oriented equivalent of pdf.h's virtual `value/generate` classes. The
"biased object" light list (scene.h:19-25) is a static-count loop over
(light_type, light_idx) rows; values are *averaged* over the list and
generation picks a light uniformly — matching object_list pdf semantics
(scene_object.h:65-77). All math is componentwise SoA (vecmath.V3).

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

from miniraytracer_tpu.ops import rng
from miniraytracer_tpu.ops import intersect as ix
from miniraytracer_tpu.ops.vecmath import V3, vdot, vsdot, vnormalize, vonb_from_w, vonb_l2w, vwhere
from miniraytracer_tpu.scene import types as T

PI = rng.PI


def cosine_pdf_value(n: V3, d: V3):
    """(N,) pdf of direction d under cosine lobe around n (pdf.h:24-30)."""
    c = vdot(d, n)
    return jnp.where(c > 0, c / PI, 0.0)


def isotropic_pdf_value(d: V3):
    return jnp.full(d.x.shape, 1.0 / (2.0 * PI))  # pdf.h:41-43 (1/2pi, kept)


def _light_sphere_pdf_value(scene: T.SceneData, si, origin: V3, d: V3, time):
    """sphere::pdf_value (sphere.cpp:63-72) for sphere row si, batched rays."""
    n = time.shape[0]
    rays = ix.Rays(ro=origin, rd=d, time=time, inside=jnp.zeros((n,), jnp.int32))
    ts = ix.sphere_ts(scene, rays, si, 1, ix.TMIN, jnp.full((n,), ix.INF))[0]
    hit = ts < ix.INF
    cen = ix._sphere_center_static(scene, si, time)
    r = scene.sph_radius[si]
    dist_sq = vsdot(cen - origin)
    cm_arg = jnp.clip(1.0 - r * r / jnp.maximum(dist_sq, 1e-30), 0.0, 1.0)
    cm_ok = cm_arg > 1e-12  # eps margin: sqrt backward overflows below it
    cos_max = jnp.where(cm_ok, jnp.sqrt(jnp.where(cm_ok, cm_arg, 1.0)), 0.0)
    solid_angle = 2.0 * PI * (1.0 - cos_max)
    return jnp.where(hit & (solid_angle > 0), 1.0 / jnp.maximum(solid_angle, 1e-12), 0.0)


def _light_rect_pdf_value(scene: T.SceneData, ri, origin: V3, d: V3, time):
    """xz_rect::pdf_value (rect.cpp:92-102), generalized to any axis-rect."""
    n = time.shape[0]
    rays = ix.Rays(ro=origin, rd=d, time=time, inside=jnp.zeros((n,), jnp.int32))
    ts = ix.rect_ts(scene, rays, ri, 1, ix.TMIN, jnp.full((n,), ix.INF))[0]
    hit = ts < ix.INF
    # squaring the 3e38 miss sentinel overflows to inf, which poisons masked
    # gradients — square only on hit lanes
    ts = jnp.where(hit, ts, 1.0)
    area = (scene.rect_i1[ri] - scene.rect_i0[ri]) * (scene.rect_j1[ri] - scene.rect_j0[ri])
    nrm = V3(
        scene.rect_ek[ri, 0] * scene.rect_sign[ri],
        scene.rect_ek[ri, 1] * scene.rect_sign[ri],
        scene.rect_ek[ri, 2] * scene.rect_sign[ri],
    )
    cosine = jnp.abs(vdot(d, nrm))
    dist_sq = ts * ts
    val = dist_sq / jnp.maximum(cosine * area, 1e-12)
    return jnp.where(hit, val, 0.0)


def light_pdf_value(scene: T.SceneData, origin: V3, d: V3, time):
    """Average pdf over the light list (object_list::pdf_value,
    scene_object.h:65-71). Static python loop: n_lights is tiny."""
    acc = jnp.zeros(time.shape[0])
    for ltype, lidx in scene.lights:
        if ltype == T.PRIM_SPHERE:
            acc = acc + _light_sphere_pdf_value(scene, lidx, origin, d, time)
        else:
            acc = acc + _light_rect_pdf_value(scene, lidx, origin, d, time)
    return acc / max(scene.n_lights, 1)


def light_pdf_generate(scene: T.SceneData, origin: V3, time, u_pick, u_a, u_b) -> V3:
    """Direction sample towards a uniformly picked light
    (object_list::pdf_generate, scene_object.h:73-77). Unnormalized."""
    nL = max(scene.n_lights, 1)
    pick = jnp.clip((u_pick * nL).astype(jnp.int32), 0, nL - 1)
    out = V3.zeros(time.shape)
    for li, (ltype, lidx) in enumerate(scene.lights):
        if ltype == T.PRIM_SPHERE:
            cen = ix._sphere_center_static(scene, lidx, time)
            to_c = cen - origin
            dist_sq = vsdot(to_c)
            uo, vo, wo = vonb_from_w(vnormalize(to_c))
            local = rng.sample_towards_sphere(scene.sph_radius[lidx], dist_sq, u_a, u_b)
            d = vonb_l2w(uo, vo, wo, local)
        else:
            # uniform point on the rect (rect.cpp:104-107)
            ii = scene.rect_i0[lidx] + u_a * (scene.rect_i1[lidx] - scene.rect_i0[lidx])
            jj = scene.rect_j0[lidx] + u_b * (scene.rect_j1[lidx] - scene.rect_j0[lidx])
            ei = V3(scene.rect_ei[lidx, 0], scene.rect_ei[lidx, 1], scene.rect_ei[lidx, 2])
            ej = V3(scene.rect_ej[lidx, 0], scene.rect_ej[lidx, 1], scene.rect_ej[lidx, 2])
            ek = V3(scene.rect_ek[lidx, 0], scene.rect_ek[lidx, 1], scene.rect_ek[lidx, 2])
            point = ei * ii + ej * jj + ek * scene.rect_k[lidx]
            d = point - origin
        out = vwhere(pick == li, d, out)
    return out
