"""Vectorized ray-primitive intersection (the traversal/intersection layer).

The reference dispatches `scene_object::hit` virtually per object
(scene_object.h:20-31). Here each primitive *type* is intersected as one
batched kernel over `(rays, prims)` — regular, branch-free VPU work — and the
per-type minima are combined by masked selects. Type-level formulas:

- spheres:   sphere.cpp:13-46 (front root; back root only when ray.isInside;
             negative radius = hollow shell via normal /radius)
- rects:     rect.cpp:26-47/71-90/132-150 (one-sided plane + bounds), axis
             encoded as unit vectors so the three variants are one kernel
- triangles: triangle.cpp:221-264 Moller-Trumbore with the branchless
             combined rejection and isInside sign flip
- volumes:   volumes.cpp:5-36 boundary double-hit + exponential free path;
             boundary entry/exit computed analytically (double-sided)

Two-phase design: phase 1 reduces min-t + argmin over prims (chunked `scan`
so (N_rays, N_prims) intermediates stay bounded); phase 2 gathers the winning
primitive's parameters and reconstructs the full hit record (p, n, u, v, mat)
— only O(rays) work.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from miniraytracer_tpu.ops import vecmath as vm
from miniraytracer_tpu.scene import types as T

INF = jnp.float32(3.0e38)
TMIN = 0.001  # main.cpp:71
TRI_EPS = 1e-5  # triangle.cpp:220
CHUNK = 512  # max prims per reduction step; bounds (N_rays, CHUNK) temporaries


class Rays(NamedTuple):
    ro: jnp.ndarray  # (N,3) origin
    rd: jnp.ndarray  # (N,3) direction, normalized
    time: jnp.ndarray  # (N,)
    inside: jnp.ndarray  # (N,) int32 nested-dielectric counter (ray.h:14-15)


class Hit(NamedTuple):
    t: jnp.ndarray  # (N,) INF on miss
    ptype: jnp.ndarray  # (N,) i32 PRIM_*
    pidx: jnp.ndarray  # (N,) i32
    hit: jnp.ndarray  # (N,) bool


class HitRecord(NamedTuple):
    t: jnp.ndarray
    p: jnp.ndarray  # (N,3)
    n: jnp.ndarray  # (N,3)
    u: jnp.ndarray  # (N,)
    v: jnp.ndarray  # (N,)
    mat: jnp.ndarray  # (N,) i32
    hit: jnp.ndarray  # (N,) bool


def _chunked_min(t_fn, n_prims: int, n_rays: int):
    """Reduce (min t, argmin idx) over prims in CHUNK-sized pieces.

    `t_fn(start, count)` -> (N, count) candidate t values (INF = miss).
    Static python loop over chunks (few, unrolled into the XLA graph) keeps
    peak memory at O(N * CHUNK) while letting XLA fuse each chunk's
    elementwise work directly into the reduction.
    """
    best_t = jnp.full((n_rays,), INF)
    best_i = jnp.zeros((n_rays,), jnp.int32)
    for start in range(0, n_prims, CHUNK):
        count = min(CHUNK, n_prims - start)
        tc = t_fn(start, count)  # (N, count)
        i = jnp.argmin(tc, axis=1)
        tmin_c = jnp.take_along_axis(tc, i[:, None], axis=1)[:, 0]
        better = tmin_c < best_t
        best_t = jnp.where(better, tmin_c, best_t)
        best_i = jnp.where(better, i.astype(jnp.int32) + start, best_i)
    return best_t, best_i


# ---------------------------------------------------------------------------
# Spheres
# ---------------------------------------------------------------------------


def _sphere_center(scene: T.SceneData, idx, time):
    """Lerped moving center (sphere.h:24-31); idx/time broadcast together."""
    c0 = scene.sph_c0[idx]
    c1 = scene.sph_c1[idx]
    t0 = scene.sph_t0[idx]
    t1 = scene.sph_t1[idx]
    mov = scene.sph_moving[idx]
    denom = jnp.where(mov > 0, t1 - t0, 1.0)
    f = jnp.where(mov > 0, (time - t0) / denom, 0.0)
    return c0 + f[..., None] * (c1 - c0)


def sphere_ts(scene: T.SceneData, rays: Rays, start, count, tmin, tmax):
    """(N, count) candidate t's for spheres [start, start+count)."""
    idx = jnp.arange(start, start + count)
    cen = _sphere_center(scene, idx[None, :], rays.time[:, None])  # (N,C,3)
    oc = rays.ro[:, None, :] - cen
    b = vm.dot(oc, rays.rd[:, None, :])
    r = scene.sph_radius[idx]
    c = vm.sdot(oc) - r * r
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_front = -b - sq
    t_back = -b + sq
    ok = (disc > 0) & scene.sph_active[idx][None, :]
    front_ok = ok & (t_front < tmax[:, None]) & (t_front > tmin)
    back_ok = (
        ok
        & (rays.inside[:, None] > 0)
        & (t_back < tmax[:, None])
        & (t_back > tmin)
    )
    return jnp.where(front_ok, t_front, jnp.where(back_ok, t_back, INF))


def sphere_record(scene: T.SceneData, rays: Rays, t, idx):
    """Hit record for sphere `idx` at parameter `t` (sphere.cpp:22-45)."""
    cen = _sphere_center(scene, idx, rays.time)
    p = rays.ro + t[:, None] * rays.rd
    n = (p - cen) / scene.sph_radius[idx][:, None]  # negative radius flips
    # spherical uv on the normal (sphere.cpp:6-11)
    phi = jnp.arctan2(n[:, 2], n[:, 0])
    theta = jnp.arcsin(jnp.clip(n[:, 1], -1.0, 1.0))
    u = 0.5 - phi / (2.0 * jnp.pi)
    v = 0.5 + theta / jnp.pi
    return p, n, u, v, scene.sph_mat[idx]


# ---------------------------------------------------------------------------
# Rects (one kernel for xy/xz/yz via axis unit vectors)
# ---------------------------------------------------------------------------


def rect_ts(scene: T.SceneData, rays: Rays, start, count, tmin, tmax):
    idx = jnp.arange(start, start + count)
    ek = scene.rect_ek[idx]  # (C,3)
    sign = scene.rect_sign[idx]
    # one-sided: reject dot(dir, n) > 0 (rect.cpp:26-27)
    dk = rays.rd @ ek.T  # (N,C) dir component along fixed axis
    facing = dk * sign[None, :] <= 0.0
    ok = rays.ro @ ek.T  # origin component along fixed axis
    t = (scene.rect_k[idx][None, :] - ok) / dk
    ii = rays.ro @ scene.rect_ei[idx].T + t * (rays.rd @ scene.rect_ei[idx].T)
    jj = rays.ro @ scene.rect_ej[idx].T + t * (rays.rd @ scene.rect_ej[idx].T)
    inb = (
        (ii >= scene.rect_i0[idx][None, :])
        & (ii <= scene.rect_i1[idx][None, :])
        & (jj >= scene.rect_j0[idx][None, :])
        & (jj <= scene.rect_j1[idx][None, :])
    )
    valid = (
        facing
        & (t >= tmin)
        & (t <= tmax[:, None])
        & inb
        & scene.rect_active[idx][None, :]
    )
    return jnp.where(valid, t, INF)


def rect_record(scene: T.SceneData, rays: Rays, t, idx):
    p = rays.ro + t[:, None] * rays.rd
    ii = vm.dot(p, scene.rect_ei[idx])
    jj = vm.dot(p, scene.rect_ej[idx])
    u = (ii - scene.rect_i0[idx]) / (scene.rect_i1[idx] - scene.rect_i0[idx])
    v = (jj - scene.rect_j0[idx]) / (scene.rect_j1[idx] - scene.rect_j0[idx])
    n = scene.rect_ek[idx] * scene.rect_sign[idx][:, None]
    return p, n, u, v, scene.rect_mat[idx]


# ---------------------------------------------------------------------------
# Triangles (Moller-Trumbore, triangle.cpp:221-264)
# ---------------------------------------------------------------------------


def tri_ts(scene: T.SceneData, rays: Rays, start, count, tmin, tmax):
    idx = jnp.arange(start, start + count)
    m = scene.tri_m[idx]  # (C,3)
    u = scene.tri_u[idx]
    v = scene.tri_v[idx]
    pvec = jnp.cross(rays.rd[:, None, :], v[None, :, :])  # (N,C,3)
    det = vm.dot(u[None, :, :], pvec)  # (N,C)
    sign = jnp.where(
        (rays.inside[:, None] > 0) & (det < 0.0), -1.0, 1.0
    )  # hit backfaces only when inside (triangle.cpp:226-235)
    det = det * sign
    tvec = rays.ro[:, None, :] - m[None, :, :]
    uu = vm.dot(tvec, pvec) * sign
    qvec = jnp.cross(tvec, u[None, :, :])
    vv = vm.dot(rays.rd[:, None, :], qvec) * sign
    safe_det = jnp.where(det > TRI_EPS, det, 1.0)
    t = vm.dot(v[None, :, :], qvec) / safe_det * sign
    valid = (
        (det >= TRI_EPS)
        & (uu >= 0)
        & (uu <= det)
        & (vv >= 0)
        & (uu + vv <= det)
        & (t >= tmin)
        & (t <= tmax[:, None])
        & scene.tri_active[idx][None, :]
    )
    return jnp.where(valid, t, INF)


def tri_record(scene: T.SceneData, rays: Rays, t, idx):
    m = scene.tri_m[idx]
    u = scene.tri_u[idx]
    v = scene.tri_v[idx]
    pvec = jnp.cross(rays.rd, v)
    det = vm.dot(u, pvec)
    sign = jnp.where((rays.inside > 0) & (det < 0.0), -1.0, 1.0)
    det = det * sign
    tvec = rays.ro - m
    uu = vm.dot(tvec, pvec) * sign
    qvec = jnp.cross(tvec, u)
    vv = vm.dot(rays.rd, qvec) * sign
    inv = 1.0 / jnp.where(jnp.abs(det) > 0, det, 1.0)
    uu = uu * inv
    vv = vv * inv
    p = rays.ro + t[:, None] * rays.rd
    # smooth normal interpolation, normalized (triangle.cpp:261)
    n = vm.normalize(
        scene.tri_mn[idx] * (1.0 - uu - vv)[:, None]
        + scene.tri_un[idx] * uu[:, None]
        + scene.tri_vn[idx] * vv[:, None]
    )
    return p, n, uu, vv, scene.tri_mat[idx]


# ---------------------------------------------------------------------------
# Volumes (constant density media, volumes.cpp)
# ---------------------------------------------------------------------------


def _volume_entry_exit(scene: T.SceneData, rays: Rays, vi: int):
    """Analytic double-sided entry/exit of volume vi's boundary along each
    ray's *line* (entry may be negative, matching boundary->hit from
    numeric_limits::lowest(), volumes.cpp:11)."""
    bp = scene.vol_bparams[vi]
    btype = scene.vol_btype[vi]

    # sphere boundary
    cen, rad = bp[0:3], bp[3]
    oc = rays.ro - cen
    b = vm.dot(oc, rays.rd)
    c = vm.sdot(oc) - rad * rad
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    s_enter, s_exit, s_ok = -b - sq, -b + sq, disc > 0

    # rotY+translate box boundary: ray -> local frame (scene_object.cpp:71-81)
    bmin = bp[0:3]
    bmax = bp[3:6]
    sin_t, cos_t = bp[6], bp[7]
    off = bp[8:11]
    ro = rays.ro - off
    lo = jnp.stack(
        [cos_t * ro[:, 0] - sin_t * ro[:, 2], ro[:, 1], cos_t * ro[:, 2] + sin_t * ro[:, 0]],
        axis=-1,
    )
    ld = jnp.stack(
        [
            cos_t * rays.rd[:, 0] - sin_t * rays.rd[:, 2],
            rays.rd[:, 1],
            cos_t * rays.rd[:, 2] + sin_t * rays.rd[:, 0],
        ],
        axis=-1,
    )
    inv = 1.0 / jnp.where(jnp.abs(ld) > 1e-12, ld, jnp.where(ld >= 0, 1e-12, -1e-12))
    ta = (bmin - lo) * inv
    tb = (bmax - lo) * inv
    b_enter = jnp.max(jnp.minimum(ta, tb), axis=-1)
    b_exit = jnp.min(jnp.maximum(ta, tb), axis=-1)
    b_ok = b_enter < b_exit

    is_sph = btype == T.VOLB_SPHERE
    enter = jnp.where(is_sph, s_enter, b_enter)
    exit_ = jnp.where(is_sph, s_exit, b_exit)
    ok = jnp.where(is_sph, s_ok, b_ok)
    return enter, exit_, ok


def volume_ts(scene: T.SceneData, rays: Rays, tmin, tmax, u_volume):
    """Best volume scatter (t, idx) given per-(ray,volume) uniforms
    u_volume (N, V). Mirrors volumes.cpp:5-36 with the surface-closest-hit as
    tmax (the reference's running closest_so_far with volumes last in list)."""
    n = rays.ro.shape[0]
    best_t = jnp.full((n,), INF)
    best_i = jnp.zeros((n,), jnp.int32)
    for vi in range(scene.n_volumes):
        enter, exit_, ok = _volume_entry_exit(scene, rays, vi)
        rec1 = jnp.maximum(enter, tmin)
        rec2 = jnp.minimum(exit_, tmax)
        valid = ok & (rec1 < rec2) & scene.vol_active[vi]
        inside_dist = rec2 - rec1
        uv = jnp.clip(u_volume[:, vi], 1e-38, 1.0)  # log(0) guard
        hit_dist = -(1.0 / scene.vol_density[vi]) * jnp.log(uv)
        scatter = valid & (hit_dist < inside_dist)
        t = rec1 + hit_dist
        better = scatter & (t < best_t)
        best_t = jnp.where(better, t, best_t)
        best_i = jnp.where(better, vi, best_i)
    return best_t, best_i


# ---------------------------------------------------------------------------
# Full-scene closest hit
# ---------------------------------------------------------------------------


def scene_hit(scene: T.SceneData, rays: Rays, u_volume=None, tmin=TMIN) -> HitRecord:
    """Closest hit over all primitive types -> full HitRecord.

    `u_volume` (N, n_volumes) uniforms drive volume free-path sampling; pass
    None for scenes without volumes (or to skip volume scattering).
    """
    n = rays.ro.shape[0]
    tmax0 = jnp.full((n,), INF)

    t_s, i_s = _chunked_min(
        lambda s, c: sphere_ts(scene, rays, s, c, tmin, tmax0), scene.n_spheres, n
    )
    t_r, i_r = _chunked_min(
        lambda s, c: rect_ts(scene, rays, s, c, tmin, tmax0), scene.n_rects, n
    )
    t_t, i_t = _chunked_min(
        lambda s, c: tri_ts(scene, rays, s, c, tmin, tmax0), scene.n_tris, n
    )

    # combine surface types
    t_surf = jnp.minimum(jnp.minimum(t_s, t_r), t_t)
    ptype = jnp.where(
        t_s == t_surf,
        T.PRIM_SPHERE,
        jnp.where(t_r == t_surf, T.PRIM_RECT, T.PRIM_TRI),
    ).astype(jnp.int32)
    pidx = jnp.where(
        t_s == t_surf, i_s, jnp.where(t_r == t_surf, i_r, i_t)
    ).astype(jnp.int32)

    # volumes scatter inside [entry, min(exit, nearest surface)]
    if u_volume is not None and scene.n_volumes > 0:
        t_v, i_v = volume_ts(scene, rays, tmin, t_surf, u_volume)
        vol_wins = t_v < t_surf
        t_final = jnp.where(vol_wins, t_v, t_surf)
        ptype = jnp.where(vol_wins, T.PRIM_VOLUME, ptype)
        pidx = jnp.where(vol_wins, i_v, pidx)
    else:
        t_final = t_surf

    hit = t_final < INF
    safe_t = jnp.where(hit, t_final, 1.0)
    safe_idx = jnp.where(hit, pidx, 0)

    # phase 2: reconstruct record for the winner of each type, select by tag
    p_s, n_s, u_s, v_s, m_s = sphere_record(scene, rays, safe_t, jnp.where(ptype == T.PRIM_SPHERE, safe_idx, 0))
    p_r, n_r, u_r, v_r, m_r = rect_record(scene, rays, safe_t, jnp.where(ptype == T.PRIM_RECT, safe_idx, 0))
    p_t3, n_t3, u_t3, v_t3, m_t3 = tri_record(scene, rays, safe_t, jnp.where(ptype == T.PRIM_TRI, safe_idx, 0))

    p = rays.ro + safe_t[:, None] * rays.rd
    is_s = (ptype == T.PRIM_SPHERE)[:, None]
    is_r = (ptype == T.PRIM_RECT)[:, None]
    is_t = (ptype == T.PRIM_TRI)[:, None]
    nrm = jnp.where(
        is_s, n_s, jnp.where(is_r, n_r, jnp.where(is_t, n_t3, jnp.array([1.0, 0.0, 0.0])))
    )  # volume normal arbitrary (volumes.cpp:29)
    uu = jnp.where(ptype == T.PRIM_SPHERE, u_s, jnp.where(ptype == T.PRIM_RECT, u_r, jnp.where(ptype == T.PRIM_TRI, u_t3, 0.0)))
    vv = jnp.where(ptype == T.PRIM_SPHERE, v_s, jnp.where(ptype == T.PRIM_RECT, v_r, jnp.where(ptype == T.PRIM_TRI, v_t3, 0.0)))
    mat = jnp.where(
        ptype == T.PRIM_SPHERE,
        m_s,
        jnp.where(
            ptype == T.PRIM_RECT,
            m_r,
            jnp.where(ptype == T.PRIM_TRI, m_t3, scene.vol_mat[jnp.where(ptype == T.PRIM_VOLUME, safe_idx, 0)]),
        ),
    ).astype(jnp.int32)

    return HitRecord(t=t_final, p=p, n=nrm, u=uu, v=vv, mat=mat, hit=hit)
