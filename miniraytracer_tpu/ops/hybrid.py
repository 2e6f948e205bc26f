"""Hybrid step renderer: fused shade kernel + external flash intersection.

The fused render kernel (ops/bounce.py) runs the whole per-lane render loop
in ONE kernel, but only for scenes whose primitive tables fit its SMEM
scalar budget (<= 64 prims/type) with no image textures. Everything bigger
fell back to the XLA wavefront: ~40 small HBM-bound fusions per bounce
(record assembly, texture lookups, MIS light pdfs, merge bookkeeping) that
dominate the frame even when intersection runs in a flash cluster kernel.

This module keeps every lane's SHADING fused while letting intersection of
large primitive sets stay in the dedicated flash cluster kernels:

    per bounce step (one lax.while_loop iteration, all on device):
      1. flash cluster kernels intersect the EXTERNAL types (spheres/tris
         with > 64 prims) -> per-lane nearest candidate (t, index)
      2. a thin XLA phase assembles the winner's record (normal, material)
         via one-hot MXU lookups -- the only per-winner table gathers
      3. ONE Pallas step kernel: in-SMEM primitive sweeps seeded with the
         external candidate (rects, volumes, small sphere/tri sets) +
         material dispatch + MIS light sampling + draw2 merge + lane
         regeneration (bounce.wave_step -- the same code the fused kernel
         loops in-kernel)
      4. image-texture lanes (reference texture.cpp:207-225) defer only
         the texel FETCH: the kernel shades with albedo 1, computes the
         uv trig on the winner normal (== (p-c)/radius, the exact
         argument of the reference's get_sphere_uv, sphere.cpp:6-11) and
         the NN clamp/flip quantization IN-KERNEL, and reports the flat
         texel index; one XLA gather multiplies the texel into beta

Estimator-identical to integrator.render_wavefront_pixels (same
counter-keyed RNG, merge, NaN/clamp policy); covers the scene classes the
fused kernel cannot: earth (image), random_spheres{,_2} (487/~900 spheres),
triangles (11.3k tris), book2_final (1032 spheres + mesh + image + volume).

Reference: trace() main.cpp:66-118; draw2 merge main.cpp:214-229.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.models.textures import (sample_texture,
                                               sample_texture_deferred)
from miniraytracer_tpu.ops import bounce as B
from miniraytracer_tpu.ops import intersect as ix
from miniraytracer_tpu.ops.lookup import lookup_cols
from miniraytracer_tpu.ops.vecmath import V3
from miniraytracer_tpu.scene import types as T

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

BLOCK_ROWS = B.BLOCK_ROWS
NF, NI = B.NF, B.NI
INF = B.INF
NAN = jnp.float32(float("nan"))

# external-candidate rows fed to the step kernel; ext-material mode
# (scenes whose mat/tex tables exceed the SMEM budget) appends six more:
# (mtype, mparam, albedo r, g, b, deferred image texel index) evaluated in
# XLA for the ext winner — the texel index row is -1 unless the winner's
# texture is an image AND the plan's ext_defer flag holds (the fetch then
# happens once, between steps, instead of a full-lane gather per step)
E_T, E_NX, E_NY, E_NZ, E_MAT = range(5)
NE = 5
NE_MAT = 11


def _is_traced(x) -> bool:
    return isinstance(x, jax.core.Tracer)


def _ext_types(scene: T.SceneData):
    """Which primitive types are intersected OUTSIDE the step kernel
    (spheres/tris via flash cluster kernels; boxes via the XLA sweep —
    box sets beyond the SMEM unroll budget are rare and cheap per test)."""
    return (scene.n_spheres > B.MAX_PRIMS, scene.n_tris > B.MAX_PRIMS,
            scene.has_boxes and scene.n_boxes > B.MAX_PRIMS)


def ext_mat_mode(scene: T.SceneData) -> bool:
    """True when the scene's material/texture tables exceed the SMEM
    budget, so the external winner's material is evaluated in XLA and
    rides the candidate rows (random_spheres' 490 per-sphere materials)."""
    return (scene.mat_type.shape[0] > B.MAX_MATS
            or scene.tex_type.shape[0] > B.MAX_TEXS)


def _smem_mat_ids(scene: T.SceneData):
    """Static (mat ids, tex ids) referenced by IN-SMEM entities (rects,
    volumes, non-ext prim types) — the set the compacted SMEM tables must
    hold in ext-material mode."""
    ext_sph, ext_tri, ext_box = _ext_types(scene)
    used: list = []

    def add(arr, act):
        a = np.asarray(arr)
        m = np.asarray(act).astype(bool)
        used.extend(a[m].tolist())

    if scene.n_spheres and not ext_sph:
        add(scene.sph_mat, scene.sph_active)
    if scene.n_rects:
        add(scene.rect_mat, scene.rect_active)
    if scene.n_tris and not ext_tri:
        add(scene.tri_mat, scene.tri_active)
    if scene.has_boxes and scene.n_boxes and not ext_box:
        add(scene.box_mat, scene.box_active)
    if scene.n_volumes:
        add(scene.vol_mat, scene.vol_active)
    any_used = bool(used)
    mat_ids = sorted(set(int(v) for v in used)) or [0]
    tex_ids = sorted(set(
        int(v) for v in np.asarray(scene.mat_tex)[np.asarray(mat_ids)]
    )) or [0]
    return mat_ids, tex_ids, any_used


def smem_plan(scene: T.SceneData):
    """Static, HASHABLE compaction plan for ext-material mode: which
    mat/tex rows the SMEM tables keep, plus the remapped prim/mat id
    vectors. Must be computed from a CONCRETE scene (the structural id
    arrays are read as numpy); pass the result through jit boundaries
    where the scene leaves are tracers (the VALUE arrays — colors,
    params — may be traced there, and static-index gathers keep their
    cotangent chain to the full TrainParams)."""
    mat_ids, tex_ids, any_used = _smem_mat_ids(scene)
    mat_pos = {m: i for i, m in enumerate(mat_ids)}
    tex_pos = {t: i for i, t in enumerate(tex_ids)}

    def rm(arr):
        return tuple(
            mat_pos.get(int(v), 0) for v in np.asarray(arr).ravel())

    kept_tex_type = np.asarray(scene.tex_type)[np.asarray(tex_ids)]
    # texel deferral: scattering materials (lambertian/metal/isotropic)
    # defer per-lane; dielectric image lanes skip the gather entirely
    # (their albedo is never read). Only image-textured LIGHTS block the
    # mode — emission needs the real texel at shade time.
    mat_type = np.asarray(scene.mat_type)
    mat_img = np.asarray(scene.tex_type)[np.asarray(scene.mat_tex)] == T.TEX_IMAGE
    return (
        ("any_used", any_used),
        ("box_mat", rm(scene.box_mat)
         if scene.has_boxes and scene.n_boxes else None),
        ("ext_defer",
         bool(~(mat_img & (mat_type == T.MAT_DIFFUSE_LIGHT)).any())),
        ("has_image_k",
         bool(any_used and (kept_tex_type == T.TEX_IMAGE).any())),
        ("mat_ids", tuple(mat_ids)),
        ("mat_tex", tuple(
            tex_pos.get(int(v), 0)
            for v in np.asarray(scene.mat_tex)[np.asarray(mat_ids)])),
        ("rect_mat", rm(scene.rect_mat)),
        ("sph_mat", rm(scene.sph_mat)),
        ("tex_ids", tuple(tex_ids)),
        ("tri_mat", rm(scene.tri_mat)),
        ("vol_mat", rm(scene.vol_mat)),
    )


def _smem_scene(scene: T.SceneData, plan=None):
    """Scene copy with mat/tex tables compacted per `plan` (see smem_plan)
    — for PACKING only; the XLA ext-material evaluation keeps reading the
    original scene."""
    import dataclasses

    if plan is None:
        plan = smem_plan(scene)  # requires a concrete scene
    p = dict(plan)
    any_used = p["any_used"]
    midx = np.asarray(p["mat_ids"])
    tidx = np.asarray(p["tex_ids"])
    # no in-SMEM entity references any material: the kept slot is a pure
    # placeholder — neutralize it so a dummy image texture can't enable
    # the in-kernel deferral machinery for lanes that cannot exist
    tex_type_k = (scene.tex_type[tidx] if any_used
                  else jnp.zeros((len(tidx),), scene.tex_type.dtype))
    repl = dict(
        mat_type=scene.mat_type[midx],
        mat_param=scene.mat_param[midx],
        mat_tex=jnp.asarray(np.asarray(p["mat_tex"], np.int32)),
        tex_type=tex_type_k,
        tex_c0=scene.tex_c0[tidx],
        tex_c1=scene.tex_c1[tidx],
        tex_scale=scene.tex_scale[tidx],
        tex_img=scene.tex_img[tidx],
        # image machinery only if a KEPT texture is an image (ext-prim
        # images are evaluated in XLA and ride the albedo rows)
        has_image=p["has_image_k"],
    )
    for name in ("sph_mat", "rect_mat", "tri_mat", "vol_mat"):
        repl[name] = jnp.asarray(np.asarray(p[name], np.int32)).reshape(
            getattr(scene, name).shape)
    if p["box_mat"] is not None:
        repl["box_mat"] = jnp.asarray(
            np.asarray(p["box_mat"], np.int32)).reshape(scene.box_mat.shape)
    return dataclasses.replace(scene, **repl)


def can_hybrid(scene: T.SceneData, for_tpu: bool = True) -> bool:
    """Step-kernel eligibility: in-SMEM tables for everything except
    (optionally) one big sphere set and one big triangle set; scenes whose
    mat/tex tables exceed SMEM qualify via ext-material mode when the
    in-SMEM-referenced subset fits."""
    if not HAVE_PALLAS:
        return False
    if for_tpu and jax.default_backend() != "tpu":
        return False
    ext_sph, ext_tri, ext_box = _ext_types(scene)
    if scene.n_rects > B.MAX_PRIMS or scene.n_volumes > B.MAX_VOLS:
        return False
    emat = ext_mat_mode(scene)
    if emat:
        # every over-budget material must live on an EXT prim; the
        # in-SMEM-referenced subset must fit the compacted tables
        mat_ids, tex_ids, _any = _smem_mat_ids(scene)
        if len(mat_ids) > B.MAX_MATS or len(tex_ids) > B.MAX_TEXS:
            return False
    if len(scene.lights) > 4:
        return False
    if ext_sph and any(lt == T.PRIM_SPHERE for lt, _ in scene.lights):
        return False  # light pdf reads the in-SMEM sphere table
    if scene.fast_perlin:
        return False  # opt-in hash-gradient mode stays on the XLA path
    if scene.has_image:
        # IN-KERNEL image uv is reconstructed from the winner normal --
        # valid for spheres only (reference puts images only on spheres).
        # Ext-prim images are exempt: their uv comes from the exact
        # record in the XLA material evaluation (ext-material mode).
        mat_tex = np.asarray(scene.mat_tex)
        tex_type = np.asarray(scene.tex_type)
        img_mats = set(np.nonzero(tex_type[mat_tex] == T.TEX_IMAGE)[0].tolist())
        checks = []
        checks.append((scene.rect_mat, scene.rect_active))
        if not (emat and ext_tri):
            checks.append((scene.tri_mat, scene.tri_active))
        # boxes/volumes have no spherical uv either: an image texture on
        # a box face or a volume's isotropic material would shade from the
        # wrong (normal-derived) uv — only ext-material-mode prims are
        # exempt (their uv comes from the exact record in XLA)
        if scene.has_boxes and scene.n_boxes and not (emat and ext_box):
            checks.append((scene.box_mat, scene.box_active))
        if scene.n_volumes:
            checks.append((scene.vol_mat, scene.vol_active))
        for arr, act in checks:
            live = np.asarray(arr)[np.asarray(act)]
            if live.shape[0] and img_mats & set(live.tolist()):
                return False
    return True


def prefer_hybrid(scene: T.SceneData, for_tpu: bool = True) -> bool:
    """Auto-pick policy: hybrid where it measured faster. Ext-material
    scenes WITH an image texture pay a per-step XLA texture/image eval on
    every lane and lose to the plain wavefront (random_spheres_2 on-chip:
    hybrid 4.2 vs wavefront 11.6 Mrays/s; random_spheres, imageless,
    wins 22.4 vs 19.5) — capability (can_hybrid) is unchanged, only the
    default choice."""
    return can_hybrid(scene, for_tpu) and not (
        ext_mat_mode(scene) and scene.has_image)


def pack_scene_hybrid(scene: T.SceneData, plan=None):
    """bounce.pack_scene with external types stripped from the SMEM tables
    (meta count 0 + dummy table: the step kernel sees them only through the
    external candidate rows). In ext-material mode the mat/tex tables are
    compacted to the in-SMEM-referenced subset first (_smem_scene);
    `plan` (smem_plan) must be supplied when the scene leaves are traced."""
    emat = ext_mat_mode(scene)
    if emat and plan is None:
        plan = smem_plan(scene)  # requires a concrete scene
    meta, tables = B.pack_scene(_smem_scene(scene, plan) if emat else scene)
    ext_sph, ext_tri, ext_box = _ext_types(scene)
    if emat:
        meta = dict(meta, ext_mat=True)
        if dict(plan)["ext_defer"] and scene.has_image:
            # deferred ext texels ride the img channel: the kernel must
            # emit it and the caller must gather, even when no KEPT SMEM
            # texture is an image (img_hw spans the FULL image table —
            # both in-SMEM and ext flat indices address scene.images).
            # The f32-exactness bound must be re-checked here: pack_scene
            # saw the COMPACTED scene (possibly has_image=False) and its
            # own 2^24 guard then never ran.
            n_img, ih, iw = (int(d) for d in scene.images.shape[:3])
            if n_img * ih * iw >= 2 ** 24:
                raise ValueError(
                    f"image texel table too large for the f32 ext-defer "
                    f"index row: {n_img}x{ih}x{iw} >= 2^24 texels")
            meta = dict(meta, image=True, img_hw=(ih, iw))
    if ext_sph:
        meta = dict(meta, S=0)
        tables[0] = jnp.zeros((1,), jnp.float32)
    if ext_tri:
        meta = dict(meta, Tc=0)
        tables[2] = jnp.zeros((1,), jnp.float32)
    if ext_box:
        meta = dict(meta, Bx=0)
        tables[3] = jnp.zeros((1,), jnp.float32)
    return meta, tables


def hybrid_accel(scene: T.SceneData, interpret: bool = False):
    """Flash cluster state for the external types (mirrors
    intersect.make_accel's forward-path thresholds, but backend-agnostic so
    the interpret-mode tests can exercise the full pipeline on CPU)."""
    from miniraytracer_tpu.ops import flash

    ext_sph, ext_tri, _ext_box = _ext_types(scene)
    accel = {}
    if ext_tri:
        m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
        u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
        v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
        coeffs = flash.tri_coefficients(m, u, v, scene.tri_active)
        if scene.n_tris < ix.FLASH_CULL_MIN_TRIS:
            accel["tri"] = coeffs
        else:
            accel["tri_cull"] = flash.tri_cull_build(
                m, u, v, scene.tri_active, coeffs)
    if ext_sph:
        coeffs_s = flash.sphere_coefficients(scene)
        if scene.n_spheres < ix.FLASH_GATE_MIN_SPHERES:
            accel["sph"] = coeffs_s
        elif scene.n_spheres < ix.FLASH_CULL_MIN_SPHERES:
            accel["sph_gate"] = flash.sph_cull_build(scene, coeffs_s)
        else:
            accel["sph_cull"] = flash.sph_cull_build(scene, coeffs_s)
    return accel


def _const_miss_rows(n, emat):
    """Constant miss-record candidate rows: NE (t=INF, n=(1,0,0), mat 0)
    or, in ext-material mode, NE_MAT with the mat_f = -1 sentinel, zero
    material rows and no deferred texel (the step kernel stacks the
    candidate against a fixed row-count spec, so the width must match)."""
    z = jnp.zeros((n,), jnp.float32)
    neg1 = jnp.full((n,), -1.0, jnp.float32)
    rows = (jnp.full((n,), INF), jnp.ones((n,), jnp.float32), z, z)
    if emat:
        return rows + (neg1, z, z, z, z, z, neg1)
    return rows + (z,)


def _external_candidate(scene, accel, rays, alive, tmin, interpret,
                        plan=None):
    """Flash-intersect the external types and assemble the winner record.

    Dead lanes are fed NaN rays: NaN slab/quadratic tests gate nothing in
    (the padding-lane convention of the cluster kernels), so stale rays
    don't inflate any block's compacted cluster union.

    Returns 5 (N,) rows: (t, nx, ny, nz, mat_f), t == INF when none."""
    from miniraytracer_tpu.ops import flash

    n = rays.time.shape[0]
    if not accel and not _ext_types(scene)[2]:
        # no external types at all (e.g. earth: hybrid solely for the
        # image-texel deferral) — the candidate is the constant miss
        # record; skip the NaN masking / assembly phase entirely
        # (measured 1.45 ms per 250k-lane step as dead weight). In
        # ext-material mode the step kernel consumes NE_MAT rows, so the
        # miss record must carry the full 10 (mat_f = -1 sentinel).
        return _const_miss_rows(n, ext_mat_mode(scene))
    nan3 = V3(jnp.where(alive, rays.ro.x, NAN),
              jnp.where(alive, rays.ro.y, NAN),
              jnp.where(alive, rays.ro.z, NAN))
    nand = V3(jnp.where(alive, rays.rd.x, NAN),
              jnp.where(alive, rays.rd.y, NAN),
              jnp.where(alive, rays.rd.z, NAN))
    inf = jnp.full((n,), INF)

    has_sph = any(k in accel for k in ("sph", "sph_gate", "sph_cull"))
    has_tri = any(k in accel for k in ("tri", "tri_cull"))

    t_s, i_s = inf, jnp.zeros((n,), jnp.int32)
    if "sph" in accel:
        t_s, i_s = flash.flash_sphere_hit(
            accel["sph"], nan3, nand, rays.time, rays.inside, tmin,
            interpret=interpret)
    elif "sph_gate" in accel:
        t_s, i_s = flash.flash_sphere_hit_gated(
            accel["sph_gate"], nan3, nand, rays.time, rays.inside, tmin,
            interpret=interpret)
    elif "sph_cull" in accel:
        t_s, i_s = flash.flash_sphere_hit_streamed(
            accel["sph_cull"], nan3, nand, rays.time, rays.inside, tmin,
            interpret=interpret)

    t_t, i_t = inf, jnp.zeros((n,), jnp.int32)
    if "tri" in accel:
        t_t, i_t = flash.flash_tri_hit(
            accel["tri"], nan3, nand, rays.inside, tmin, interpret=interpret)
    elif "tri_cull" in accel:
        # seed with the sphere winner AND a t-only in-SMEM rect sweep: the
        # rect floor prunes downward-ray clusters exactly as scene_hit's
        # seed chaining does (the step kernel re-finds the rect winner; a
        # returned t == seed means "nothing beat the seed", filtered below)
        seed = t_s
        if scene.n_rects:
            tmax0 = jnp.full((n,), INF)
            t_r, _ = ix._chunked_min(
                lambda s, c: ix.rect_ts(scene, rays, s, c, tmin, tmax0),
                scene.n_rects, n)
            seed = jnp.minimum(seed, t_r)
        seed = jnp.where(alive, seed, 0.0)
        if flash.resident_ok(accel["tri_cull"]):
            t_t, i_t = flash.flash_tri_hit_resident(
                accel["tri_cull"], nan3, nand, rays.inside, tmin, seed,
                interpret=interpret)
        else:
            t_t, i_t = flash.flash_tri_hit_streamed(
                accel["tri_cull"], nan3, nand, rays.inside, tmin, seed,
                interpret=interpret)
        t_t = jnp.where(t_t < seed, t_t, INF)

    # big box sets: XLA one-sided slab sweep (any count, ~60 flops/test —
    # book2's 400 ground boxes); uses the real rays (box_ts masks inactive)
    _, _, ext_box = _ext_types(scene)
    t_b = inf
    i_b = jnp.zeros((n,), jnp.int32)
    if ext_box:
        tmax0 = jnp.full((n,), INF)
        t_b, i_b = ix._chunked_min(
            lambda s, c: ix.box_ts(scene, rays, s, c, tmin, tmax0),
            scene.n_boxes, n)
        t_b = jnp.where(alive & jnp.isfinite(t_b), t_b, INF)

    # combine: scene_hit's type-order tie preference (sphere > tri > box)
    ext_t = jnp.minimum(jnp.minimum(t_s, t_t), t_b)
    is_s = t_s <= jnp.minimum(t_t, t_b)
    is_t = ~is_s & (t_t <= t_b)
    is_b = ~is_s & ~is_t
    has = ext_t < INF
    safe_t = jnp.where(has, ext_t, 1.0)
    from miniraytracer_tpu.ops.vecmath import vwhere

    one = jnp.ones_like(safe_t)
    zero = jnp.zeros_like(safe_t)
    nrm = V3(one, zero, zero)
    mat = jnp.zeros((n,), jnp.int32)
    uu = zero
    vv = zero
    if has_sph:
        idx_s = jnp.where(is_s & has, i_s, 0)
        _, n_sph, u_s, v_s, m_sph = ix.sphere_record(scene, rays, safe_t,
                                                     idx_s)
        nrm = vwhere(is_s, n_sph, nrm)
        mat = jnp.where(is_s, m_sph, mat)
        uu = jnp.where(is_s, u_s, uu)
        vv = jnp.where(is_s, v_s, vv)
    if has_tri:
        idx_t = jnp.where(is_t & has, i_t, 0)
        _, n_tri, u_t, v_t, m_tri = ix.tri_record(scene, rays, safe_t, idx_t)
        nrm = vwhere(is_t, n_tri, nrm)
        mat = jnp.where(is_t, m_tri, mat)
        uu = jnp.where(is_t, u_t, uu)
        vv = jnp.where(is_t, v_t, vv)
    if ext_box:
        idx_b = jnp.where(is_b & has, i_b, 0)
        _, n_box, u_b, v_b, m_box = ix.box_record(scene, rays, safe_t, idx_b)
        nrm = vwhere(is_b, n_box, nrm)
        mat = jnp.where(is_b, m_box, mat)
        uu = jnp.where(is_b, u_b, uu)
        vv = jnp.where(is_b, v_b, vv)

    nx = jnp.where(has, nrm.x, one)
    ny = jnp.where(has, nrm.y, 0.0)
    nz = jnp.where(has, nrm.z, 0.0)
    ext_t = jnp.where(has, ext_t, INF)
    if not ext_mat_mode(scene):
        mat_f = jnp.where(has, mat, 0).astype(jnp.float32)
        return ext_t, nx, ny, nz, mat_f
    # ext-material mode: the kernel's SMEM tables are compacted to the
    # in-SMEM-referenced subset, so the winner's material is evaluated
    # HERE from the full tables (texture sampled at the exact record uv,
    # texture.cpp) and rides six extra rows. mat_f is the sentinel -1 so
    # the kernel's SMEM mat where-chain never matches an ext lane. When
    # the plan's ext_defer flag holds, image texels are NOT fetched here:
    # the row carries the flat NN texel index (albedo 1) and the caller
    # gathers once between steps — saves the measured 2.2 ms/250k-lane
    # XLA gather per step (the cost that made random_spheres_2 lose to
    # the plain wavefront/packed paths).
    if plan is None and not _is_traced(scene.mat_type):
        plan = smem_plan(scene)
    defer = bool(dict(plan)["ext_defer"]) if plan is not None else False
    mt, mp, mtex = lookup_cols(
        mat, (scene.mat_type, scene.mat_param, scene.mat_tex))
    p = rays.ro + rays.rd * safe_t
    mat_f = jnp.full((n,), -1.0, jnp.float32)
    if defer and scene.has_image:
        consume = ((mt == T.MAT_LAMBERTIAN) | (mt == T.MAT_METAL)
                   | (mt == T.MAT_ISOTROPIC))
        albedo, idxf = sample_texture_deferred(scene, mtex, uu, vv, p,
                                               consume)
    else:
        albedo = sample_texture(scene, mtex, uu, vv, p)
        idxf = jnp.full((n,), -1.0, jnp.float32)
    return (ext_t, nx, ny, nz, mat_f, mt.astype(jnp.float32), mp,
            albedo.x, albedo.y, albedo.z, idxf)


# ---------------------------------------------------------------------------
# Step kernel
# ---------------------------------------------------------------------------


def _make_step_kernel(meta, width, height, sq, max_bounces, image):
    ne = NE_MAT if meta.get("ext_mat") else NE

    def kernel(sph_ref, rect_ref, tri_ref, box_ref, vol_ref, mat_ref,
               tex_ref, cam_ref,
               ptab_ref, misc_ref, f_ref, i_ref, k_ref, ray_ref, pix_ref,
               ext_ref, fo_ref, io_ref, ko_ref, rayo_ref, *img_refs):
        tabs = (sph_ref, rect_ref, tri_ref, box_ref, vol_ref, mat_ref,
                tex_ref)
        max_lum = misc_ref[0]
        sample_lo = misc_ref[1].astype(jnp.int32)
        n_samples = misc_ref[2].astype(jnp.int32)
        pix = pix_ref[:]
        c = (tuple(f_ref[r] for r in range(NF))
             + tuple(i_ref[r] for r in range(NI))
             + (k_ref[:], ray_ref[:]))
        ext = tuple(ext_ref[r] for r in range(ne))
        out, b, cont = B.wave_step(
            meta, tabs, ptab_ref, cam_ref, width, height, sq, max_bounces,
            max_lum, sample_lo, n_samples, pix, c, ext=ext)
        fo_ref[:] = jnp.stack(out[:NF])
        io_ref[:] = jnp.stack(out[NF:NF + NI])
        ko_ref[:] = out[NF + NI]
        rayo_ref[:] = out[NF + NI + 1]
        if image:
            (imgo_ref,) = img_refs
            none = jnp.full_like(b.safe_t, -1.0)
            # only CONTINUING lanes carry a pending image albedo (finished
            # lanes at the depth cap return emitted only -- the albedo is
            # never used, matching trace()'s depth-cap branch)
            imgo_ref[:] = jnp.stack([jnp.where(cont, b.img_id, none)])

    return kernel


@partial(jax.jit, static_argnames=(
    "meta", "width", "height", "sq", "max_bounces", "image", "interpret"))
def _step_call(meta, tables, fstate, istate, keys, rays_ct, pix, ext, misc,
               *, width, height, sq, max_bounces, image, interpret):
    meta_d = dict(meta)
    r128 = fstate.shape[1]
    kernel = _make_step_kernel(meta_d, width, height, sq, max_bounces, image)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ptab_spec = pl.BlockSpec((96, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    spec3 = lambda rows: pl.BlockSpec((rows, BLOCK_ROWS, 128),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((NF, r128, 128), jnp.float32),
        jax.ShapeDtypeStruct((NI, r128, 128), jnp.int32),
        jax.ShapeDtypeStruct((r128, 128), jnp.uint32),
        jax.ShapeDtypeStruct((r128, 128), jnp.float32),
    ]
    out_specs = [spec3(NF), spec3(NI), spec2, spec2]
    if image:
        out_shape.append(jax.ShapeDtypeStruct((1, r128, 128), jnp.float32))
        out_specs.append(spec3(1))
    res = pl.pallas_call(
        kernel,
        grid=(r128 // BLOCK_ROWS,),
        in_specs=([smem] * 8 + [ptab_spec, smem]
                  + [spec3(NF), spec3(NI), spec2, spec2, spec2,
                     spec3(NE_MAT if meta_d.get("ext_mat") else NE)]),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*tables, misc, fstate, istate, keys, rays_ct, pix, ext)
    if image:
        f_out, i_out, k_out, ray_out, img_out = res
    else:
        f_out, i_out, k_out, ray_out = res
        img_out = None
    return f_out, i_out, k_out, ray_out, img_out


# ---------------------------------------------------------------------------
# Shade-only step kernel for the work-queue renderer
# ---------------------------------------------------------------------------
# The work queue (integrator.render_workqueue_pixels) keeps its prefix-sum
# claiming / scatter-merge in XLA (they're cheap and global); only the
# per-bounce SHADING — bounce_physics + the miss/emit/throughput advance —
# moves into one kernel. Rows in: ro(3) rd(3) time beta(3) rad(3) depth_ok
# alive keys ext(5); rows out: cont p(3) new_rd(3) beta(3) rad(3) hit
# [+ img(4)], plus new_inside (int).

SH_RO, SH_RD, SH_TIME, SH_BETA, SH_RAD, SH_DOK, SH_ALIVE = 0, 3, 6, 7, 10, 13, 14
SH_NF = 15
SO_CONT, SO_P, SO_RD, SO_BETA, SO_RAD = 0, 1, 4, 7, 10
SO_NF = 13


def _make_shade_kernel(meta, image):
    ne = NE_MAT if meta.get("ext_mat") else NE

    def kernel(sph_ref, rect_ref, tri_ref, box_ref, vol_ref, mat_ref,
               tex_ref, cam_ref, ptab_ref, f_ref, i_ref, k_ref, ext_ref,
               fo_ref, io_ref, *img_refs):
        tabs = (sph_ref, rect_ref, tri_ref, box_ref, vol_ref, mat_ref,
                tex_ref)
        del cam_ref  # no camera regen in the shade step
        ro = V3(f_ref[SH_RO], f_ref[SH_RO + 1], f_ref[SH_RO + 2])
        rd = V3(f_ref[SH_RD], f_ref[SH_RD + 1], f_ref[SH_RD + 2])
        time = f_ref[SH_TIME]
        beta = V3(f_ref[SH_BETA], f_ref[SH_BETA + 1], f_ref[SH_BETA + 2])
        radiance = V3(f_ref[SH_RAD], f_ref[SH_RAD + 1], f_ref[SH_RAD + 2])
        depth_ok = f_ref[SH_DOK] > 0.0
        alive = f_ref[SH_ALIVE] > 0.0
        inside = i_ref[:]  # whole (8,128) block — i_ref[0] would broadcast
        # row 0's counters over all sublanes (nested-dielectric corruption)
        keys_b = k_ref[:]
        ext = tuple(ext_ref[r] for r in range(ne))

        b = B.bounce_physics(meta, tabs, ptab_ref, ro, rd, time, inside,
                             keys_b, ext=ext)
        scattered = depth_ok & ~b.is_light
        add_emitted = ~(scattered & b.is_specular)
        miss = alive & ~b.hit
        bg = B.background_color(meta, rd, b.safe_t)
        zero3 = V3(0.0 * b.safe_t, 0.0 * b.safe_t, 0.0 * b.safe_t)
        radiance = radiance + B._vwhere(miss, beta * bg, zero3)
        emit_mask = alive & b.hit & add_emitted
        radiance = radiance + B._vwhere(emit_mask, beta * b.emitted, zero3)
        cont = alive & b.hit & scattered
        beta = B._vwhere(cont, beta * b.weight, beta)
        cont = cont & ((beta.x > 0.0) | (beta.y > 0.0) | (beta.z > 0.0))

        fo_ref[:] = jnp.stack((
            jnp.where(cont, 1.0, 0.0),
            b.p.x, b.p.y, b.p.z,
            b.new_rd.x, b.new_rd.y, b.new_rd.z,
            beta.x, beta.y, beta.z,
            radiance.x, radiance.y, radiance.z,
        ))
        io_ref[:] = b.new_inside
        if image:
            (imgo_ref,) = img_refs
            none = jnp.full_like(b.safe_t, -1.0)
            imgo_ref[:] = jnp.stack([jnp.where(cont, b.img_id, none)])

    return kernel


@partial(jax.jit, static_argnames=("meta", "image", "interpret"))
def _shade_call(meta, tables, fstate, istate, keys_b, ext, *, image,
                interpret):
    meta_d = dict(meta)
    r128 = fstate.shape[1]
    kernel = _make_shade_kernel(meta_d, image)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ptab_spec = pl.BlockSpec((96, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    spec3 = lambda rows: pl.BlockSpec((rows, BLOCK_ROWS, 128),
                                      lambda i: (0, i, 0),
                                      memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((SO_NF, r128, 128), jnp.float32),
        jax.ShapeDtypeStruct((r128, 128), jnp.int32),
    ]
    out_specs = [spec3(SO_NF), spec2]
    if image:
        out_shape.append(jax.ShapeDtypeStruct((1, r128, 128), jnp.float32))
        out_specs.append(spec3(1))
    res = pl.pallas_call(
        kernel,
        grid=(r128 // BLOCK_ROWS,),
        in_specs=([smem] * 8 + [ptab_spec]
                  + [spec3(SH_NF), spec2, spec2,
                     spec3(NE_MAT if meta_d.get("ext_mat") else NE)]),
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*tables, fstate, istate, keys_b, ext)
    if image:
        f_out, i_out, img_out = res
    else:
        f_out, i_out = res
        img_out = None
    return f_out, i_out, img_out


def make_workqueue_shader(scene, interpret=False, plan=None):
    """A drop-in replacement for the work queue's XLA shading phase
    (integrator._shade_and_advance's semantics, minus HitRecord details):

        shader(rays, keys_b, depth_ok, alive, beta, radiance)
          -> (p V3, new_rd V3, new_inside, cont, beta' V3, radiance' V3)

    Flash cluster kernels intersect the external types, one Pallas step
    kernel does the in-SMEM sweeps + shading. `scene` may be traced if
    `plan` (smem_plan, or None for non-ext-material scenes) is given."""
    meta_d, tables = pack_scene_hybrid(scene, plan)
    meta = tuple(sorted(meta_d.items()))
    image = meta_d["image"]
    accel = hybrid_accel(scene, interpret)
    tables = tuple(tables)

    def shader(rays, keys_b, depth_ok, alive, beta, radiance):
        n = rays.time.shape[0]
        rem = (-n) % (BLOCK_ROWS * 128)
        n_pad = n + rem
        padf = lambda a: (jnp.concatenate([a, jnp.zeros((rem,), a.dtype)])
                          if rem else a)
        t2 = lambda a: padf(a).reshape(n_pad // 128, 128)
        er = _external_candidate(scene, accel, rays, alive, B.TMIN,
                                 interpret, plan)
        ext = jnp.stack([t2(r) for r in er])
        fstate = jnp.stack([t2(a) for a in (
            rays.ro.x, rays.ro.y, rays.ro.z,
            rays.rd.x, rays.rd.y, rays.rd.z, rays.time,
            beta.x, beta.y, beta.z,
            radiance.x, radiance.y, radiance.z,
            jnp.where(depth_ok, 1.0, 0.0),
            jnp.where(alive, 1.0, 0.0))])
        istate = t2(rays.inside)
        kb = t2(keys_b)
        f_out, i_out, img_out = _shade_call(
            meta, tables, fstate, istate, kb, ext, image=image,
            interpret=interpret)
        if image:
            pend, comps = _texel_rgb(scene, img_out[0])
            for r, comp in zip(range(SO_BETA, SO_BETA + 3), comps):
                f_out = f_out.at[r].set(
                    jnp.where(pend, f_out[r] * comp, f_out[r]))
        out = lambda r: f_out[r].reshape(-1)[:n]
        p = V3(out(SO_P), out(SO_P + 1), out(SO_P + 2))
        new_rd = V3(out(SO_RD), out(SO_RD + 1), out(SO_RD + 2))
        beta2 = V3(out(SO_BETA), out(SO_BETA + 1), out(SO_BETA + 2))
        rad2 = V3(out(SO_RAD), out(SO_RAD + 1), out(SO_RAD + 2))
        cont = out(SO_CONT) > 0.0
        new_inside = i_out.reshape(-1)[:n]
        return p, new_rd, new_inside, cont, beta2, rad2

    return shader


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def _texel_rgb(scene, idxf):
    """(pend mask, (r, g, b)) from the kernel's flat texel index rows.

    The kernel already did the uv trig + NN clamp/flip quantization
    in-kernel (bounce_physics, texture.cpp:207-225); what's left is ONE
    u32 gather and the 0x00RRGGBB unpack."""
    pend = idxf >= 0.0
    idx = jnp.where(pend, idxf, 0.0).astype(jnp.int32)
    texel = scene.images.reshape(-1)[idx]
    inv255 = jnp.float32(1.0 / 255.0)
    return pend, (
        ((texel >> 16) & 0xFF).astype(jnp.float32) * inv255,
        ((texel >> 8) & 0xFF).astype(jnp.float32) * inv255,
        (texel & 0xFF).astype(jnp.float32) * inv255,
    )


def _apply_image_albedo(scene, fstate, img_out):
    """beta *= image texel for lanes with a pending image hit."""
    pend, comps = _texel_rgb(scene, img_out[0])
    for r, comp in zip(range(B.R_BETA, B.R_BETA + 3), comps):
        fstate = fstate.at[r].set(
            jnp.where(pend, fstate[r] * comp, fstate[r]))
    return fstate


def render_wavefront_hybrid_pixels(scene, pix, sample_lo, n_samples, max_lum,
                                   *, width, height, max_bounces, spp_sq,
                                   interpret=False, accel=None, plan=None):
    """Hybrid-step equivalent of integrator.render_wavefront_pixels.

    Same estimator; returns (accum V3, count, rays_traced)."""
    from miniraytracer_tpu.models import camera as cam_mod
    from miniraytracer_tpu.ops import rng as rng_mod

    meta_d, tables = pack_scene_hybrid(scene, plan)
    meta = tuple(sorted(meta_d.items()))
    image = meta_d["image"]
    if accel is None:
        accel = hybrid_accel(scene, interpret)

    n = pix.shape[0]
    rem = (-n) % (BLOCK_ROWS * 128)
    n_pad = n + rem
    pix_p = jnp.concatenate([pix.astype(jnp.uint32),
                             jnp.zeros((rem,), jnp.uint32)]) if rem else (
        pix.astype(jnp.uint32))

    sample0 = jnp.full((n_pad,), 0, jnp.int32) + sample_lo
    keys0 = rng_mod.ray_key(pix_p, sample0.astype(jnp.uint32))
    x = (pix_p % width).astype(jnp.float32)
    y = (pix_p // width).astype(jnp.float32)
    ci = jnp.clip(sample0, 0, spp_sq * spp_sq - 1)
    off_x = ((ci // spp_sq).astype(jnp.float32) + 0.5) / spp_sq
    off_y = ((ci % spp_sq).astype(jnp.float32) + 0.5) / spp_sq
    rays0 = cam_mod.get_rays(scene.camera, (x + off_x) / width,
                             (y + off_y) / height, keys0)

    r128 = n_pad // 128
    t2 = lambda a: a.reshape(r128, 128)
    flat = lambda a: a.reshape(-1)[:n_pad]
    zero = jnp.zeros((n_pad,), jnp.float32)
    one = jnp.ones((n_pad,), jnp.float32)
    alive0 = jnp.where(
        (jnp.arange(n_pad) < n) & (jnp.asarray(n_samples) > 0), 1.0, 0.0)
    fstate = jnp.stack([t2(a) for a in (
        zero, zero, zero,
        rays0.ro.x, rays0.ro.y, rays0.ro.z,
        rays0.rd.x, rays0.rd.y, rays0.rd.z,
        rays0.time, one, one, one, zero, zero, zero, alive0)])
    izero = jnp.zeros((n_pad,), jnp.int32)
    istate = jnp.stack([t2(a) for a in (izero, rays0.inside, izero)])
    keys = t2(keys0)
    rays_ct = jnp.zeros((r128, 128), jnp.float32)
    pix2 = t2(pix_p)
    misc = jnp.stack([jnp.asarray(max_lum, jnp.float32),
                      jnp.asarray(sample_lo, jnp.int32).astype(jnp.float32),
                      jnp.asarray(n_samples, jnp.int32).astype(jnp.float32)])

    def body(carry):
        fstate, istate, keys, rays_ct = carry
        rays = ix.Rays(
            ro=V3(flat(fstate[B.R_RO]), flat(fstate[B.R_RO + 1]),
                  flat(fstate[B.R_RO + 2])),
            rd=V3(flat(fstate[B.R_RD]), flat(fstate[B.R_RD + 1]),
                  flat(fstate[B.R_RD + 2])),
            time=flat(fstate[B.R_TIME]),
            inside=flat(istate[B.I_INSIDE]),
        )
        alive = flat(fstate[B.R_ALIVE]) > 0.0
        er = _external_candidate(scene, accel, rays, alive, B.TMIN,
                                 interpret, plan)
        ext = jnp.stack([t2(r) for r in er])
        fstate, istate, keys, rays_ct, img_out = _step_call(
            meta, tuple(tables), fstate, istate, keys, rays_ct, pix2, ext,
            misc, width=width, height=height, sq=spp_sq,
            max_bounces=max_bounces, image=image, interpret=interpret)
        if image:
            fstate = _apply_image_albedo(scene, fstate, img_out)
        return fstate, istate, keys, rays_ct

    def cond(carry):
        return jnp.any(carry[0][B.R_ALIVE] > 0.0)

    fstate, istate, keys, rays_ct = jax.lax.while_loop(
        cond, body, (fstate, istate, keys, rays_ct))

    out = lambda a: a.reshape(-1)[:n]
    accum = V3(out(fstate[B.R_ACC]), out(fstate[B.R_ACC + 1]),
               out(fstate[B.R_ACC + 2]))
    count = out(istate[B.I_COUNT])
    return accum, count, jnp.sum(rays_ct)


@partial(jax.jit, static_argnames=(
    "width", "height", "ns", "sq", "max_bounces", "interpret", "plan"))
def _hybrid_frame_jit(scene, max_lum, *, width, height, ns, sq, max_bounces,
                      interpret, plan=None):
    pix = jnp.arange(width * height, dtype=jnp.uint32)
    accum, count, rays = render_wavefront_hybrid_pixels(
        scene, pix, jnp.int32(0), jnp.int32(ns), max_lum,
        width=width, height=height, max_bounces=max_bounces, spp_sq=sq,
        interpret=interpret, plan=plan,
    )
    inv = 1.0 / jnp.maximum(count.astype(jnp.float32), 1.0)
    return (accum * inv).arr, rays


def render_wavefront_hybrid(scene, width, height, spp, max_bounces=32,
                            max_lum=1000.0, interpret=False):
    """Full-frame hybrid-step render. Returns (frame, stats)."""
    import time as _time

    sq = int(np.sqrt(spp))
    ns = sq * sq
    t0 = _time.perf_counter()
    plan = smem_plan(scene) if ext_mat_mode(scene) else None
    frame, rays = _hybrid_frame_jit(
        scene, jnp.float32(max_lum), width=width, height=height, ns=ns, sq=sq,
        max_bounces=max_bounces, interpret=interpret, plan=plan)
    frame.block_until_ready()
    elapsed = _time.perf_counter() - t0
    total = float(rays)
    return frame.reshape(height, width, 3), {
        "seconds": elapsed,
        "rays": total,
        "mrays_per_s": total / elapsed / 1e6 if elapsed > 0 else 0.0,
        "spp": ns,
        "renderer": "hybrid",
    }
