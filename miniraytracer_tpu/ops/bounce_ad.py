"""Differentiable fused bounce: custom-VJP Pallas kernels for the AD path.

The packed regeneration-in-scan renderer (integrator.sample_radiance_packed)
is the train step's forward: a `lax.scan` whose body is ~40 small HBM-bound
XLA fusions per bounce, plus the reverse sweep XLA derives from it. This
module replaces the scan BODY with a fused kernel pair:

- forward: ONE Pallas kernel per scan step — the whole bounce (inline
  scene_hit + shade via bounce.bounce_physics, the SAME code the fused
  render kernel runs) + completion merge + lane regeneration, lane state in
  (8, 128) vreg tiles.
- backward: ONE Pallas kernel per scan step that REPLAYS the step math from
  the saved input state (counter-based RNG makes the replay exact) under
  `jax.vjp`, producing (a) cotangents for the carried lane state and (b)
  per-block cotangents for the differentiable scene-table entries
  (TrainParams: tex colors, mat_param, sphere centers/radii, triangle base
  vertices), each a tile reduction written to SMEM. The generated pullback
  is the exact transpose of the forward body — the hand-derived-backward
  requirement is met by construction, fused, with no 40-fusion round trips.

Layout change vs sample_radiance_packed: one lane = one PIXEL tracing `spp`
samples sequentially (slots = samples, not arbitrary items), so the per-lane
output collapses to (finite-radiance sum, valid count) — exactly what the
SSE loss consumes — instead of (L, pack) per-item slots. Estimator equality:
same counter-keyed RNG per (pixel, sample), same claim-limit gating, same
per-sample radiance; the loss's `done & isfinite` mask is applied per lane
at completion (all-channel finiteness, the render path's NaN rule) rather
than per channel. Gradient support is the TrainParams set; cotangents for
time/alive/int lanes are structurally zero on the paths that reach them
(camera and RNG are non-differentiable) and are dropped.

Reference: trace() body main.cpp:66-118; dynamic queue keep-lanes-busy
semantics work_queue.cpp:158-175.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.ops import bounce as B
from miniraytracer_tpu.ops.vecmath import V3
from miniraytracer_tpu.scene import types as T

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

BLOCK_ROWS = 8

# float state rows
A_SUM, A_RO, A_RD, A_TIME, A_BETA, A_RAD, A_ALIVE, A_NV, A_RAYS = (
    0, 3, 6, 9, 10, 13, 16, 17, 18)
NF = 19
# int state rows
J_COUNT, J_INSIDE, J_DEPTH = 0, 1, 2
NJ = 3
# residual float rows: fstate[A_RO : A_ALIVE+1] (ro rd time beta rad alive)
RES_LO, RES_HI = A_RO, A_ALIVE + 1


def table_lengths(meta):
    S, R, Tc, V = meta["S"], meta["R"], meta["Tc"], meta["V"]
    Bx = meta["Bx"]
    M, X = meta["M"], meta["X"]
    return dict(
        sph=12 * S if S else 1,
        rect=17 * R if R else 1,
        tri=20 * Tc if Tc else 1,
        box=13 * Bx if Bx else 1,
        vol=16 * V if V else 1,
        mat=3 * M,
        tex=9 * X,  # + tex_img row (bounce.pack_scene)
        cam=21,
    )


def diff_indices(meta):
    """Static per-table entry indices that receive cotangents — exactly the
    TrainParams set (parallel/train.py): sph_c0, sph_radius, tri_m,
    mat_param, tex_c0, tex_c1."""
    S, Tc, M, X = meta["S"], meta["Tc"], meta["M"], meta["X"]
    return dict(
        sph=list(range(0, 3 * S)) + list(range(9 * S, 10 * S)),
        tri=list(range(0, 3 * Tc)),
        mat=list(range(M, 2 * M)),
        tex=list(range(X, 7 * X)),
    )


# ---------------------------------------------------------------------------
# Step math (shared by forward kernel and the vjp replay in backward)
# ---------------------------------------------------------------------------


def _pixel_step_math(meta, width, height, sq_off, max_bounces, spp,
                     claim_limit, tabs, camv, ptab, pix, sampbase,
                     t_step, f, i, keys, ext=None):
    """One scan step on lane tiles: bounce + completion merge + regen.

    `f` is a tuple of NF float rows, `i` of NJ int rows, `keys` u32.
    `ext` (hybrid-ext mode): the EXTERNAL surface candidate for this step
    from the differentiable culled flash kernels, as (t, nx, ny, nz,
    mat_f) lane tiles — bounce_physics seeds its running winner with it
    exactly as the forward hybrid step does (ops/hybrid.py step 3).
    Returns (f', i', keys'). All scene-table args indexable by static ints.
    """
    n_off = sq_off * sq_off
    summ = V3(f[A_SUM], f[A_SUM + 1], f[A_SUM + 2])
    ro = V3(f[A_RO], f[A_RO + 1], f[A_RO + 2])
    rd = V3(f[A_RD], f[A_RD + 1], f[A_RD + 2])
    time = f[A_TIME]
    beta = V3(f[A_BETA], f[A_BETA + 1], f[A_BETA + 2])
    radiance = V3(f[A_RAD], f[A_RAD + 1], f[A_RAD + 2])
    alive = f[A_ALIVE] > 0.0
    nvalid = f[A_NV]
    rays_ct = f[A_RAYS] + jnp.where(alive, 1.0, 0.0)
    count = i[J_COUNT]
    inside = i[J_INSIDE]
    depth = i[J_DEPTH]

    keys_b = B._fold(keys, depth)
    depth_ok = depth < max_bounces

    b = B.bounce_physics(meta, tabs, ptab, ro, rd, time, inside, keys_b,
                         ext=ext)
    scattered = depth_ok & ~b.is_light
    add_emitted = ~(scattered & b.is_specular)
    safe_t = b.safe_t
    zero3 = V3(0.0 * safe_t, 0.0 * safe_t, 0.0 * safe_t)
    ones3 = V3(jnp.ones_like(safe_t), jnp.ones_like(safe_t),
               jnp.ones_like(safe_t))

    miss = alive & ~b.hit
    bg = B.background_color(meta, rd, safe_t)
    radiance = radiance + B._vwhere(miss, beta * bg, zero3)
    emit_mask = alive & b.hit & add_emitted
    radiance = radiance + B._vwhere(emit_mask, beta * b.emitted, zero3)
    cont = alive & b.hit & scattered
    beta = B._vwhere(cont, beta * b.weight, beta)
    cont = cont & ((beta.x > 0.0) | (beta.y > 0.0) | (beta.z > 0.0))

    # completion: fold the finished sample into (sum, nvalid) with the
    # all-channel finite mask (the loss's done & isfinite, render NaN rule)
    finished = alive & ~cont
    finite = (jnp.isfinite(radiance.x) & jnp.isfinite(radiance.y)
              & jnp.isfinite(radiance.z))
    take = finished & finite
    summ = summ + B._vwhere(take, radiance, zero3)
    nvalid = nvalid + jnp.where(take, 1.0, 0.0)
    count = jnp.where(finished, count + 1, count)

    # regeneration: claim the lane's next sample while the claim window is
    # open (started items always finish within the scan)
    regen = finished & (count < spp) & (t_step < claim_limit)
    samp = sampbase + count
    new_keys = B._ray_key(pix, samp.astype(jnp.uint32))
    ci = samp % n_off
    off_x = ((ci // sq_off).astype(jnp.float32) + 0.5) / sq_off
    off_y = ((ci % sq_off).astype(jnp.float32) + 0.5) / sq_off
    xpix = (pix % width).astype(jnp.int32).astype(jnp.float32)
    ypix = (pix // width).astype(jnp.int32).astype(jnp.float32)
    ss = (xpix + off_x) / width
    tt = (ypix + off_y) / height
    new_ro, new_rd, new_time = B.camera_ray(camv, ss, tt, new_keys, safe_t)

    out_ro = B._vwhere(regen, new_ro, B._vwhere(cont, b.p, ro))
    out_rd = B._vwhere(regen, new_rd, B._vwhere(cont, b.new_rd, rd))
    out_time = jnp.where(regen, new_time, time)
    out_inside = jnp.where(regen, 0, jnp.where(cont, b.new_inside, inside))
    out_beta = B._vwhere(regen, ones3, beta)
    out_rad = B._vwhere(regen, zero3, radiance)
    out_depth = jnp.where(regen, 0, depth + 1)
    out_alive = (cont | regen).astype(jnp.float32)
    out_keys = jnp.where(regen, new_keys, keys)

    f_out = (summ.x, summ.y, summ.z,
             out_ro.x, out_ro.y, out_ro.z,
             out_rd.x, out_rd.y, out_rd.z,
             out_time,
             out_beta.x, out_beta.y, out_beta.z,
             out_rad.x, out_rad.y, out_rad.z,
             out_alive, nvalid, rays_ct)
    i_out = (count, out_inside, out_depth)
    if meta["image"]:
        # pending image-albedo row (hybrid deferral): the kernel shades
        # image lanes with albedo 1 and reports the flat texel index
        # (bounce_physics does the uv trig + NN quantization in-kernel);
        # the caller gathers the texel and multiplies it into the lane's
        # beta between steps. Only CONTINUING lanes carry a pending index
        # (a finished lane's beta is never used — trace()'s depth-cap
        # branch returns emitted only; regen lanes are a subset of
        # finished ones).
        none = jnp.full_like(safe_t, -1.0)
        img_out = (jnp.where(cont, b.img_id, none),)
        return f_out, i_out, out_keys, img_out
    return f_out, i_out, out_keys, None


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


NE = 5  # ext rows: t, nx, ny, nz, mat_f
# + (mtype, mparam, albedo rgb, deferred texel index) in ext-material mode;
# the index row's cotangent is structurally zero (its only consumer is the
# integer texel gather), so the bwd kernel's d_ext row for it is 0
H_NE_MAT = 11


def _make_fwd_kernel(meta, width, height, sq_off, max_bounces, spp,
                     claim_limit, use_ext=False, k_sub=1):
    """`k_sub` > 1 runs that many bounce sub-steps per kernel call
    (non-ext, imageless scenes only): the per-call fixed cost — the
    ~1000-op SMEM scalar-load+broadcast chains of the unrolled primitive
    tables, which CSE across sub-steps but re-execute per call — then
    amortizes over k_sub bounces, and the per-step residual round trip to
    HBM shrinks by the same factor. The global step index is
    t_step * k_sub + j, so claim gating is unchanged in global units."""
    has_img = meta["image"]
    ne = H_NE_MAT if meta.get("ext_mat") else NE
    assert k_sub == 1 or (not use_ext and not has_img)

    def kernel(*refs):
        refs = list(refs)
        imgo_ref = refs.pop() if has_img else None
        if use_ext:
            (sph_ref, rect_ref, tri_ref, box_ref, vol_ref, mat_ref,
             tex_ref, cam_ref, ptab_ref, misc_ref, f_ref, i_ref, k_ref,
             pix_ref, sb_ref, ext_ref, fo_ref, io_ref, ko_ref) = refs
            ext = tuple(ext_ref[r] for r in range(ne))
        else:
            (sph_ref, rect_ref, tri_ref, box_ref, vol_ref, mat_ref,
             tex_ref, cam_ref, ptab_ref, misc_ref, f_ref, i_ref, k_ref,
             pix_ref, sb_ref, fo_ref, io_ref, ko_ref) = refs
            ext = None
        tabs = (sph_ref, rect_ref, tri_ref, box_ref, vol_ref, mat_ref,
                tex_ref)
        t_step = misc_ref[0].astype(jnp.int32)
        pix = jax.lax.bitcast_convert_type(pix_ref[:], jnp.uint32)
        sampbase = jax.lax.bitcast_convert_type(sb_ref[:], jnp.int32)
        f = tuple(f_ref[r] for r in range(NF))
        i = tuple(
            jax.lax.bitcast_convert_type(i_ref[r], jnp.int32)
            for r in range(NJ))
        keys = jax.lax.bitcast_convert_type(k_ref[:], jnp.uint32)
        f_out, i_out, k_out, img_out = f, i, keys, None
        for j in range(k_sub):
            f_out, i_out, k_out, img_out = _pixel_step_math(
                meta, width, height, sq_off, max_bounces, spp, claim_limit,
                tabs, cam_ref, ptab_ref, pix, sampbase,
                t_step * k_sub + j, f_out, i_out, k_out, ext=ext)
        fo_ref[:] = jnp.stack(f_out)
        io_ref[:] = jnp.stack([
            jax.lax.bitcast_convert_type(r, jnp.float32) for r in i_out])
        ko_ref[:] = jax.lax.bitcast_convert_type(k_out, jnp.float32)
        if has_img:
            imgo_ref[:] = jnp.stack(img_out)

    return kernel


# ---------------------------------------------------------------------------
# Backward kernel: replay under jax.vjp
# ---------------------------------------------------------------------------


def _make_bwd_kernel(meta, width, height, sq_off, max_bounces, spp,
                     claim_limit, lens, didx, n_diff, use_ext=False,
                     k_sub=1):
    perlin = meta["perlin"]
    ne = H_NE_MAT if meta.get("ext_mat") else NE
    assert k_sub == 1 or (not use_ext and not meta["image"])

    def kernel(*refs):
        if use_ext:
            (sph_ref, rect_ref, tri_ref, box_ref, vol_ref, mat_ref,
             tex_ref, cam_ref, ptab_ref, misc_ref, fr_ref, i_ref, k_ref,
             pix_ref, sb_ref, ext_ref, cf_ref,
             dci_f_ref, dext_ref, dtab_ref) = refs
            ext_in = tuple(ext_ref[r] for r in range(ne))
        else:
            (sph_ref, rect_ref, tri_ref, box_ref, vol_ref, mat_ref,
             tex_ref, cam_ref, ptab_ref, misc_ref, fr_ref, i_ref, k_ref,
             pix_ref, sb_ref, cf_ref, dci_f_ref, dtab_ref) = refs
            ext_in = None
        t_step = misc_ref[0].astype(jnp.int32)
        pix = jax.lax.bitcast_convert_type(pix_ref[:], jnp.uint32)
        sampbase = jax.lax.bitcast_convert_type(sb_ref[:], jnp.int32)
        i = tuple(
            jax.lax.bitcast_convert_type(i_ref[r], jnp.int32)
            for r in range(NJ))
        keys = jax.lax.bitcast_convert_type(k_ref[:], jnp.uint32)
        # saved residual rows -> full fstate (sum/nvalid/rays enter linearly;
        # zeros leave the pullback unchanged)
        zero = jnp.zeros_like(fr_ref[0])
        res = tuple(fr_ref[r] for r in range(RES_HI - RES_LO))
        f_in = (zero, zero, zero) + res + (zero, zero)

        # read every scene scalar; Perlin tiles as values (constants under
        # vjp — integer-indexed gathers contribute no operand cotangent)
        sph_l = [sph_ref[n] for n in range(lens["sph"])]
        rect_l = [rect_ref[n] for n in range(lens["rect"])]
        tri_l = [tri_ref[n] for n in range(lens["tri"])]
        box_l = [box_ref[n] for n in range(lens["box"])]
        vol_l = [vol_ref[n] for n in range(lens["vol"])]
        mat_l = [mat_ref[n] for n in range(lens["mat"])]
        tex_l = [tex_ref[n] for n in range(lens["tex"])]
        cam_l = [cam_ref[n] for n in range(lens["cam"])]
        ptab_v = ptab_ref[:] if perlin else ptab_ref

        diff_vals = tuple(
            [sph_l[n] for n in didx["sph"]] + [tri_l[n] for n in didx["tri"]]
            + [mat_l[n] for n in didx["mat"]] + [tex_l[n] for n in didx["tex"]]
        )
        n_s, n_t = len(didx["sph"]), len(didx["tri"])
        n_m = len(didx["mat"])

        def fdiff(dv, f, ext):
            sph2 = list(sph_l)
            tri2 = list(tri_l)
            mat2 = list(mat_l)
            tex2 = list(tex_l)
            o = 0
            for j, n in enumerate(didx["sph"]):
                sph2[n] = dv[o + j]
            o += n_s
            for j, n in enumerate(didx["tri"]):
                tri2[n] = dv[o + j]
            o += n_t
            for j, n in enumerate(didx["mat"]):
                mat2[n] = dv[o + j]
            o += n_m
            for j, n in enumerate(didx["tex"]):
                tex2[n] = dv[o + j]
            tabs = (sph2, rect_l, tri2, box_l, vol_l, mat2, tex2)
            # replay the k_sub sub-steps from the saved BLOCK-entry state;
            # the int rows / keys of later sub-steps are integer-valued
            # functions of it (no cotangents flow through them)
            f_out, i_out, k_out = f, i, keys
            for j in range(k_sub):
                f_out, i_out, k_out, _img = _pixel_step_math(
                    meta, width, height, sq_off, max_bounces, spp,
                    claim_limit, tabs, cam_l, ptab_v, pix, sampbase,
                    t_step * k_sub + j, f_out, i_out, k_out, ext=ext)
            # _img carries a structurally-zero cotangent (its only
            # consumer is the integer texel gather) — excluded from the
            # pullback
            return f_out

        cot_f = tuple(cf_ref[r] for r in range(NF))
        if use_ext:
            _, pull = jax.vjp(fdiff, diff_vals, f_in, ext_in)
            d_dv, d_f, d_ext = pull(cot_f)
            dext_ref[:] = jnp.stack(d_ext)
        else:
            _, pull = jax.vjp(lambda dv, f: fdiff(dv, f, None),
                              diff_vals, f_in)
            d_dv, d_f = pull(cot_f)

        dci_f_ref[:] = jnp.stack(d_f)
        # Accumulate the per-block table cotangents into ONE (1, n_diff) SMEM
        # block shared across the (sequential) TPU grid. A per-block output of
        # shape (nblocks, n_diff) with block (1, n_diff) is NOT Mosaic-lowerable
        # (sublane block dim must be divisible by 8 or equal the array dim —
        # this crashed the round-2 bench on the real chip); a grid-resident
        # accumulator block equal to the whole array is.
        first = pl.program_id(0) == 0
        for j in range(n_diff):
            prev = jnp.where(first, 0.0, dtab_ref[0, j])
            dtab_ref[0, j] = prev + d_dv[j]

    return kernel


# ---------------------------------------------------------------------------
# custom_vjp step (cached per configuration)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=32)
def _get_step(meta, width, height, sq_off, max_bounces, spp, claim_limit,
              interpret, use_ext=False, k_sub=1):
    """Returns step(tables..., fstate, istate_f, keys_f, pix_f, sb_f, t_f
    [, ext]) -> (fstate', istate_f', keys_f') with a fused custom VJP.

    Integer lane rows ride bitcast to f32 so every custom_vjp leaf is float
    (their cotangents are structural zeros). With `use_ext` the step takes
    an (NE, r128, 128) external-candidate stack as an extra DIFFERENTIABLE
    input (hybrid-ext mode: big primitive sets intersected by the culled
    custom-VJP flash kernels outside the kernel; its cotangent d_ext flows
    back to them through the XLA chain between scan steps)."""
    meta_d = dict(meta)
    lens = table_lengths(meta_d)
    didx = diff_indices(meta_d)
    n_diff = sum(len(v) for v in didx.values())
    fwd_kernel = _make_fwd_kernel(meta_d, width, height, sq_off, max_bounces,
                                  spp, claim_limit, use_ext, k_sub)
    bwd_kernel = _make_bwd_kernel(meta_d, width, height, sq_off, max_bounces,
                                  spp, claim_limit, lens, didx, n_diff,
                                  use_ext, k_sub)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    ptab_spec = pl.BlockSpec((96, 128), lambda b: (0, 0),
                             memory_space=pltpu.VMEM)
    spec3 = lambda rows: pl.BlockSpec((rows, BLOCK_ROWS, 128),
                                      lambda b: (0, b, 0),
                                      memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((BLOCK_ROWS, 128), lambda b: (b, 0),
                         memory_space=pltpu.VMEM)

    has_img = meta_d["image"]
    n_ext = H_NE_MAT if meta_d.get("ext_mat") else NE

    def run_fwd(tables, fstate, istate_f, keys_f, pix_f, sb_f, t_f,
                ext=None):
        r128 = fstate.shape[1]
        misc = jnp.stack([t_f])
        ext_in = [ext] if use_ext else []
        ext_spec = [spec3(n_ext)] if use_ext else []
        img_outspec = [spec3(1)] if has_img else []
        img_outshape = ([jax.ShapeDtypeStruct((1, r128, 128), jnp.float32)]
                        if has_img else [])
        outs = pl.pallas_call(
            fwd_kernel,
            grid=(r128 // BLOCK_ROWS,),
            in_specs=([smem] * 8 + [ptab_spec, smem]
                      + [spec3(NF), spec3(NJ), spec2, spec2, spec2]
                      + ext_spec),
            out_specs=[spec3(NF), spec3(NJ), spec2] + img_outspec,
            out_shape=[
                jax.ShapeDtypeStruct((NF, r128, 128), jnp.float32),
                jax.ShapeDtypeStruct((NJ, r128, 128), jnp.float32),
                jax.ShapeDtypeStruct((r128, 128), jnp.float32),
            ] + img_outshape,
            interpret=interpret,
        )(*tables, misc, fstate, istate_f, keys_f, pix_f, sb_f, *ext_in)
        return tuple(outs)

    def run_bwd(tables, f_res, istate_f, keys_f, pix_f, sb_f, t_f, cot_f,
                ext=None):
        r128 = f_res.shape[1]
        nblocks = r128 // BLOCK_ROWS
        misc = jnp.stack([t_f])
        dtab_spec = pl.BlockSpec((1, n_diff), lambda b: (0, 0),
                                 memory_space=pltpu.SMEM)
        ext_in = [ext] if use_ext else []
        ext_spec = [spec3(n_ext)] if use_ext else []
        dext_outspec = [spec3(n_ext)] if use_ext else []
        dext_outshape = ([jax.ShapeDtypeStruct((n_ext, r128, 128),
                                               jnp.float32)]
                         if use_ext else [])
        outs = pl.pallas_call(
            bwd_kernel,
            grid=(nblocks,),
            in_specs=([smem] * 8 + [ptab_spec, smem]
                      + [spec3(RES_HI - RES_LO), spec3(NJ), spec2, spec2,
                         spec2] + ext_spec + [spec3(NF)]),
            out_specs=[spec3(NF)] + dext_outspec + [dtab_spec],
            out_shape=[
                jax.ShapeDtypeStruct((NF, r128, 128), jnp.float32),
            ] + dext_outshape + [
                jax.ShapeDtypeStruct((1, n_diff), jnp.float32),
            ],
            interpret=interpret,
        )(*tables, misc, f_res, istate_f, keys_f, pix_f, sb_f, *ext_in,
          cot_f)
        if use_ext:
            d_f, d_ext, d_tab = outs
            return d_f, d_ext, d_tab[0]
        d_f, d_tab = outs
        return d_f, None, d_tab[0]

    if use_ext:
        @jax.custom_vjp
        def step(sph, rect, tri, box, vol, mat, tex, camv, ptab,
                 fstate, istate_f, keys_f, pix_f, sb_f, t_f, ext):
            tables = (sph, rect, tri, box, vol, mat, tex, camv, ptab)
            return run_fwd(tables, fstate, istate_f, keys_f, pix_f, sb_f,
                           t_f, ext)

        def step_fwd(sph, rect, tri, box, vol, mat, tex, camv, ptab,
                     fstate, istate_f, keys_f, pix_f, sb_f, t_f, ext):
            tables = (sph, rect, tri, box, vol, mat, tex, camv, ptab)
            out = run_fwd(tables, fstate, istate_f, keys_f, pix_f, sb_f,
                          t_f, ext)
            res = (tables, fstate[RES_LO:RES_HI], istate_f, keys_f, pix_f,
                   sb_f, t_f, ext)
            return out, res
    else:
        @jax.custom_vjp
        def step(sph, rect, tri, box, vol, mat, tex, camv, ptab,
                 fstate, istate_f, keys_f, pix_f, sb_f, t_f):
            tables = (sph, rect, tri, box, vol, mat, tex, camv, ptab)
            return run_fwd(tables, fstate, istate_f, keys_f, pix_f, sb_f,
                           t_f)

        def step_fwd(sph, rect, tri, box, vol, mat, tex, camv, ptab,
                     fstate, istate_f, keys_f, pix_f, sb_f, t_f):
            tables = (sph, rect, tri, box, vol, mat, tex, camv, ptab)
            out = run_fwd(tables, fstate, istate_f, keys_f, pix_f, sb_f, t_f)
            res = (tables, fstate[RES_LO:RES_HI], istate_f, keys_f, pix_f,
                   sb_f, t_f)
            return out, res

    def step_bwd(res, cots):
        if use_ext:
            (tables, f_res, istate_f, keys_f, pix_f, sb_f, t_f, ext) = res
        else:
            tables, f_res, istate_f, keys_f, pix_f, sb_f, t_f = res
            ext = None
        # the img output's cotangent (when present) is structurally zero:
        # its only consumers are the integer texel selection and the
        # (nearest-neighbor, piecewise-constant) uv quantization
        cot_f, _cot_i, _cot_k = cots[:3]
        d_f, d_ext, d_flat = run_bwd(tables, f_res, istate_f, keys_f, pix_f,
                                     sb_f, t_f, cot_f, ext)
        # NOTE: no extra pass-through for the sum/nvalid/rays rows excluded
        # from the residual — the vjp replay feeds them as zeros, and since
        # they enter the step ADDITIVELY their pullback is the identity
        # regardless of value, so d_f already carries cot_f for those rows.
        # (Adding cot_f again doubled the sum-row cotangent per scan step:
        # caught by tests/test_bounce_ad.py grad-parity.)
        # scatter the flat diff cotangents back into zero tables
        o = 0
        zt = lambda a: jnp.zeros_like(a)
        sph, rect, tri, box, vol, mat, tex, camv, ptab = tables
        d_sph = zt(sph)
        if didx["sph"]:
            d_sph = d_sph.at[jnp.asarray(didx["sph"])].set(
                d_flat[o:o + len(didx["sph"])])
        o += len(didx["sph"])
        d_tri = zt(tri)
        if didx["tri"]:
            d_tri = d_tri.at[jnp.asarray(didx["tri"])].set(
                d_flat[o:o + len(didx["tri"])])
        o += len(didx["tri"])
        d_mat = zt(mat)
        if didx["mat"]:
            d_mat = d_mat.at[jnp.asarray(didx["mat"])].set(
                d_flat[o:o + len(didx["mat"])])
        o += len(didx["mat"])
        d_tex = zt(tex)
        if didx["tex"]:
            d_tex = d_tex.at[jnp.asarray(didx["tex"])].set(
                d_flat[o:o + len(didx["tex"])])
        grads = (d_sph, zt(rect), d_tri, zt(box), zt(vol), d_mat, d_tex,
                 zt(camv), zt(ptab), d_f, zt(istate_f), zt(keys_f),
                 zt(pix_f), zt(sb_f), jnp.zeros_like(t_f))
        if use_ext:
            grads = grads + (d_ext,)
        return grads

    step.defvjp(step_fwd, step_bwd)
    return step


# ---------------------------------------------------------------------------
# Public entry: differentiable per-pixel sample sums
# ---------------------------------------------------------------------------


def can_fuse_ad(scene: T.SceneData) -> bool:
    return B.can_fuse(scene)


def can_fuse_ad_ext(scene: T.SceneData, for_tpu: bool = True) -> bool:
    """Hybrid-ext AD eligibility: the step kernel handles the in-SMEM
    types, the big sphere/triangle sets come in through the differentiable
    culled flash kernels, and image texels are deferred to an XLA multiply
    between steps (hybrid.can_hybrid's sphere-image gate applies)."""
    from miniraytracer_tpu.ops import hybrid as H

    return not B.can_fuse(scene) and H.can_hybrid(scene, for_tpu)


def _ext_accel_d(scene: T.SceneData):
    """Differentiable flash state for the external types: same thresholds
    as hybrid.hybrid_accel, custom-VJP kernel variants. The cull tables are
    value-redundant with `coeffs` (their cotangent is structurally dropped
    by the kernels' VJPs), so all geometry gradient flows through the
    coeffs built here from the CURRENT (params-applied) scene."""
    from miniraytracer_tpu.ops import flash, hybrid as H
    from miniraytracer_tpu.ops import intersect as ix

    ext_sph, ext_tri, _ = H._ext_types(scene)
    accel = {}
    if ext_tri:
        m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
        u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
        v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
        coeffs = flash.tri_coefficients(m, u, v, scene.tri_active)
        if scene.n_tris < ix.FLASH_CULL_MIN_TRIS:
            accel["tri_d"] = coeffs
        else:
            accel["tri_cull_d"] = (
                flash.tri_cull_build(m, u, v, scene.tri_active, coeffs),
                coeffs)
    if ext_sph:
        coeffs_s = flash.sphere_coefficients(scene)
        if scene.n_spheres < ix.FLASH_GATE_MIN_SPHERES:
            accel["sph_d"] = coeffs_s
        else:
            accel["sph_cull_d"] = (
                flash.sph_cull_build(scene, coeffs_s), coeffs_s)
    return accel


def _external_candidate_d(scene, accel, rays, alive, tmin, plan=None):
    """Differentiable analog of hybrid._external_candidate: closest hit of
    the external types via the custom-VJP flash kernels + XLA record
    assembly. Returns 5 (N,) rows (t, nx, ny, nz, mat_f), t == INF when
    none; gradients flow to the scene geometry through the kernels'
    hand-derived backwards and the record assembly."""
    from miniraytracer_tpu.ops import flash, hybrid as H
    from miniraytracer_tpu.ops import intersect as ix
    from miniraytracer_tpu.ops.vecmath import vwhere

    n = rays.time.shape[0]
    NAN = H.NAN
    INFv = B.INF
    if not accel and not H._ext_types(scene)[2]:
        # no external types (earth-class: ext-AD solely for the image
        # deferral) — constant miss record, nothing to differentiate.
        # Width must match the step kernel's spec (NE_MAT in ext-material
        # mode), same as hybrid._external_candidate's early return.
        return H._const_miss_rows(n, H.ext_mat_mode(scene))
    nan3 = V3(jnp.where(alive, rays.ro.x, NAN),
              jnp.where(alive, rays.ro.y, NAN),
              jnp.where(alive, rays.ro.z, NAN))
    nand = V3(jnp.where(alive, rays.rd.x, NAN),
              jnp.where(alive, rays.rd.y, NAN),
              jnp.where(alive, rays.rd.z, NAN))
    inf = jnp.full((n,), INFv)

    t_s, i_s = inf, jnp.zeros((n,), jnp.int32)
    if "sph_d" in accel:
        t_s, i_s = flash.flash_sphere_hit_d(
            accel["sph_d"], nan3, nand, rays.time, rays.inside, tmin)
    elif "sph_cull_d" in accel:
        cull_s, coeffs_s = accel["sph_cull_d"]
        t_s, i_s = flash.flash_sphere_hit_culled_d(
            cull_s, coeffs_s, nan3, nand, rays.time, rays.inside, tmin)

    t_t, i_t = inf, jnp.zeros((n,), jnp.int32)
    if "tri_d" in accel:
        t_t, i_t = flash.flash_tri_hit_d(
            accel["tri_d"], nan3, nand, rays.inside, tmin)
    elif "tri_cull_d" in accel:
        cull_t, coeffs_t = accel["tri_cull_d"]
        t_t, i_t = flash.flash_tri_hit_culled_d(
            cull_t, coeffs_t, nan3, nand, rays.inside, tmin)

    # big box sets: XLA slab sweep under a hand-derived VJP
    # (flash.box_hit_d). The previous jax.checkpoint'd autodiff sweep was
    # book2's measured train-step floor (0.79 Mrays/s fwd+bwd): XLA's
    # transpose re-materialized the (6 faces x boxes x lanes) candidate
    # grid per scan step. The custom backward re-derives only the winner
    # face per lane — O(lanes) — so residuals are (tables, rays, t, idx).
    _, _, ext_box = H._ext_types(scene)
    t_b = inf
    i_b = jnp.zeros((n,), jnp.int32)
    if ext_box:
        t_b, i_b = flash.box_hit_d(
            scene.box_lo, scene.box_hi, scene.box_cs, scene.box_off,
            scene.box_active, rays.ro, rays.rd, tmin)
        t_b = jnp.where(alive & jnp.isfinite(t_b), t_b, INFv)

    t_s = jnp.where(jnp.isfinite(t_s) & alive, t_s, INFv)
    t_t = jnp.where(jnp.isfinite(t_t) & alive, t_t, INFv)

    has_sph = "sph_d" in accel or "sph_cull_d" in accel
    has_tri = "tri_d" in accel or "tri_cull_d" in accel

    # record assembly under jax.checkpoint: its one-hot lookup matrices are
    # O(lanes x prims) — saved per scan step as reverse-AD residuals they
    # OOM HBM at 500x500 (measured: 85 GB for triangles); recomputing them
    # in the backward from the (small) kernel outputs is nearly free
    def _assemble(scene, rox, roy, roz, rdx, rdy, rdz, time_, inside_,
                  t_s, t_t, t_b, i_s, i_t, i_b):
        rays2 = ix.Rays(ro=V3(rox, roy, roz), rd=V3(rdx, rdy, rdz),
                        time=time_, inside=inside_)
        ext_t = jnp.minimum(jnp.minimum(t_s, t_t), t_b)
        is_s = t_s <= jnp.minimum(t_t, t_b)
        is_t = ~is_s & (t_t <= t_b)
        is_b = ~is_s & ~is_t
        has = ext_t < INFv
        safe_t = jnp.where(has, ext_t, 1.0)
        one = jnp.ones_like(safe_t)
        zero = jnp.zeros_like(safe_t)
        nrm = V3(one, zero, zero)
        mat = jnp.zeros((n,), jnp.int32)
        uu = zero
        vv = zero
        if has_sph:
            idx_s = jnp.where(is_s & has, i_s, 0)
            _, n_sph, u_s, v_s, m_sph = ix.sphere_record(scene, rays2,
                                                         safe_t, idx_s)
            nrm = vwhere(is_s, n_sph, nrm)
            mat = jnp.where(is_s, m_sph, mat)
            uu = jnp.where(is_s, u_s, uu)
            vv = jnp.where(is_s, v_s, vv)
        if has_tri:
            idx_t = jnp.where(is_t & has, i_t, 0)
            _, n_tri, u_t, v_t, m_tri = ix.tri_record(scene, rays2, safe_t,
                                                      idx_t)
            nrm = vwhere(is_t, n_tri, nrm)
            mat = jnp.where(is_t, m_tri, mat)
            uu = jnp.where(is_t, u_t, uu)
            vv = jnp.where(is_t, v_t, vv)
        if ext_box:
            idx_b = jnp.where(is_b & has, i_b, 0)
            _, n_box, u_b, v_b, m_box = ix.box_record(scene, rays2, safe_t,
                                                      idx_b)
            nrm = vwhere(is_b, n_box, nrm)
            mat = jnp.where(is_b, m_box, mat)
            uu = jnp.where(is_b, u_b, uu)
            vv = jnp.where(is_b, v_b, vv)
        nx = jnp.where(has, nrm.x, one)
        ny = jnp.where(has, nrm.y, 0.0)
        nz = jnp.where(has, nrm.z, 0.0)
        ext_to = jnp.where(has, ext_t, INFv)
        if not H.ext_mat_mode(scene):
            mat_f = jnp.where(has, mat, 0).astype(jnp.float32)
            return ext_to, nx, ny, nz, mat_f
        # ext-material mode (hybrid._external_candidate): evaluate the
        # winner's material/texture here, DIFFERENTIABLY — mat_param /
        # tex_c0 / tex_c1 cotangents flow through the lookups and
        # sample_texture back to TrainParams. With the plan's ext_defer
        # flag, image texels are NOT fetched here: the flat NN index
        # (integer quantization — zero cotangent by construction) rides
        # the 11th row and the scan body gathers once per step outside
        # the checkpoint, so the 2.2 ms/250k-lane gather is neither
        # recomputed in the backward nor transposed.
        from miniraytracer_tpu.models.textures import (
            sample_texture, sample_texture_deferred)
        from miniraytracer_tpu.ops.lookup import lookup_cols

        defer = (bool(dict(plan)["ext_defer"]) if plan is not None
                 else False)
        mt, mp, mtex = lookup_cols(
            mat, (scene.mat_type, scene.mat_param, scene.mat_tex))
        p2 = rays2.ro + rays2.rd * safe_t
        mat_f = jnp.full((n,), -1.0, jnp.float32)
        if defer and scene.has_image:
            consume = ((mt == H.T.MAT_LAMBERTIAN) | (mt == H.T.MAT_METAL)
                       | (mt == H.T.MAT_ISOTROPIC))
            albedo, idxf = sample_texture_deferred(scene, mtex, uu, vv, p2,
                                                   consume)
        else:
            albedo = sample_texture(scene, mtex, uu, vv, p2)
            idxf = jnp.full((n,), -1.0, jnp.float32)
        return (ext_to, nx, ny, nz, mat_f, mt.astype(jnp.float32), mp,
                albedo.x, albedo.y, albedo.z, idxf)

    return jax.checkpoint(_assemble)(
        scene, rays.ro.x, rays.ro.y, rays.ro.z, rays.rd.x, rays.rd.y,
        rays.rd.z, rays.time, rays.inside, t_s, t_t, t_b, i_s, i_t, i_b)


def sample_pixel_sums_fused(scene, pix, samp_base, spp, *, width, height,
                            max_bounces, sq_off=8, scan_steps=0,
                            interpret=False, use_ext=False, pack_plan=None,
                            sub_steps=0):
    """Differentiable (finite-radiance sum, valid count) per pixel over `spp`
    consecutive samples starting at `samp_base`, via the fused step kernels.

    pix: (N,) u32 pixel ids; samp_base: () or (N,) i32 absolute sample index
    of each lane's first sample. Stratified offsets are the analytic
    sq_off^2 grid indexed by (sample % sq_off^2) — identical to indexing
    integrator.sample_offsets(sq_off^2) rows mod table size.

    `use_ext` (requires can_fuse_ad_ext): big sphere/triangle sets are
    intersected per scan step by the DIFFERENTIABLE culled flash kernels
    outside the step kernel and fed in as the external candidate — the
    hybrid-AD step. Estimator-identical to the packed scan (same physics,
    same RNG); gradients w.r.t. geometry flow through the kernels'
    hand-derived VJPs and the XLA record assembly.

    Returns (sum V3 (N,), nvalid (N,), rays_traced ()).
    """
    from miniraytracer_tpu.models import camera as cam_mod
    from miniraytracer_tpu.ops import rng as rng_mod

    if use_ext:
        from miniraytracer_tpu.ops import hybrid as H

        if (pack_plan is None and H.ext_mat_mode(scene)
                and not H._is_traced(scene.mat_type)):
            pack_plan = H.smem_plan(scene)
        meta_d, tables = H.pack_scene_hybrid(scene, pack_plan)
        ext_accel = _ext_accel_d(scene)
    else:
        meta_d, tables = B.pack_scene(scene)
    meta = tuple(sorted(meta_d.items()))
    if scan_steps <= 0:
        scan_steps = spp * 6 + max_bounces + 1
    claim_limit = scan_steps - (max_bounces + 1)
    assert claim_limit >= 0, (scan_steps, max_bounces)
    # sub_steps: bounce sub-steps per kernel call (see _make_fwd_kernel).
    # Only the non-ext imageless class qualifies (ext candidates and the
    # deferred-texel gather are per-bounce XLA work between calls), and
    # auto stays at 1 in interpret mode: the un-compiled in-kernel vjp of
    # k chained bounce bodies materializes every intermediate (measured
    # >29 GB host RSS at k=4 on the 12x12 CPU parity test).
    if sub_steps <= 0:
        sub_steps = 1 if (use_ext or meta_d["image"] or interpret) else 4
    k_sub = max(1, sub_steps) if not (use_ext or meta_d["image"]) else 1
    outer_steps = -(-scan_steps // k_sub)

    n = pix.shape[0]
    rem = (-n) % (BLOCK_ROWS * 128)
    n_pad = n + rem
    pix_p = jnp.concatenate([pix.astype(jnp.uint32),
                             jnp.zeros((rem,), jnp.uint32)]) if rem else (
        pix.astype(jnp.uint32))
    sb = jnp.broadcast_to(jnp.asarray(samp_base, jnp.int32).reshape(-1),
                          (n,)).astype(jnp.int32)
    sb_p = jnp.concatenate([sb, jnp.zeros((rem,), jnp.int32)]) if rem else sb

    # initial camera rays (sample slot 0) — plain XLA, non-differentiable
    n_off = sq_off * sq_off
    keys0 = rng_mod.ray_key(pix_p, sb_p.astype(jnp.uint32))
    ci = sb_p % n_off
    off_x = ((ci // sq_off).astype(jnp.float32) + 0.5) / sq_off
    off_y = ((ci % sq_off).astype(jnp.float32) + 0.5) / sq_off
    x = (pix_p % width).astype(jnp.float32)
    y = (pix_p // width).astype(jnp.float32)
    rays0 = cam_mod.get_rays(scene.camera, (x + off_x) / width,
                             (y + off_y) / height, keys0)

    r128 = n_pad // 128
    t2 = lambda a: a.reshape(r128, 128)
    zero = jnp.zeros((n_pad,), jnp.float32)
    one = jnp.ones((n_pad,), jnp.float32)
    alive0 = jnp.where((jnp.arange(n_pad) < n) & (spp > 0), 1.0, 0.0)
    fstate = jnp.stack([t2(a) for a in (
        zero, zero, zero,
        rays0.ro.x, rays0.ro.y, rays0.ro.z,
        rays0.rd.x, rays0.rd.y, rays0.rd.z,
        rays0.time, one, one, one, zero, zero, zero, alive0, zero, zero)])
    izero = jnp.zeros((n_pad,), jnp.int32)
    istate = jnp.stack([t2(a) for a in (izero, rays0.inside, izero)])

    bc = jax.lax.bitcast_convert_type
    istate_f = bc(istate, jnp.float32)
    keys_f = bc(t2(keys0), jnp.float32)
    pix_f = bc(t2(pix_p), jnp.float32)
    sb_f = bc(t2(sb_p), jnp.float32)

    step = _get_step(meta, width, height, sq_off, max_bounces, spp,
                     claim_limit, interpret, use_ext, k_sub)
    sph, rect, tri, box, vol, mat, tex, camv, ptab = tables

    if use_ext:
        flatp = lambda a: a.reshape(-1)

        def body(carry, t_f):
            f, i, k = carry
            ro = V3(flatp(f[A_RO]), flatp(f[A_RO + 1]), flatp(f[A_RO + 2]))
            rd = V3(flatp(f[A_RD]), flatp(f[A_RD + 1]), flatp(f[A_RD + 2]))
            time = flatp(f[A_TIME])
            inside = flatp(
                jax.lax.bitcast_convert_type(i[J_INSIDE], jnp.int32))
            alive = flatp(f[A_ALIVE]) > 0.0
            from miniraytracer_tpu.ops import intersect as ix

            er = _external_candidate_d(
                scene, ext_accel,
                ix.Rays(ro=ro, rd=rd, time=time, inside=inside),
                alive, B.TMIN, pack_plan)
            ext = jnp.stack([r.reshape(r128, 128) for r in er])
            out = step(sph, rect, tri, box, vol, mat, tex, camv, ptab,
                       f, i, k, pix_f, sb_f, t_f, ext)
            if meta_d["image"]:
                f, i, k, img = out
                # deferred texel: beta *= image albedo for pending lanes
                # (the kernel reports the flat texel index; one XLA gather.
                # The multiply is a plain XLA op between custom-VJP steps,
                # so JAX chains its beta cotangent automatically — the
                # texel itself is a non-TrainParams constant)
                pend, comps = H._texel_rgb(scene, img[0])
                for r, comp in zip(range(A_BETA, A_BETA + 3), comps):
                    f = f.at[r].set(
                        jnp.where(pend, f[r] * comp, f[r]))
            else:
                f, i, k = out
            return (f, i, k), None
    else:
        def body(carry, t_f):
            f, i, k = carry
            f, i, k = step(sph, rect, tri, box, vol, mat, tex, camv, ptab,
                           f, i, k, pix_f, sb_f, t_f)
            return (f, i, k), None

    (fstate, _, _), _ = jax.lax.scan(
        body, (fstate, istate_f, keys_f),
        jnp.arange(outer_steps, dtype=jnp.float32))

    flat = lambda a: a.reshape(-1)[:n]
    summ = V3(flat(fstate[A_SUM]), flat(fstate[A_SUM + 1]),
              flat(fstate[A_SUM + 2]))
    nvalid = flat(fstate[A_NV])
    rays = jnp.sum(fstate[A_RAYS])
    return summ, nvalid, rays
