"""Flash-intersect: MXU triangle intersection as a Pallas megakernel.

The brute-force triangle sweep (ops/intersect.tri_ts) is VPU-bound: ~60
elementwise flops per (ray, triangle) at ~0.5 TFLOP/s effective. The MXU
(128x128 systolic array) has ~2 orders of magnitude more FLOPs — and
Moller-Trumbore is *algebraically bilinear* in (ray origin, ray direction),
so the four per-pair quantities

    raw_det =  rd . (v x u)                     (u . pvec in triangle.cpp:246)
    raw_uu  = (ro - m) . (rd x v)               (tvec . pvec)
    raw_vv  =  rd . ((ro - m) x u)              (rd . qvec)
    raw_tn  = (ro - m) . (u x v)                (v . qvec)

are each an inner product  <per-triangle coefficients (16), ray features
(16)>  with the shared feature vector

    F(ray) = [1, ro, rd, ro (x) rd]   (1 + 3 + 3 + 9)

built from the scalar-triple-product expansions (derivation in
`_tri_coefficients`). The whole sweep becomes four (T,16)x(16,N) matmuls.

Flash structure (the flash-attention trick applied to intersection): the
(T, N) products never reach HBM — the kernel streams triangle-coefficient
blocks through VMEM, computes the validity/t epilogue on the VPU, and
keeps a running (min-t, argmin) accumulator in VMEM scratch across the
inner grid dimension. HBM traffic is O(rays + triangles), not O(rays x
triangles).

The backface rule (hit backfaces only when ray.isInside, triangle.cpp:
226-235) folds in exactly: flipping the sign of det/uu/vv leaves
t = raw_tn/raw_det unchanged, so validity uses sign-adjusted values and t
uses the raw ratio.

Used for the forward/while-loop path on TPU when the triangle count makes
it worthwhile; the XLA path remains for AD (scan mode) and other backends.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.ops.vecmath import V3

try:  # Pallas import kept optional: CPU-only envs use the XLA path
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

INF = 3.0e38  # python float: jnp scalars captured in a Pallas kernel error out
TRI_EPS = 1e-5  # triangle.cpp:220

# on-chip sweep (round 2, triangles 500x500x16spp end-to-end workqueue):
# (rb,tb) (1024,256) 3.15, (1024,128) 3.31, (512,256) 3.31, (512,128) 3.33,
# (256,256) 1.55, (1024,64) — finer tiles gate the cluster matmuls a bit
# better; rb=256 collapses (too little MXU work per grid step). A two-phase
# det/tn -> uu/vv gated variant measured 1.79 (nested @pl.when breaks the
# cluster-loop pipelining) — rejected.
RAY_BLOCK = 512
TRI_BLOCK = 128
NUM_FEATURES = 16  # triangle features
SPH_FEATURES = 24  # sphere features: 17 real + zero-pad to a sublane multiple

# MXU precision for the coefficient matmuls. The TPU default computes f32
# dots in ONE bf16 pass (~0.4% relative error — measured to corrupt hit
# tests at coordinate scale ~500: winner agreement fell to 63%). HIGHEST
# restores exactness; HIGH (bf16_3x) is the measured-on-device middle
# ground (see STATUS.md precision post-mortem). Module-level knob so the
# validation harness can sweep it.
_PRECISION = None  # set below


def set_precision(p):
    global _PRECISION
    _PRECISION = p


try:
    _PRECISION = jax.lax.Precision.HIGHEST
except Exception:  # pragma: no cover
    pass


def _cross_cols(a: V3, b: V3):
    return (
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def tri_coefficients(m: V3, u: V3, v: V3, active):
    """Per-triangle coefficient rows (T, 16) for det/uu/vv/tn.

    Expansions (e_ijk = Levi-Civita; all '.'/'x' are 3-vector ops):
      raw_det = rd.(v x u)
              -> rd-linear coeffs (v x u)
      raw_uu  = ro.(rd x v) - m.(rd x v)
              = sum_ij ro_i rd_j [sum_k e_ijk v_k]  +  rd.(v x m)
              -> ro(x)rd coeffs A_ij = e_ijk v_k, rd coeffs (v x m)
      raw_vv  = rd.((ro-m) x u) = sum_ij ro_i rd_j [-e_ijk u_k] + rd.(u x m)...
              rd.(ro x u): e_jik terms -> ro(x)rd coeffs B_ij = -e_ijk u_k
                (since rd.(ro x u) = sum_j rd_j e_jkl ro_k u_l
                 = sum_kj ro_k rd_j e_jkl u_l = sum_ij ro_i rd_j [e_jil u_l])
              and  -rd.(m x u)*... handled below numerically-safe via the
              same triple-product identities:
                rd.((ro-m) x u) = -ro.(rd x u) + m.(rd x u)
              -> ro(x)rd coeffs -e_ijk u_k, rd coeffs -(u x m)
      raw_tn  = (ro-m).(u x v) -> const -m.(u x v), ro coeffs (u x v)

    Inactive rows get all-zero coefficients (det = 0 => never valid).
    Feature order: [1, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
                    ro.x*rd.x, ro.x*rd.y, ro.x*rd.z,
                    ro.y*rd.x, ro.y*rd.y, ro.y*rd.z,
                    ro.z*rd.x, ro.z*rd.y, ro.z*rd.z]
    """
    t_count = m.x.shape[0]
    zeros = jnp.zeros((t_count,), jnp.float32)

    def rows(const, ro_c, rd_c, ord_c):
        # ord_c: dict {(i,j): coeff} for ro_i * rd_j features
        cols = [const]
        cols += list(ro_c)
        cols += list(rd_c)
        for i in range(3):
            for j in range(3):
                cols.append(ord_c.get((i, j), zeros))
        return jnp.stack(cols, axis=1)  # (T, 16)

    vxu = _cross_cols(v, u)
    vxm = _cross_cols(v, m)
    uxm = _cross_cols(u, m)
    uxv = _cross_cols(u, v)

    # e_ijk v_k as {(i,j)}: e_012=+1 e_021=-1 e_120=+1 e_102=-1 e_201=+1 e_210=-1
    def eps_outer(w: tuple, sign=1.0):
        wx, wy, wz = w
        s = sign
        return {
            (0, 1): s * wz, (0, 2): -s * wy,
            (1, 0): -s * wz, (1, 2): s * wx,
            (2, 0): s * wy, (2, 1): -s * wx,
        }

    c_det = rows(zeros, (zeros, zeros, zeros), vxu, {})
    # -m.(rd x v): rd_j coefficient is (m x v)_j = -(v x m)_j
    c_uu = rows(
        zeros, (zeros, zeros, zeros),
        tuple(-x for x in vxm), eps_outer((v.x, v.y, v.z)),
    )
    # -rd.(m x u): rd_j coefficient is (u x m)_j
    c_vv = rows(
        zeros, (zeros, zeros, zeros),
        uxm, eps_outer((u.x, u.y, u.z), sign=-1.0),
    )
    c_tn = rows(
        -(m.x * uxv[0] + m.y * uxv[1] + m.z * uxv[2]),
        uxv, (zeros, zeros, zeros), {},
    )
    act = active.astype(jnp.float32)[:, None]
    return c_det * act, c_uu * act, c_vv * act, c_tn * act


def ray_features(ro: V3, rd: V3):
    """(16, N) feature matrix (rays on the lane axis)."""
    n = ro.x.shape[0]
    rows = [jnp.ones((n,), jnp.float32), ro.x, ro.y, ro.z, rd.x, rd.y, rd.z]
    for o in (ro.x, ro.y, ro.z):
        for d in (rd.x, rd.y, rd.z):
            rows.append(o * d)
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# Spheres (incl. moving): quadratic coefficients as ray-feature inner products
# ---------------------------------------------------------------------------


def sphere_coefficients(scene):
    """Per-sphere coefficient rows (S, 16) for the quadratic (b, c).

    The moving-center lerp (sphere.h:24-31) is AFFINE in ray time:
        cen(time) = P + time * Q,  P = c0 + beta*dc, Q = alpha*dc,
        alpha = mov/(t1-t0), beta = -mov*t0/(t1-t0), dc = c1-c0
    so with oc = ro - cen:
        b = oc.rd      = (ro.rd) - P.rd - time*(Q.rd)
        c = |oc|^2-r^2 = |ro|^2 - 2 ro.P - 2 time (ro.Q)
                         + (|P|^2 - r^2) + 2 time (P.Q) + time^2 |Q|^2
    Feature order: [1, ro(3), rd(3), ro.rd, |ro|2, time, time^2,
                    time*ro(3), time*rd(3)]  (16 total).
    Inactive rows get c-const = +INF/2 (disc < 0 => never hit).
    """
    c0 = V3(scene.sph_c0[:, 0], scene.sph_c0[:, 1], scene.sph_c0[:, 2])
    c1 = V3(scene.sph_c1[:, 0], scene.sph_c1[:, 1], scene.sph_c1[:, 2])
    t0, t1 = scene.sph_t0, scene.sph_t1
    mov = scene.sph_moving
    r = scene.sph_radius
    denom = jnp.where(mov > 0, t1 - t0, 1.0)
    alpha = jnp.where(mov > 0, 1.0 / denom, 0.0)
    beta = jnp.where(mov > 0, -t0 / denom, 0.0)
    dc = c1 - c0
    P = c0 + dc * beta
    Q = dc * alpha

    s_count = r.shape[0]
    zeros = jnp.zeros((s_count,), jnp.float32)

    def row(const, ro_c, rd_c, rord, rosq, t_c, t2_c, tro_c, trd_c):
        cols = [const, *ro_c, *rd_c, rord, rosq, t_c, t2_c, *tro_c, *trd_c]
        cols += [zeros] * (SPH_FEATURES - len(cols))  # align to sublanes
        return jnp.stack(cols, axis=1)

    z3 = (zeros, zeros, zeros)
    ones = jnp.ones((s_count,), jnp.float32)
    cb = row(zeros, z3, (-P.x, -P.y, -P.z), ones, zeros, zeros, zeros,
             z3, (-Q.x, -Q.y, -Q.z))
    psq = P.x * P.x + P.y * P.y + P.z * P.z
    pq = P.x * Q.x + P.y * Q.y + P.z * Q.z
    qsq = Q.x * Q.x + Q.y * Q.y + Q.z * Q.z
    inactive = ~scene.sph_active
    cc = row(
        psq - r * r + jnp.where(inactive, INF * 0.5, 0.0),
        (-2.0 * P.x, -2.0 * P.y, -2.0 * P.z), z3,
        zeros, ones, 2.0 * pq, qsq, (-2.0 * Q.x, -2.0 * Q.y, -2.0 * Q.z), z3,
    )
    return cb, cc


def sphere_ray_features(ro: V3, rd: V3, time):
    """(16, N) features for the sphere quadratic (see sphere_coefficients)."""
    n = ro.x.shape[0]
    rows = [
        jnp.ones((n,), jnp.float32),
        ro.x, ro.y, ro.z, rd.x, rd.y, rd.z,
        ro.x * rd.x + ro.y * rd.y + ro.z * rd.z,
        ro.x * ro.x + ro.y * ro.y + ro.z * ro.z,
        time, time * time,
        time * ro.x, time * ro.y, time * ro.z,
        time * rd.x, time * rd.y, time * rd.z,
    ]
    zero = jnp.zeros((n,), jnp.float32)
    rows += [zero] * (SPH_FEATURES - len(rows))
    return jnp.stack(rows, axis=0)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _sphere_kernel(cb_ref, cc_ref, f_ref, inside_ref, tmin_ref,
                   t_out_ref, i_out_ref, best_t_ref, best_i_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, INF)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    f = f_ref[:]  # (16, NB)
    hi = _PRECISION  # see module knob: TPU default bf16 corrupts
    b = jnp.dot(cb_ref[:], f, preferred_element_type=jnp.float32, precision=hi)
    c = jnp.dot(cc_ref[:], f, preferred_element_type=jnp.float32, precision=hi)

    inside = inside_ref[:]  # (1, NB)
    tmin = tmin_ref[0]
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t_front = -b - sq
    t_back = -b + sq
    ok = disc > 0.0
    front_ok = ok & (t_front > tmin)
    back_ok = ok & (inside > 0.0) & (t_back > tmin)
    cand = jnp.where(front_ok, t_front, jnp.where(back_ok, t_back, INF))
    local_min = jnp.min(cand, axis=0, keepdims=True)
    local_arg = jnp.argmin(cand, axis=0).astype(jnp.int32)[None, :] + j * cand.shape[0]

    better = local_min < best_t_ref[:]
    best_t_ref[:] = jnp.where(better, local_min, best_t_ref[:])
    best_i_ref[:] = jnp.where(better, local_arg, best_i_ref[:])

    @pl.when(j == nj - 1)
    def _():
        t_out_ref[:] = best_t_ref[:]
        i_out_ref[:] = best_i_ref[:]


def _kernel(cdet_ref, cuu_ref, cvv_ref, ctn_ref, f_ref, inside_ref, tmin_ref,
            t_out_ref, i_out_ref, best_t_ref, best_i_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, INF)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    f = f_ref[:]  # (16, NB)
    hi = _PRECISION  # module knob (default HIGHEST; see header comment)
    det = jnp.dot(cdet_ref[:], f, preferred_element_type=jnp.float32, precision=hi)
    uu = jnp.dot(cuu_ref[:], f, preferred_element_type=jnp.float32, precision=hi)
    vv = jnp.dot(cvv_ref[:], f, preferred_element_type=jnp.float32, precision=hi)
    tn = jnp.dot(ctn_ref[:], f, preferred_element_type=jnp.float32, precision=hi)

    inside = inside_ref[:]  # (1, NB) f32: 1.0 when ray.isInside > 0
    tmin = tmin_ref[0]
    # backface flip (triangle.cpp:226-235): allowed only when inside
    sign = jnp.where((inside > 0.0) & (det < 0.0), -1.0, 1.0)
    sdet = det * sign
    suu = uu * sign
    svv = vv * sign
    t = tn / det  # 0/0 -> NaN only on invalid lanes (masked below)
    valid = (
        (sdet >= TRI_EPS)
        & (suu >= 0.0)  # suu<=sdet implied by svv>=0 & sum bound
        & (svv >= 0.0) & (suu + svv <= sdet)
        & (t >= tmin)
    )
    cand = jnp.where(valid, t, INF)
    local_min = jnp.min(cand, axis=0, keepdims=True)  # (1, NB)
    local_arg = jnp.argmin(cand, axis=0).astype(jnp.int32)[None, :] + j * cand.shape[0]

    better = local_min < best_t_ref[:]
    best_t_ref[:] = jnp.where(better, local_min, best_t_ref[:])
    best_i_ref[:] = jnp.where(better, local_arg, best_i_ref[:])

    @pl.when(j == nj - 1)
    def _():
        t_out_ref[:] = best_t_ref[:]
        i_out_ref[:] = best_i_ref[:]


# ---------------------------------------------------------------------------
# Cluster culling: the TPU-native answer to the reference's BVH
# (triangle.h:171-213). A per-lane tree walk is gather-bound on TPU
# (ops/bvh.py post-mortem); instead we keep the dense MXU sweep but make
# whole (ray-block x triangle-cluster) tiles skippable: triangles are
# Morton-sorted into clusters of TRI_BLOCK with precomputed AABBs, rays are
# optionally sorted by (direction octant, origin cell) so blocks are
# coherent, and the kernel slab-tests each cluster against the ray block
# (with a best-t early-out) before paying the four coefficient matmuls.
# ---------------------------------------------------------------------------


def _spread3(x):
    """Interleave the low 10 bits of u32 x with two zero bits each."""
    x = x.astype(jnp.uint32)
    x = (x | (x << jnp.uint32(16))) & jnp.uint32(0x030000FF)
    x = (x | (x << jnp.uint32(8))) & jnp.uint32(0x0300F00F)
    x = (x | (x << jnp.uint32(4))) & jnp.uint32(0x030C30C3)
    x = (x | (x << jnp.uint32(2))) & jnp.uint32(0x09249249)
    return x


def tri_cull_build(m: V3, u: V3, v: V3, active, coeffs,
                   block: int | None = None):
    """Morton-order triangles into clusters of `block` with AABBs.

    coeffs: the 4 (T, 16) tables from tri_coefficients (UNpermuted).
    Returns (cds (4 x (Tpad,16) permuted+padded), bounds (8, NC) f32
    [lo3, hi3, pad2], orig_of (Tpad,) i32 permuted-row -> original index,
    cstack_t (16, NC*4*block) transposed stacked table for the streamed
    kernel). Inactive triangles sort last, get zero coefficients (never
    valid) and inverted AABB contributions (never gate a cluster in).
    block=None picks the smallest power of two (from 64 — the in-kernel
    unroll sweep's winner) keeping NC <= 512: the prefetched per-ray-block
    cluster lists live in SMEM (1 MB on v5e), so NC x ray-blocks is
    budget-bound; cluster size is the BVH leaf-size tradeoff.
    """
    t_count = m.x.shape[0]
    if block is None:
        block = 64
        while t_count > 512 * block:
            block *= 2
    act = active.astype(bool)
    cen = V3(m.x + (u.x + v.x) / 3.0, m.y + (u.y + v.y) / 3.0,
             m.z + (u.z + v.z) / 3.0)
    big = jnp.float32(INF)

    def qaxis(c):
        c_act = jnp.where(act, c, big)
        lo = jnp.min(c_act)
        c_act2 = jnp.where(act, c, -big)
        hi = jnp.max(c_act2)
        tq = jnp.clip((c - lo) / jnp.maximum(hi - lo, 1e-30), 0.0, 0.999999)
        return (tq * 1024.0).astype(jnp.uint32)

    key = (
        (_spread3(qaxis(cen.x)) << jnp.uint32(2))
        | (_spread3(qaxis(cen.y)) << jnp.uint32(1))
        | _spread3(qaxis(cen.z))
    )
    key = jnp.where(act, key, jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(key).astype(jnp.int32)  # (T,)

    rem = (-t_count) % block
    orig_of = jnp.concatenate([perm, jnp.zeros((rem,), jnp.int32)]) if rem else perm

    cds = []
    for c in coeffs:
        cp = jnp.take(c, perm, axis=0)
        cds.append(_pad_to(cp, block, 0, 0.0))

    # per-tri AABB over verts a=m, b=m+u, c=m+v; inactive -> inverted
    def tri_lo_hi(a, b, cc_):
        return jnp.minimum(a, jnp.minimum(b, cc_)), jnp.maximum(a, jnp.maximum(b, cc_))

    los, his = [], []
    for comp in "xyz":
        a = getattr(m, comp)
        b = a + getattr(u, comp)
        c3 = a + getattr(v, comp)
        lo_c, hi_c = tri_lo_hi(a, b, c3)
        lo_c = jnp.where(act, lo_c, big)
        hi_c = jnp.where(act, hi_c, -big)
        lo_p = jnp.take(lo_c, perm)
        hi_p = jnp.take(hi_c, perm)
        if rem:
            lo_p = jnp.concatenate([lo_p, jnp.full((rem,), big)])
            hi_p = jnp.concatenate([hi_p, jnp.full((rem,), -big)])
        nc = lo_p.shape[0] // block
        los.append(jnp.min(lo_p.reshape(nc, block), axis=1))
        his.append(jnp.max(hi_p.reshape(nc, block), axis=1))
    nc = los[0].shape[0]
    zero = jnp.zeros((nc,), jnp.float32)
    bounds = jnp.stack(los + his + [zero, zero], axis=0)  # (8, NC)

    # per-octant front-to-back cluster visit order (ascending signed
    # centroid projection): lets the best-t early-out prune far clusters
    # the way the reference BVH's ordered traversal does
    # (scene_object.h:224-231 node_order & dirMask)
    cen_c = [(los[a] + his[a]) * 0.5 for a in range(3)]
    # empty/padded clusters (lo=+INF, hi=-INF) -> centroid NaN; sort last
    orders = []
    for o in range(8):
        sx = -1.0 if (o & 4) else 1.0
        sy = -1.0 if (o & 2) else 1.0
        sz = -1.0 if (o & 1) else 1.0
        keyf = sx * cen_c[0] + sy * cen_c[1] + sz * cen_c[2]
        keyf = jnp.where(jnp.isfinite(keyf), keyf, jnp.float32(INF))
        orders.append(jnp.argsort(keyf).astype(jnp.int32))
    cl_ord = jnp.stack(orders, axis=0)  # (8, NC)

    # (16, NC*4*block) TRANSPOSED stacked table for the streamed kernel:
    # per cluster, det/uu/vv/tn blocks along the lane axis so one
    # 128-aligned DMA fetches the whole cluster. Built ONCE here — building
    # it per call would re-run the copy every bounce iteration inside the
    # integrator's while_loop (XLA does not hoist it out).
    cstack_t = jnp.concatenate(
        [c.reshape(nc, block, NUM_FEATURES) for c in cds], axis=1
    ).reshape(nc * 4 * block, NUM_FEATURES).T
    return tuple(cds), bounds, orig_of, cl_ord, cstack_t


def _culled_kernel(oct_ref, ord_ref, bnd_ref, cdet_ref, cuu_ref, cvv_ref,
                   ctn_ref, f_ref, inside_ref, seed_ref, tmin_ref,
                   t_out_ref, i_out_ref, best_t_ref, best_i_ref):
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = seed_ref[:]  # prune clusters behind known hits
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    f = f_ref[:]  # (16, NB)
    tmin = tmin_ref[0]
    # visit clusters front-to-back for this block's ray octant (the
    # reference BVH's ordered-traversal trick, scene_object.h:224-231)
    c = ord_ref[oct_ref[i], j]

    # cluster slab test (aabb.h:45-76 semantics, strict tmax > tmin) with a
    # best-t early-out: a cluster farther than every lane's current winner
    # can't change the result. Bounds live in SMEM (6 scalars per cluster).
    # NaN lanes (ray on a slab plane with zero direction component) compare
    # False and never gate a cluster in.
    tnear = None
    tfar = None
    for a in range(3):
        ro_a = f[1 + a : 2 + a, :]
        ird_a = 1.0 / f[4 + a : 5 + a, :]
        t0a = (bnd_ref[a, c] - ro_a) * ird_a
        t1a = (bnd_ref[3 + a, c] - ro_a) * ird_a
        lo_a = jnp.minimum(t0a, t1a)
        hi_a = jnp.maximum(t0a, t1a)
        tnear = lo_a if tnear is None else jnp.maximum(tnear, lo_a)
        tfar = hi_a if tfar is None else jnp.minimum(tfar, hi_a)
    hit_c = (tfar > jnp.maximum(tnear, tmin)) & (tnear < best_t_ref[:])

    @pl.when(jnp.any(hit_c))
    def _():
        hi = _PRECISION
        det = jnp.dot(cdet_ref[:], f, preferred_element_type=jnp.float32, precision=hi)
        uu = jnp.dot(cuu_ref[:], f, preferred_element_type=jnp.float32, precision=hi)
        vv = jnp.dot(cvv_ref[:], f, preferred_element_type=jnp.float32, precision=hi)
        tn = jnp.dot(ctn_ref[:], f, preferred_element_type=jnp.float32, precision=hi)

        inside = inside_ref[:]
        sign = jnp.where((inside > 0.0) & (det < 0.0), -1.0, 1.0)
        sdet = det * sign
        suu = uu * sign
        svv = vv * sign
        t = tn / det  # 0/0 -> NaN only on invalid lanes (masked below)
        valid = (
            (sdet >= TRI_EPS)
            & (suu >= 0.0)  # suu<=sdet implied by svv>=0 & sum bound
            & (svv >= 0.0) & (suu + svv <= sdet)
            & (t >= tmin)
        )
        cand = jnp.where(valid, t, INF)
        local_min = jnp.min(cand, axis=0, keepdims=True)
        local_arg = jnp.argmin(cand, axis=0).astype(jnp.int32)[None, :] + c * cand.shape[0]

        better = local_min < best_t_ref[:]
        best_t_ref[:] = jnp.where(better, local_min, best_t_ref[:])
        best_i_ref[:] = jnp.where(better, local_arg, best_i_ref[:])

    @pl.when(j == nj - 1)
    def _():
        t_out_ref[:] = best_t_ref[:]
        i_out_ref[:] = best_i_ref[:]


def _ray_sort_key(ro: V3, rd: V3, bounds, dir_key: bool = False,
                  origin_bits: int = 5):
    """(N,) u32 coherence key: direction octant (3 bits) then origin cell
    (Morton, `origin_bits`/axis over the scene bbox — higher resolution
    groups within-mesh interior rays, the resident sweep's worst case).
    With `dir_key`, 6 bits of intra-octant direction (|d| components
    quantized 2 bits each, Morton) are inserted above the origin bits —
    bounce rays from nearby surface points but scattered directions then
    land in different blocks, which tightens each block's compacted
    cluster union in the resident sweep."""
    lo = jnp.min(bounds[0:3, :], axis=1)
    hi = jnp.max(bounds[3:6, :], axis=1)
    ob = jnp.uint32(3 * origin_bits)
    scale = float(1 << origin_bits)
    mask = jnp.uint32((1 << (3 * origin_bits)) - 1)

    def q(c, a):
        t = jnp.clip((c - lo[a]) / jnp.maximum(hi[a] - lo[a], 1e-30), 0.0, 0.999999)
        return (t * scale).astype(jnp.uint32)

    oct_ = (
        ((rd.x < 0).astype(jnp.uint32) << jnp.uint32(2))
        | ((rd.y < 0).astype(jnp.uint32) << jnp.uint32(1))
        | (rd.z < 0).astype(jnp.uint32)
    )
    morton = (
        (_spread3(q(ro.x, 0)) << jnp.uint32(2))
        | (_spread3(q(ro.y, 1)) << jnp.uint32(1))
        | _spread3(q(ro.z, 2))
    )
    key = (oct_ << ob) | (morton & mask)
    if dir_key:
        def qd(c):
            t = jnp.clip(jnp.abs(c), 0.0, 0.999999)
            return (t * 4.0).astype(jnp.uint32)

        dirm = (
            (_spread3(qd(rd.x)) << jnp.uint32(2))
            | (_spread3(qd(rd.y)) << jnp.uint32(1))
            | _spread3(qd(rd.z))
        ) & jnp.uint32(0x3F)
        key = (oct_ << jnp.uint32(21)) | (dirm << jnp.uint32(15)) \
            | (morton & jnp.uint32(0x7FFF))
    return key


@partial(jax.jit, static_argnames=("interpret", "sort_rays"))
def flash_tri_hit_culled(cull, ro: V3, rd: V3, inside, tmin, t_seed=None, *,
                         sort_rays: bool = True, interpret: bool = False):
    """Closest triangle hit with cluster culling (and optional ray sorting).

    cull: (cds, bounds, orig_of, cl_ord) from tri_cull_build. Same results
    as flash_tri_hit up to ties/NaN-graze corner cases; returns (t, idx)
    with idx in ORIGINAL triangle numbering.

    The kernel visits clusters in per-octant front-to-back order (scalar-
    prefetched index map) so the best-t early-out prunes far clusters like
    the reference's ordered BVH traversal.

    `t_seed` (N,) optionally seeds the best-t accumulator with the nearest
    hit already known from OTHER primitive types: clusters entirely behind
    an existing surface hit are pruned. Lanes where no triangle beats the
    seed return t == t_seed with an arbitrary index — callers must combine
    with a tie rule that prefers the seeding type (intersect.scene_hit's
    sphere-then-rect-then-tri order does).
    """
    cds, bounds, orig_of, cl_ord = cull[:4]
    n = ro.x.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    inside_f = (inside > 0).astype(jnp.float32)
    seed = jnp.full((n,), INF) if t_seed is None else t_seed
    if sort_rays:
        key = _ray_sort_key(ro, rd, bounds)
        (skey, rox, roy, roz, rdx, rdy, rdz, insf, sseed, back) = jax.lax.sort(
            (key, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, inside_f, seed, iota),
            num_keys=1,
        )
    else:
        skey = _ray_sort_key(ro, rd, bounds)
        rox, roy, roz, rdx, rdy, rdz, insf, sseed, back = (
            ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, inside_f, seed, iota
        )

    f = _pad_to(ray_features(V3(rox, roy, roz), V3(rdx, rdy, rdz)), RAY_BLOCK, 1, 0.0)
    insp = _pad_to(insf[None, :], RAY_BLOCK, 1, 0.0)
    seedp = _pad_to(sseed[None, :], RAY_BLOCK, 1, INF)
    n_pad = f.shape[1]
    t_pad = cds[0].shape[0]
    tri_block = t_pad // bounds.shape[1]
    grid = (n_pad // RAY_BLOCK, t_pad // tri_block)
    # per-ray-block octant (of its first ray) selects the cluster order row;
    # len == n_pad // RAY_BLOCK since n_pad = ceil(n / RAY_BLOCK) * RAY_BLOCK
    oct_blk = (skey[::RAY_BLOCK] >> jnp.uint32(15)).astype(jnp.int32)

    c_spec = pl.BlockSpec(
        (tri_block, NUM_FEATURES),
        lambda i, j, oct_r, ord_r: (ord_r[oct_r[i], j], 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds (8, NC), scalars
            c_spec, c_spec, c_spec, c_spec,
            pl.BlockSpec((NUM_FEATURES, RAY_BLOCK),
                         lambda i, j, o, _: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j, o, _: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j, o, _: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j, o, _: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j, o, _: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
        ],
    )
    t_out, i_out = pl.pallas_call(
        _culled_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        interpret=interpret,
    )(oct_blk, cl_ord, bounds, cds[0], cds[1], cds[2], cds[3], f, insp, seedp,
      jnp.full((1,), tmin, jnp.float32))
    t_s = t_out[0, :n]
    idx_s = jnp.take(orig_of, i_out[0, :n])  # permuted -> original numbering
    if sort_rays:
        _, t_fin, idx_fin = jax.lax.sort((back, t_s, idx_s), num_keys=1)
        return t_fin, idx_fin
    return t_s, idx_s


# ---------------------------------------------------------------------------
# Resident-table compacted sweep: the second-generation cluster kernel.
#
# The grid kernel above visits EVERY (ray-block, cluster) tile: Pallas DMAs
# the cluster's coefficient block and runs the slab gate per tile, so a
# pruned tile still costs its DMA + grid step, and the gate is re-derived
# in-kernel each visit. Here the four coefficient tables live WHOLE in VMEM
# (16 MB/core; 11.3k tris = 2.9 MB), an XLA pre-pass computes, per
# RAY_BLOCK block, the compacted list of clusters any lane can actually
# improve with (slab pass AND entry distance under that lane's seed),
# sorted front-to-back by minimum entry distance — and the kernel runs ONE
# while_loop over exactly that list, with the reference BVH's ordered-
# traversal break (scene_object.h:224-231): once the next cluster's entry
# distance exceeds every lane's current best t, no remaining cluster can
# win. MXU work becomes proportional to geometrically-relevant clusters,
# not cluster count.
# ---------------------------------------------------------------------------

RESIDENT_MAX_COEFF_BYTES = 10 * 1024 * 1024  # 4 tables must fit in ~16MB VMEM


def resident_ok(cull) -> bool:
    """True when the scene's coefficient tables fit the resident kernel."""
    cds = cull[0]
    return 4 * cds[0].shape[0] * NUM_FEATURES * 4 <= RESIDENT_MAX_COEFF_BYTES


def _resident_kernel(tri_block, unroll, cl_ref, cnt_ref, tnm_ref, cdet_ref,
                     cuu_ref, cvv_ref, ctn_ref, f_ref, inside_ref, seed_ref,
                     tmin_ref, t_out_ref, i_out_ref):
    i = pl.program_id(0)
    f = f_ref[:]  # (16, NB)
    inside = inside_ref[:]
    tmin = tmin_ref[0]
    cnt = cnt_ref[i]
    hi = _PRECISION

    def cond(c):
        s, best_t, _ = c
        # front-to-back break: clusters are sorted by min entry distance;
        # tnear_lane >= tnm for every lane, so tnm >= max(best_t) means no
        # remaining cluster can beat ANY lane's winner
        return (s < cnt) & (tnm_ref[i, s] < jnp.max(best_t))

    def eval_cluster(s, best_t, best_i):
        base = cl_ref[i, s] * tri_block
        cdet = cdet_ref[pl.ds(base, tri_block), :]
        cuu = cuu_ref[pl.ds(base, tri_block), :]
        cvv = cvv_ref[pl.ds(base, tri_block), :]
        ctn = ctn_ref[pl.ds(base, tri_block), :]
        det = jnp.dot(cdet, f, preferred_element_type=jnp.float32, precision=hi)
        uu = jnp.dot(cuu, f, preferred_element_type=jnp.float32, precision=hi)
        vv = jnp.dot(cvv, f, preferred_element_type=jnp.float32, precision=hi)
        tn = jnp.dot(ctn, f, preferred_element_type=jnp.float32, precision=hi)

        sign = jnp.where((inside > 0.0) & (det < 0.0), -1.0, 1.0)
        sdet = det * sign
        suu = uu * sign
        svv = vv * sign
        t = tn / det  # 0/0 -> NaN only on invalid lanes (masked below)
        valid = (
            (sdet >= TRI_EPS)
            & (suu >= 0.0)  # suu<=sdet implied by svv>=0 & sum bound
            & (svv >= 0.0) & (suu + svv <= sdet)
            & (t >= tmin)
        )
        cand = jnp.where(valid, t, INF)
        local_min = jnp.min(cand, axis=0, keepdims=True)
        local_arg = (
            jnp.argmin(cand, axis=0).astype(jnp.int32)[None, :] + base
        )
        better = local_min < best_t
        return (
            jnp.where(better, local_min, best_t),
            jnp.where(better, local_arg, best_i),
        )

    def body(c):
        s, best_t, best_i = c
        # unrolled pair: cluster s+1's MXU dots are independent of cluster
        # s's VPU epilogue, so Mosaic can overlap them within one body.
        # Odd tails re-evaluate the last cluster — idempotent for a
        # strict-improvement min/argmin update.
        best_t, best_i = eval_cluster(s, best_t, best_i)
        for k in range(1, unroll):
            sk = jnp.minimum(s + k, cnt - 1)
            best_t, best_i = eval_cluster(sk, best_t, best_i)
        return (s + unroll, best_t, best_i)

    best_t0 = seed_ref[:]
    best_i0 = jnp.zeros(best_t0.shape, jnp.int32)
    _, bt, bi = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, best_i0)
    )
    t_out_ref[:] = bt
    i_out_ref[:] = bi


@partial(jax.jit, static_argnames=("interpret", "ray_block", "dir_key",
                                   "origin_bits", "unroll"))
def flash_tri_hit_resident(cull, ro: V3, rd: V3, inside, tmin, t_seed=None,
                           *, ray_block: int = 256,
                           dir_key: bool = False, origin_bits: int = 5,
                           unroll: int = 4, interpret: bool = False):
    """Closest triangle hit, resident-table compacted sweep.

    Same contract as flash_tri_hit_culled (sorted rays, original-index
    results, optional per-lane `t_seed` from other primitive types with the
    caller's tie rule). Requires resident_ok(cull). `ray_block` (lanes per
    compacted cluster list), `unroll` (clusters per loop body — lets
    Mosaic overlap cluster s+1's MXU dots with cluster s's VPU epilogue)
    and `dir_key` trade per-block divergence against fixed overheads —
    defaults (rb=256, u=4, with 64-triangle clusters from tri_cull_build)
    measured 25% faster than rb=512/u=1/tb=128 on worst-case incoherent
    rays (STATUS.md round 2).
    """
    cds, bounds, orig_of, cl_ord = cull[:4]
    del cl_ord  # order is per-block front-to-back here, not per-octant
    nc = bounds.shape[1]
    tri_block = cds[0].shape[0] // nc
    n = ro.x.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    inside_f = (inside > 0).astype(jnp.float32)
    seed = jnp.full((n,), INF) if t_seed is None else t_seed
    key = _ray_sort_key(ro, rd, bounds, dir_key=dir_key,
                        origin_bits=origin_bits)
    (skey, rox, roy, roz, rdx, rdy, rdz, insf, sseed, back) = jax.lax.sort(
        (key, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, inside_f, seed, iota),
        num_keys=1,
    )

    f_all = _pad_to(ray_features(V3(rox, roy, roz), V3(rdx, rdy, rdz)),
                    ray_block, 1, 0.0)
    insp_all = _pad_to(insf[None, :], ray_block, 1, 0.0)
    seedp_all = _pad_to(sseed[None, :], ray_block, 1, INF)
    n_pad = f_all.shape[1]

    # ray chunks of <=128 blocks per pallas_call: the prefetched (nb, NC)
    # cluster lists live in SMEM (1 MB on v5e), so nb x NC is budget-bound
    chunk = 128 * ray_block
    t_parts, i_parts = [], []
    for r0 in range(0, n_pad, chunk):
        f = f_all[:, r0 : r0 + chunk]
        insp = insp_all[:, r0 : r0 + chunk]
        seedp = seedp_all[:, r0 : r0 + chunk]
        nb = f.shape[1] // ray_block
        order, count, tn_sorted = _compact_lists(bounds, f, seedp, tmin,
                                                 ray_block,
                                                 interpret=interpret)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # cl_list, count, tn_sorted
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # cdet (Tpad, 16)
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((NUM_FEATURES, ray_block),
                             lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
        )
        t_out, i_out = pl.pallas_call(
            partial(_resident_kernel, tri_block, unroll),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((1, f.shape[1]), jnp.float32),
                jax.ShapeDtypeStruct((1, f.shape[1]), jnp.int32),
            ],
            interpret=interpret,
        )(order, count, tn_sorted, cds[0], cds[1], cds[2], cds[3], f, insp,
          seedp, jnp.full((1,), tmin, jnp.float32))
        t_parts.append(t_out[0])
        i_parts.append(i_out[0])
    t_s = jnp.concatenate(t_parts)[:n]
    idx_s = jnp.take(orig_of, jnp.concatenate(i_parts)[:n])
    _, t_fin, idx_fin = jax.lax.sort((back, t_s, idx_s), num_keys=1)
    return t_fin, idx_fin


# ---------------------------------------------------------------------------
# Streamed compacted sweep: same per-block compacted front-to-back cluster
# lists as the resident kernel, but the coefficient tables stay WHOLE in
# HBM and each visited cluster's 4 blocks are DMA'd into a double-buffered
# VMEM scratch inside the while_loop (copy for cluster s+1 overlaps the
# MXU/VPU work on cluster s). This removes the resident kernel's VMEM
# table limit: scenes are bounded by HBM (a 1M-triangle table is 256 MB),
# and per-ray work stays proportional to geometrically-relevant clusters.
# The slab pre-pass is chunked along the cluster axis so its O(rays x
# clusters) intermediates stay bounded at any scene size.
# ---------------------------------------------------------------------------

STREAM_CHUNK_COLS = 256  # pre-pass cluster-column chunk (bounds peak memory)


def _compact_lists(bounds, f, seedp, tmin, ray_block, interpret=False):
    """Chunked lane-exact slab pre-pass -> per-block compacted front-to-back
    cluster lists (order, count, tn_sorted), each (nb, nc)/(nb,).
    `interpret` is unused (XLA path; a register-resident Pallas version
    measured no faster — see STATUS.md round 2 dead ends).

    Works for any primitive kind whose feature matrix keeps ro in rows 1-3
    and rd in rows 4-6 (true for both tri and sphere features). A cluster is
    listed for a ray block only if SOME lane both enters its AABB (strict
    aabb.h:45-76 slab semantics) and does so nearer than that lane's seed.
    Padded lanes (f == 0) produce NaN slab distances and gate nothing in.
    Chunking the cluster axis bounds the O(rays x clusters) intermediates
    at any scene size."""
    nc = bounds.shape[1]
    n_pad = f.shape[1]
    nb = n_pad // ray_block
    tn_min_chunks = []
    for c0 in range(0, nc, STREAM_CHUNK_COLS):
        bsl = bounds[:, c0 : c0 + STREAM_CHUNK_COLS]
        ck = bsl.shape[1]
        tn = jnp.full((n_pad, ck), -INF)
        tf = jnp.full((n_pad, ck), INF)
        for a in range(3):
            ro_a = f[1 + a, :][:, None]
            ird_a = (1.0 / f[4 + a, :])[:, None]
            t0a = (bsl[a][None, :] - ro_a) * ird_a
            t1a = (bsl[3 + a][None, :] - ro_a) * ird_a
            tn = jnp.maximum(tn, jnp.minimum(t0a, t1a))
            tf = jnp.minimum(tf, jnp.maximum(t0a, t1a))
        pass_lane = (tf > jnp.maximum(tn, tmin)) & (tn < seedp[0][:, None])
        tn_eff = jnp.where(pass_lane, tn, INF)
        tn_min_chunks.append(tn_eff.reshape(nb, ray_block, ck).min(axis=1))
    tn_min = jnp.concatenate(tn_min_chunks, axis=1)  # (nb, nc)
    count = (tn_min < INF / 2).sum(axis=1).astype(jnp.int32)
    order = jnp.argsort(tn_min, axis=1).astype(jnp.int32)  # front-to-back
    tn_sorted = jnp.take_along_axis(tn_min, order, axis=1)
    return order, count, tn_sorted


def _streamed_kernel(tri_block, cl_ref, cnt_ref, tnm_ref, cstack_hbm, f_ref,
                     inside_ref, seed_ref, tmin_ref, t_out_ref, i_out_ref,
                     buf_ref, sem_ref):
    i = pl.program_id(0)
    f = f_ref[:]  # (16, NB)
    inside = inside_ref[:]
    tmin = tmin_ref[0]
    cnt = cnt_ref[i]
    hi = _PRECISION
    rows = 4 * tri_block

    def dma(slot, s):
        # cluster s's stacked det/uu/vv/tn COLUMNS (table stored transposed
        # (16, NC*4*tb) so the DMA slices the 128-aligned lane axis),
        # HBM -> VMEM slot
        return pltpu.make_async_copy(
            cstack_hbm.at[:, pl.ds(cl_ref[i, s] * rows, rows)],
            buf_ref.at[slot], sem_ref.at[slot],
        )

    @pl.when(cnt > 0)
    def _():
        dma(0, 0).start()

    def cond(c):
        s, best_t, _ = c
        return (s < cnt) & (tnm_ref[i, s] < jnp.max(best_t))

    def body(c):
        s, best_t, best_i = c
        slot = jax.lax.rem(s, jnp.int32(2))

        @pl.when(s + 1 < cnt)
        def _():
            dma(1 - slot, s + 1).start()

        dma(slot, s).wait()
        blk = buf_ref[slot]  # (16, 4*tb) transposed cluster block
        res = jax.lax.dot_general(
            blk, f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )  # (4*tb, NB)
        det = res[0 * tri_block : 1 * tri_block]
        uu = res[1 * tri_block : 2 * tri_block]
        vv = res[2 * tri_block : 3 * tri_block]
        tn = res[3 * tri_block : 4 * tri_block]

        sign = jnp.where((inside > 0.0) & (det < 0.0), -1.0, 1.0)
        sdet = det * sign
        suu = uu * sign
        svv = vv * sign
        t = tn / det  # 0/0 -> NaN only on invalid lanes (masked below)
        valid = (
            (sdet >= TRI_EPS)
            & (suu >= 0.0)  # suu<=sdet implied by svv>=0 & sum bound
            & (svv >= 0.0) & (suu + svv <= sdet)
            & (t >= tmin)
        )
        cand = jnp.where(valid, t, INF)
        local_min = jnp.min(cand, axis=0, keepdims=True)
        local_arg = (
            jnp.argmin(cand, axis=0).astype(jnp.int32)[None, :]
            + cl_ref[i, s] * tri_block
        )
        better = local_min < best_t
        return (
            s + 1,
            jnp.where(better, local_min, best_t),
            jnp.where(better, local_arg, best_i),
        )

    best_t0 = seed_ref[:]
    best_i0 = jnp.zeros(best_t0.shape, jnp.int32)
    k, bt, bi = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, best_i0)
    )

    # drain: when the front-to-back break fired at cluster k, the copy for
    # k (warmup or prefetch) is still in flight into slot k%2 — wait it out
    # so the next grid step can't race the scratch buffer
    @pl.when((cnt > 0) & (k < cnt))
    def _():
        dma(jax.lax.rem(k, jnp.int32(2)), k).wait()

    t_out_ref[:] = bt
    i_out_ref[:] = bi


@partial(jax.jit, static_argnames=("interpret", "ray_block", "dir_key",
                                   "origin_bits"))
def flash_tri_hit_streamed(cull, ro: V3, rd: V3, inside, tmin, t_seed=None,
                           *, ray_block: int = RAY_BLOCK,
                           dir_key: bool = False, origin_bits: int = 5,
                           interpret: bool = False):
    """Closest triangle hit, HBM-streamed compacted sweep (any scene size).

    Same contract and exactness as flash_tri_hit_resident; use when the
    coefficient tables exceed the resident VMEM budget (resident_ok False).
    """
    cds, bounds, orig_of, cl_ord, cstack = cull
    del cds, cl_ord
    nc = bounds.shape[1]
    tri_block = cstack.shape[1] // (4 * nc)

    n = ro.x.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    inside_f = (inside > 0).astype(jnp.float32)
    seed = jnp.full((n,), INF) if t_seed is None else t_seed
    key = _ray_sort_key(ro, rd, bounds, dir_key=dir_key,
                        origin_bits=origin_bits)
    (skey, rox, roy, roz, rdx, rdy, rdz, insf, sseed, back) = jax.lax.sort(
        (key, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, inside_f, seed, iota),
        num_keys=1,
    )

    f_all = _pad_to(ray_features(V3(rox, roy, roz), V3(rdx, rdy, rdz)),
                    ray_block, 1, 0.0)
    insp_all = _pad_to(insf[None, :], ray_block, 1, 0.0)
    seedp_all = _pad_to(sseed[None, :], ray_block, 1, INF)
    n_pad = f_all.shape[1]

    # rays are processed in chunks of <=128 blocks per pallas_call: the
    # prefetched (nb, NC) cluster lists live in SMEM (1 MB on v5e), so
    # nb x NC is budget-bound, not ray count
    chunk = 128 * ray_block
    t_parts, i_parts = [], []
    for r0 in range(0, n_pad, chunk):
        f = f_all[:, r0 : r0 + chunk]
        insp = insp_all[:, r0 : r0 + chunk]
        seedp = seedp_all[:, r0 : r0 + chunk]
        nb = f.shape[1] // ray_block
        order, count, tn_sorted = _compact_lists(bounds, f, seedp, tmin,
                                                 ray_block,
                                                 interpret=interpret)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # cl_list, count, tn_sorted
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # cstack stays in HBM
                pl.BlockSpec((NUM_FEATURES, ray_block),
                             lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, NUM_FEATURES, 4 * tri_block), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        t_out, i_out = pl.pallas_call(
            partial(_streamed_kernel, tri_block),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((1, f.shape[1]), jnp.float32),
                jax.ShapeDtypeStruct((1, f.shape[1]), jnp.int32),
            ],
            interpret=interpret,
        )(order, count, tn_sorted, cstack, f, insp, seedp,
          jnp.full((1,), tmin, jnp.float32))
        t_parts.append(t_out[0])
        i_parts.append(i_out[0])
    t_s = jnp.concatenate(t_parts)[:n]
    idx_s = jnp.take(orig_of, jnp.concatenate(i_parts)[:n])
    _, t_fin, idx_fin = jax.lax.sort((back, t_s, idx_s), num_keys=1)
    return t_fin, idx_fin


# ---------------------------------------------------------------------------
# Sphere cluster culling: the same compacted-list streaming design applied
# to the sphere quadratic sweep. This is what makes the reference's BVH
# scaling table (scene.cpp:109-113, random_scene up to 1M spheres) reachable
# on TPU: per-ray MXU work tracks geometrically-relevant clusters instead
# of total sphere count.
# ---------------------------------------------------------------------------

SPH_CULL_BLOCK = 128


def sph_cull_build(scene, coeffs, block: int | None = None):
    """Morton-order spheres into clusters of `block` with AABBs.

    coeffs: (cb, cc) from sphere_coefficients (UNpermuted). Sphere AABBs
    span both motion endpoints (sphere.h bounding over [c0, c1]) with
    half-width |r| (negative radius = hollow shell, same bounds). Returns
    ((cbp, ccp) permuted padded (Spad, F) tables, bounds (8, NC),
    orig_of (Spad,), cstack (F, NC*2*block) transposed stacked table). Inactive spheres sort last, keep
    their never-hit coefficients, and contribute inverted AABBs.
    block=None picks the smallest power of two keeping NC <= 512 (the
    prefetched per-ray-block cluster lists live in SMEM, which bounds NC;
    cluster size is the BVH leaf-size tradeoff).
    """
    cb, cc = coeffs
    s_count = scene.sph_radius.shape[0]
    if block is None:
        block = SPH_CULL_BLOCK
        while s_count > 512 * block:
            block *= 2
    act = scene.sph_active.astype(bool)
    c0x, c0y, c0z = (scene.sph_c0[:, a] for a in range(3))
    c1x, c1y, c1z = (scene.sph_c1[:, a] for a in range(3))
    mov = scene.sph_moving > 0
    r_abs = jnp.abs(scene.sph_radius)
    big = jnp.float32(INF)

    cen = V3((c0x + jnp.where(mov, c1x, c0x)) * 0.5,
             (c0y + jnp.where(mov, c1y, c0y)) * 0.5,
             (c0z + jnp.where(mov, c1z, c0z)) * 0.5)

    def qaxis(c):
        lo = jnp.min(jnp.where(act, c, big))
        hi = jnp.max(jnp.where(act, c, -big))
        tq = jnp.clip((c - lo) / jnp.maximum(hi - lo, 1e-30), 0.0, 0.999999)
        return (tq * 1024.0).astype(jnp.uint32)

    key = (
        (_spread3(qaxis(cen.x)) << jnp.uint32(2))
        | (_spread3(qaxis(cen.y)) << jnp.uint32(1))
        | _spread3(qaxis(cen.z))
    )
    key = jnp.where(act, key, jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(key).astype(jnp.int32)

    rem = (-s_count) % block
    orig_of = (jnp.concatenate([perm, jnp.zeros((rem,), jnp.int32)])
               if rem else perm)

    cbp = _pad_to(jnp.take(cb, perm, axis=0), block, 0, 0.0)
    ccp = _pad_to(jnp.take(cc, perm, axis=0), block, 0, 0.0)
    nc = cbp.shape[0] // block
    # (F, NC*2*block) TRANSPOSED for 128-aligned lane-axis DMA slices
    cstack = jnp.concatenate(
        [cbp.reshape(nc, block, SPH_FEATURES),
         ccp.reshape(nc, block, SPH_FEATURES)], axis=1
    ).reshape(nc * 2 * block, SPH_FEATURES).T

    los, his = [], []
    for clo, chi in ((c0x, c1x), (c0y, c1y), (c0z, c1z)):
        lo_c = jnp.minimum(clo, jnp.where(mov, chi, clo)) - r_abs
        hi_c = jnp.maximum(clo, jnp.where(mov, chi, clo)) + r_abs
        lo_p = _pad_to(jnp.take(jnp.where(act, lo_c, big), perm), block, 0, big)
        hi_p = _pad_to(jnp.take(jnp.where(act, hi_c, -big), perm), block, 0, -big)
        los.append(jnp.min(lo_p.reshape(nc, block), axis=1))
        his.append(jnp.max(hi_p.reshape(nc, block), axis=1))
    zero = jnp.zeros((nc,), jnp.float32)
    bounds = jnp.stack(los + his + [zero, zero], axis=0)  # (8, NC)
    return (cbp, ccp), bounds, orig_of, cstack


def _sph_streamed_kernel(sph_block, cl_ref, cnt_ref, tnm_ref, cstack_hbm,
                         f_ref, inside_ref, seed_ref, tmin_ref,
                         t_out_ref, i_out_ref, buf_ref, sem_ref):
    i = pl.program_id(0)
    f = f_ref[:]  # (SPH_FEATURES, NB)
    inside = inside_ref[:]
    tmin = tmin_ref[0]
    cnt = cnt_ref[i]
    hi = _PRECISION
    rows = 2 * sph_block

    def dma(slot, s):
        # transposed (F, NC*2*sb) table: DMA slices the 128-aligned lane axis
        return pltpu.make_async_copy(
            cstack_hbm.at[:, pl.ds(cl_ref[i, s] * rows, rows)],
            buf_ref.at[slot], sem_ref.at[slot],
        )

    @pl.when(cnt > 0)
    def _():
        dma(0, 0).start()

    def cond(c):
        s, best_t, _ = c
        return (s < cnt) & (tnm_ref[i, s] < jnp.max(best_t))

    def body(c):
        s, best_t, best_i = c
        slot = jax.lax.rem(s, jnp.int32(2))

        @pl.when(s + 1 < cnt)
        def _():
            dma(1 - slot, s + 1).start()

        dma(slot, s).wait()
        blk = buf_ref[slot]  # (F, 2*sb) transposed cluster block
        res = jax.lax.dot_general(
            blk, f, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=hi,
        )  # (2*sb, NB)
        b = res[0 * sph_block : 1 * sph_block]
        cq = res[1 * sph_block : 2 * sph_block]

        disc = b * b - cq
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_front = -b - sq
        t_back = -b + sq
        ok = disc > 0.0
        front_ok = ok & (t_front > tmin)
        back_ok = ok & (inside > 0.0) & (t_back > tmin)
        cand = jnp.where(front_ok, t_front, jnp.where(back_ok, t_back, INF))
        local_min = jnp.min(cand, axis=0, keepdims=True)
        local_arg = (
            jnp.argmin(cand, axis=0).astype(jnp.int32)[None, :]
            + cl_ref[i, s] * sph_block
        )
        better = local_min < best_t
        return (
            s + 1,
            jnp.where(better, local_min, best_t),
            jnp.where(better, local_arg, best_i),
        )

    best_t0 = seed_ref[:]
    best_i0 = jnp.zeros(best_t0.shape, jnp.int32)
    k, bt, bi = jax.lax.while_loop(
        cond, body, (jnp.int32(0), best_t0, best_i0)
    )

    @pl.when((cnt > 0) & (k < cnt))
    def _():
        dma(jax.lax.rem(k, jnp.int32(2)), k).wait()

    t_out_ref[:] = bt
    i_out_ref[:] = bi


@partial(jax.jit, static_argnames=("interpret", "ray_block", "dir_key",
                                   "origin_bits"))
def flash_sphere_hit_streamed(cull, ro: V3, rd: V3, time, inside, tmin,
                              t_seed=None, *, ray_block: int = RAY_BLOCK,
                              dir_key: bool = False, origin_bits: int = 5,
                              interpret: bool = False):
    """Closest sphere hit, HBM-streamed compacted cluster sweep.

    Exact same results as flash_sphere_hit (front root; back root only when
    inside — sphere.cpp:33-43), at per-ray cost proportional to relevant
    clusters. Scales to reference BVH-table sizes (scene.cpp:109-113)."""
    cds, bounds, orig_of, cstack = cull
    del cds
    nc = bounds.shape[1]
    sph_block = cstack.shape[1] // (2 * nc)

    n = ro.x.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    inside_f = (inside > 0).astype(jnp.float32)
    seed = jnp.full((n,), INF) if t_seed is None else t_seed
    key = _ray_sort_key(ro, rd, bounds, dir_key=dir_key,
                        origin_bits=origin_bits)
    (skey, rox, roy, roz, rdx, rdy, rdz, stime, insf, sseed, back) = \
        jax.lax.sort(
            (key, ro.x, ro.y, ro.z, rd.x, rd.y, rd.z, time, inside_f, seed,
             iota),
            num_keys=1,
        )

    f_all = _pad_to(
        sphere_ray_features(V3(rox, roy, roz), V3(rdx, rdy, rdz), stime),
        ray_block, 1, 0.0,
    )
    insp_all = _pad_to(insf[None, :], ray_block, 1, 0.0)
    seedp_all = _pad_to(sseed[None, :], ray_block, 1, INF)
    n_pad = f_all.shape[1]

    # ray chunks of <=128 blocks per pallas_call (SMEM list budget; see
    # flash_tri_hit_streamed)
    chunk = 128 * ray_block
    t_parts, i_parts = [], []
    for r0 in range(0, n_pad, chunk):
        f = f_all[:, r0 : r0 + chunk]
        insp = insp_all[:, r0 : r0 + chunk]
        seedp = seedp_all[:, r0 : r0 + chunk]
        nb = f.shape[1] // ray_block
        order, count, tn_sorted = _compact_lists(bounds, f, seedp, tmin,
                                                 ray_block,
                                                 interpret=interpret)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # cstack stays in HBM
                pl.BlockSpec((SPH_FEATURES, ray_block),
                             lambda i, *_: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ray_block), lambda i, *_: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, SPH_FEATURES, 2 * sph_block), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        t_out, i_out = pl.pallas_call(
            partial(_sph_streamed_kernel, sph_block),
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((1, f.shape[1]), jnp.float32),
                jax.ShapeDtypeStruct((1, f.shape[1]), jnp.int32),
            ],
            interpret=interpret,
        )(order, count, tn_sorted, cstack, f, insp, seedp,
          jnp.full((1,), tmin, jnp.float32))
        t_parts.append(t_out[0])
        i_parts.append(i_out[0])
    t_s = jnp.concatenate(t_parts)[:n]
    idx_s = jnp.take(orig_of, jnp.concatenate(i_parts)[:n])
    _, t_fin, idx_fin = jax.lax.sort((back, t_s, idx_s), num_keys=1)
    return t_fin, idx_fin


def _sph_gated_kernel(bnd_ref, cb_ref, cc_ref, f_ref, inside_ref, tmin_ref,
                      t_out_ref, i_out_ref, best_t_ref, best_i_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_t_ref[:] = jnp.full_like(best_t_ref, INF)
        best_i_ref[:] = jnp.zeros_like(best_i_ref)

    f = f_ref[:]  # (F, NB)
    tmin = tmin_ref[0]
    # per-(ray-block, cluster) slab gate with best-t early-out; bounds are
    # SMEM scalars, rays unsorted (the mid-count sweet spot: few enough
    # clusters that per-tile gating beats list compaction's sort+pre-pass)
    tnear = None
    tfar = None
    for a in range(3):
        ro_a = f[1 + a : 2 + a, :]
        ird_a = 1.0 / f[4 + a : 5 + a, :]
        t0a = (bnd_ref[a, j] - ro_a) * ird_a
        t1a = (bnd_ref[3 + a, j] - ro_a) * ird_a
        lo_a = jnp.minimum(t0a, t1a)
        hi_a = jnp.maximum(t0a, t1a)
        tnear = lo_a if tnear is None else jnp.maximum(tnear, lo_a)
        tfar = hi_a if tfar is None else jnp.minimum(tfar, hi_a)
    hit_c = (tfar > jnp.maximum(tnear, tmin)) & (tnear < best_t_ref[:])

    @pl.when(jnp.any(hit_c))
    def _():
        hi = _PRECISION
        b = jnp.dot(cb_ref[:], f, preferred_element_type=jnp.float32,
                    precision=hi)
        c = jnp.dot(cc_ref[:], f, preferred_element_type=jnp.float32,
                    precision=hi)
        inside = inside_ref[:]
        disc = b * b - c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        t_front = -b - sq
        t_back = -b + sq
        ok = disc > 0.0
        front_ok = ok & (t_front > tmin)
        back_ok = ok & (inside > 0.0) & (t_back > tmin)
        cand = jnp.where(front_ok, t_front, jnp.where(back_ok, t_back, INF))
        local_min = jnp.min(cand, axis=0, keepdims=True)
        local_arg = (
            jnp.argmin(cand, axis=0).astype(jnp.int32)[None, :]
            + j * cand.shape[0]
        )
        better = local_min < best_t_ref[:]
        best_t_ref[:] = jnp.where(better, local_min, best_t_ref[:])
        best_i_ref[:] = jnp.where(better, local_arg, best_i_ref[:])

    @pl.when(j == nj - 1)
    def _():
        t_out_ref[:] = best_t_ref[:]
        i_out_ref[:] = best_i_ref[:]


@partial(jax.jit, static_argnames=("interpret",))
def flash_sphere_hit_gated(cull, ro: V3, rd: V3, time, inside, tmin, *,
                           interpret: bool = False):
    """Closest sphere hit with per-(ray-block, cluster) AABB gating and a
    best-t early-out — no ray sorting or list compaction. Exact same
    results as flash_sphere_hit. The mid-count path (~0.5-4k spheres,
    e.g. book2's 1k-sphere cloud): the dense sweep pays every cluster on
    every block, while full compaction's sort+pre-pass overhead exceeds
    its savings at these sizes (measured round 2)."""
    (cbp, ccp), bounds, orig_of, cstack = cull
    del cstack
    nc = bounds.shape[1]
    sph_block = cbp.shape[0] // nc
    n = ro.x.shape[0]
    f = _pad_to(sphere_ray_features(ro, rd, time), RAY_BLOCK, 1, 0.0)
    inside_f = _pad_to(
        (inside > 0).astype(jnp.float32)[None, :], RAY_BLOCK, 1, 0.0
    )
    n_pad = f.shape[1]
    grid = (n_pad // RAY_BLOCK, nc)
    c_spec = pl.BlockSpec((sph_block, SPH_FEATURES), lambda i, j: (j, 0),
                          memory_space=pltpu.VMEM)
    t_out, i_out = pl.pallas_call(
        _sph_gated_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bounds (8, NC)
            c_spec, c_spec,
            pl.BlockSpec((SPH_FEATURES, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
        ],
        interpret=interpret,
    )(bounds, cbp, ccp, f, inside_f, jnp.full((1,), tmin, jnp.float32))
    return t_out[0, :n], jnp.take(orig_of, i_out[0, :n])


def _pad_to(x, mult, axis, value):
    size = x.shape[axis]
    rem = (-size) % mult
    if rem == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return jnp.pad(x, widths, constant_values=value)


@partial(jax.jit, static_argnames=("interpret",))
def flash_tri_hit(coeffs, ro: V3, rd: V3, inside, tmin, *, interpret=False):
    """Closest triangle hit over ALL triangles for each ray.

    coeffs: (c_det, c_uu, c_vv, c_tn) each (T, 16) from `tri_coefficients`.
    Returns (t (N,) with INF miss, idx (N,) i32).
    """
    c_det, c_uu, c_vv, c_tn = coeffs
    n = ro.x.shape[0]
    f = ray_features(ro, rd)  # (16, N)
    f = _pad_to(f, RAY_BLOCK, 1, 0.0)
    inside_f = _pad_to(
        (inside > 0).astype(jnp.float32)[None, :], RAY_BLOCK, 1, 0.0
    )
    cds = [_pad_to(c, TRI_BLOCK, 0, 0.0) for c in (c_det, c_uu, c_vv, c_tn)]
    n_pad = f.shape[1]
    t_pad = cds[0].shape[0]
    grid = (n_pad // RAY_BLOCK, t_pad // TRI_BLOCK)

    c_spec = pl.BlockSpec(
        (TRI_BLOCK, NUM_FEATURES), lambda i, j: (j, 0), memory_space=pltpu.VMEM
    )
    t_out, i_out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            c_spec, c_spec, c_spec, c_spec,
            pl.BlockSpec((NUM_FEATURES, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
        ],
        interpret=interpret,
    )(cds[0], cds[1], cds[2], cds[3], f, inside_f, jnp.full((1,), tmin, jnp.float32))
    return t_out[0, :n], i_out[0, :n]


@partial(jax.jit, static_argnames=("interpret",))
def flash_sphere_hit(coeffs, ro: V3, rd: V3, time, inside, tmin, *, interpret=False):
    """Closest sphere hit over ALL spheres for each ray (front root, back
    root only when inside — sphere.cpp:33-43). Returns (t, idx)."""
    cb, cc = coeffs
    n = ro.x.shape[0]
    f = _pad_to(sphere_ray_features(ro, rd, time), RAY_BLOCK, 1, 0.0)
    inside_f = _pad_to(
        (inside > 0).astype(jnp.float32)[None, :], RAY_BLOCK, 1, 0.0
    )
    cbs = _pad_to(cb, TRI_BLOCK, 0, 0.0)
    # pad cc with +INF/2 const col? padding rows are all-zero -> disc = b^2
    # with b = 0 -> disc = 0 -> not > 0 -> invalid. Safe as-is.
    ccs = _pad_to(cc, TRI_BLOCK, 0, 0.0)
    n_pad = f.shape[1]
    s_pad = cbs.shape[0]
    grid = (n_pad // RAY_BLOCK, s_pad // TRI_BLOCK)

    c_spec = pl.BlockSpec(
        (TRI_BLOCK, SPH_FEATURES), lambda i, j: (j, 0), memory_space=pltpu.VMEM
    )
    t_out, i_out = pl.pallas_call(
        _sphere_kernel,
        grid=grid,
        in_specs=[
            c_spec, c_spec,
            pl.BlockSpec((SPH_FEATURES, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
        ],
        interpret=interpret,
    )(cbs, ccs, f, inside_f, jnp.full((1,), tmin, jnp.float32))
    return t_out[0, :n], i_out[0, :n]


# ---------------------------------------------------------------------------
# Hand-derived backward passes (north-star: custom VJP for the traversal/
# intersection megakernel). The hit parameter t of the WINNING primitive is
# the only continuous output — visibility/winner selection is discrete and
# stop-gradiented (differentiate continuous factors only). Gradients:
#   triangles: t = tn/det  =>  dt = (dtn - t*ddet)/det
#   spheres:   t = -b + s*sqrt(b^2-c), s = root sign
#              =>  dt/db = -1 + s*b/sq,  dt/dc = -s/(2*sq)
# Cotangents w.r.t. coefficient tables are scatter-adds over winner rows,
# computed as one-hot matmuls (the transpose of the forward lookup — MXU,
# not TPU scatters); cotangents w.r.t. rays chain through jax.vjp of the
# feature constructors.
# ---------------------------------------------------------------------------


def _rows_at(table, idx):
    """(T, F) coefficient table -> (N, F) winner rows via MXU lookup."""
    from miniraytracer_tpu.ops.lookup import lookup_cols

    cols = lookup_cols(idx, tuple(table[:, k] for k in range(table.shape[1])))
    return jnp.stack(cols, axis=1)


def _scatter_rows(idx, w, t_rows):
    """sum_n 1{idx[n]=r} * w[n, :] -> (t_rows, F), as chunked one-hot matmul
    on TPU (exact; scatter-add elsewhere)."""
    if jax.default_backend() != "tpu":
        return jnp.zeros((t_rows, w.shape[1]), w.dtype).at[idx].add(w)
    out = jnp.zeros((t_rows, w.shape[1]), jnp.float32)
    idx32 = idx.astype(jnp.int32)
    kc = 2048
    for c0 in range(0, t_rows, kc):
        c1 = min(c0 + kc, t_rows)
        rows = jnp.arange(c0, c1, dtype=jnp.int32)
        onehot = (rows[:, None] == idx32[None, :]).astype(jnp.float32)  # (kc, N)
        out = out.at[c0:c1].set(
            jnp.dot(onehot, w, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
        )
    return out


@jax.custom_vjp
def flash_tri_hit_d(coeffs, ro, rd, inside, tmin):
    """Differentiable flash_tri_hit (gradients w.r.t. coeffs and rays)."""
    return flash_tri_hit(coeffs, ro, rd, inside, tmin)


def _tri_fwd(coeffs, ro, rd, inside, tmin):
    t, idx = flash_tri_hit(coeffs, ro, rd, inside, tmin)
    return (t, idx), (coeffs, ro, rd, t, idx)


def _tri_bwd(res, cot):
    (c_det, c_uu, c_vv, c_tn), ro, rd, t, idx = res
    gt, _ = cot  # winner index is discrete
    hit = t < INF * 0.5
    # non-hit lanes contribute exactly zero, but their residual state may be
    # NaN (the callers pass NaN-masked origins for dead lanes) and their
    # winner index is the miss placeholder 0 — without masking, the
    # 0-weight x NaN-feature products scatter NaN into primitive row 0's
    # cotangent (measured: book2's ext-AD grads_finite=False on-chip).
    # Mask the PRIMALS so every downstream product is finite; the returned
    # d_ro/d_rd for non-hit lanes are genuinely zero (no continuous
    # dependence), so this is the true gradient, not an approximation.
    ro = V3(*(jnp.where(hit, c, 0.0) for c in (ro.x, ro.y, ro.z)))
    rd = V3(*(jnp.where(hit, c, 1.0) for c in (rd.x, rd.y, rd.z)))
    idx = jnp.where(hit, idx, 0)
    f, feat_vjp = jax.vjp(ray_features, ro, rd)  # f: (16, N)
    rows_det = _rows_at(c_det, idx)  # (N, 16)
    rows_tn = _rows_at(c_tn, idx)
    det_w = jnp.sum(rows_det * f.T, axis=1)
    safe_det = jnp.where(jnp.abs(det_w) > TRI_EPS, det_w, 1.0)
    g = jnp.where(hit, gt / safe_det, 0.0)  # (N,)
    ts = jnp.where(hit, t, 0.0)
    # dL/dF (16, N): g * (C_tn[idx] - t*C_det[idx]) rows
    df = (rows_tn - rows_det * ts[:, None]).T * g[None, :]
    d_ro, d_rd = feat_vjp(df)
    # dL/dC rows: scatter g*F (for tn) and -g*t*F (for det)
    w_tn = f.T * g[:, None]
    d_c_tn = _scatter_rows(idx, w_tn, c_tn.shape[0])
    d_c_det = _scatter_rows(idx, -w_tn * ts[:, None], c_det.shape[0])
    zeros_c = jnp.zeros_like(c_uu)
    return (d_c_det, zeros_c, zeros_c, d_c_tn), d_ro, d_rd, None, None


flash_tri_hit_d.defvjp(_tri_fwd, _tri_bwd)


@jax.custom_vjp
def flash_sphere_hit_d(coeffs, ro, rd, time, inside, tmin):
    """Differentiable flash_sphere_hit."""
    return flash_sphere_hit(coeffs, ro, rd, time, inside, tmin)


def _sph_fwd(coeffs, ro, rd, time, inside, tmin):
    t, idx = flash_sphere_hit(coeffs, ro, rd, time, inside, tmin)
    return (t, idx), (coeffs, ro, rd, time, t, idx)


def _sph_bwd(res, cot):
    (cb, cc), ro, rd, time, t, idx = res
    gt, _ = cot
    hit = t < INF * 0.5
    # mask NaN residuals / miss-placeholder winner index off the non-hit
    # lanes (see _tri_bwd): 0-weight x NaN-feature otherwise scatters NaN
    # into row 0's cotangent and d_time
    ro = V3(*(jnp.where(hit, c, 0.0) for c in (ro.x, ro.y, ro.z)))
    rd = V3(*(jnp.where(hit, c, 1.0) for c in (rd.x, rd.y, rd.z)))
    time = jnp.where(hit, time, 0.0)
    idx = jnp.where(hit, idx, 0)
    f, feat_vjp = jax.vjp(sphere_ray_features, ro, rd, time)
    rows_b = _rows_at(cb, idx)
    rows_c = _rows_at(cc, idx)
    b_w = jnp.sum(rows_b * f.T, axis=1)
    c_w = jnp.sum(rows_c * f.T, axis=1)
    disc = b_w * b_w - c_w
    sq = jnp.sqrt(jnp.where(disc > 1e-12, disc, 1.0))
    sq_ok = disc > 1e-12
    # root sign: t_front = -b - sq <= -b <= t_back
    s = jnp.where(t + b_w > 0, 1.0, -1.0)
    dt_db = jnp.where(sq_ok, -1.0 + s * b_w / sq, 0.0)
    dt_dc = jnp.where(sq_ok, -s / (2.0 * sq), 0.0)
    g = jnp.where(hit, gt, 0.0)
    df = (rows_b * (g * dt_db)[:, None] + rows_c * (g * dt_dc)[:, None]).T
    d_ro, d_rd, d_time = feat_vjp(df)
    d_cb = _scatter_rows(idx, f.T * (g * dt_db)[:, None], cb.shape[0])
    d_cc = _scatter_rows(idx, f.T * (g * dt_dc)[:, None], cc.shape[0])
    return (d_cb, d_cc), d_ro, d_rd, d_time, None, None


flash_sphere_hit_d.defvjp(_sph_fwd, _sph_bwd)


# ---------------------------------------------------------------------------
# Differentiable CULLED variants: the backward depends only on (coeffs,
# rays, winner) — not on how the forward found the winner — so the cluster
# kernels slot under the SAME hand-derived VJPs. The cull tables are
# value-redundant with `coeffs` (permuted copies + AABBs), so their
# cotangent is zero and all scene-parameter gradient flows through the
# coeffs argument. Big-mesh scenes then train at culled-forward speed.
# ---------------------------------------------------------------------------


def tri_hit_culled_auto(cull, ro, rd, inside, tmin, t_seed=None):
    """Resident when the tables fit VMEM, HBM-streamed otherwise."""
    if resident_ok(cull):
        return flash_tri_hit_resident(cull, ro, rd, inside, tmin, t_seed)
    return flash_tri_hit_streamed(cull, ro, rd, inside, tmin, t_seed)


def sphere_hit_culled_auto(cull, ro, rd, time, inside, tmin):
    """Gated (unsorted) below the list-compaction crossover, streamed above
    (measured round 2: compaction loses under ~4k spheres)."""
    if cull[0][0].shape[0] < 4096:  # padded sphere count
        return flash_sphere_hit_gated(cull, ro, rd, time, inside, tmin)
    return flash_sphere_hit_streamed(cull, ro, rd, time, inside, tmin)


def _tri_hit_culled_ad_fwd(cull, ro, rd, inside, tmin):
    """Forward kernel choice for the DIFFERENTIABLE path: always the
    HBM-streamed kernel, never the resident one. Under reverse AD the
    coefficient tables are functions of the differentiable scene params,
    so XLA cannot hoist them out of the bounce scan — the resident
    kernel's whole-table VMEM operands then get stack-allocated per scan
    iteration with 16->128 lane padding (4 x 5.8 MB) and the compile dies
    with a scoped-vmem OOM (measured round 4, triangles 500x500 train
    step). The streamed kernel keeps tables in HBM (pl.ANY) and DMAs
    per-cluster blocks, so its scoped footprint is the double buffer."""
    return flash_tri_hit_streamed(cull, ro, rd, inside, tmin)


@jax.custom_vjp
def flash_tri_hit_culled_d(cull, coeffs, ro, rd, inside, tmin):
    """Differentiable closest-hit via the culled kernels (exact same
    results as flash_tri_hit_d; forward cost tracks relevant clusters)."""
    del coeffs  # value-redundant with cull; used by the backward
    return _tri_hit_culled_ad_fwd(cull, ro, rd, inside, tmin)


def _tri_culled_fwd(cull, coeffs, ro, rd, inside, tmin):
    t, idx = _tri_hit_culled_ad_fwd(cull, ro, rd, inside, tmin)
    return (t, idx), (coeffs, ro, rd, t, idx)


def _tri_culled_bwd(res, cot):
    d_coeffs, d_ro, d_rd, _, _ = _tri_bwd(res, cot)
    return None, d_coeffs, d_ro, d_rd, None, None


flash_tri_hit_culled_d.defvjp(_tri_culled_fwd, _tri_culled_bwd)


@jax.custom_vjp
def flash_sphere_hit_culled_d(cull, coeffs, ro, rd, time, inside, tmin):
    """Differentiable closest sphere hit via the culled kernels."""
    del coeffs
    return sphere_hit_culled_auto(cull, ro, rd, time, inside, tmin)


def _sph_culled_fwd(cull, coeffs, ro, rd, time, inside, tmin):
    t, idx = sphere_hit_culled_auto(cull, ro, rd, time, inside, tmin)
    return (t, idx), (coeffs, ro, rd, time, t, idx)


def _sph_culled_bwd(res, cot):
    d_coeffs, d_ro, d_rd, d_time, _, _ = _sph_bwd(res, cot)
    return None, d_coeffs, d_ro, d_rd, d_time, None, None


flash_sphere_hit_culled_d.defvjp(_sph_culled_fwd, _sph_culled_bwd)


# ---------------------------------------------------------------------------
# Box closest-hit with a hand-derived VJP (reference box.h:12-21 via the
# one-sided rect faces, rect.cpp:26-107). The FORWARD stays the plain XLA
# slab sweep (measured ~2% of a book2 frame once fused — no Pallas kernel
# needed); what the custom VJP buys is the BACKWARD: XLA's autodiff
# transpose of the (6 faces x boxes x lanes) candidate grid, recomputed
# under jax.checkpoint, was the measured floor of book2's train step
# (0.79 Mrays/s fwd+bwd, round-4 README AD table). Here the backward
# re-derives only the WINNER face per lane — O(lanes) — and scatters 11
# per-lane scalars into the box tables with one one-hot MXU matmul.
#
#   local frame:  lo = R(ro - off), ld = R rd  (R = baked rotate_y,
#                 box_cs = (sin, cos); intersect._box_local_rays)
#   winner face:  axis a, bound b in {box_lo[a], box_hi[a]}
#   t = (b - lo_a) / ld_a
#     dt/db     =  1/ld_a
#     dt/dlo_a  = -1/ld_a
#     dt/dld_a  = -t/ld_a
# then lo_a/ld_a chain linearly to (ro, rd, off, sin, cos). The face
# bounds entering only the VALIDITY tests are discrete decisions (stop-
# gradient), same policy as the sphere/triangle kernels above.
# ---------------------------------------------------------------------------


def _box_sweep_raw(blo, bhi, bcs, boff, bact, ro, rd, tmin):
    """Closest box hit over all boxes: (t (N,), idx (N,)) — INF on miss.
    Plain XLA, identical math to intersect.box_ts (shim scene)."""
    import types as _pytypes

    from miniraytracer_tpu.ops import intersect as ix

    n = ro.x.shape[0]
    nb = blo.shape[0]
    shim = _pytypes.SimpleNamespace(
        box_lo=blo, box_hi=bhi, box_cs=bcs, box_off=boff, box_active=bact)
    rays = ix.Rays(ro=ro, rd=rd,
                   time=jnp.zeros((n,), jnp.float32),
                   inside=jnp.zeros((n,), jnp.int32))
    tmax0 = jnp.full((n,), INF)
    return ix._chunked_min(
        lambda s, c: ix.box_ts(shim, rays, s, c, tmin, tmax0), nb, n)


@jax.custom_vjp
def box_hit_d(blo, bhi, bcs, boff, bact, ro, rd, tmin):
    """Differentiable closest box hit (gradients w.r.t. the box tables and
    the rays; winner index is discrete)."""
    return _box_sweep_raw(blo, bhi, bcs, boff, bact, ro, rd, tmin)


def _box_fwd(blo, bhi, bcs, boff, bact, ro, rd, tmin):
    t, idx = _box_sweep_raw(blo, bhi, bcs, boff, bact, ro, rd, tmin)
    return (t, idx), (blo, bhi, bcs, boff, ro, rd, t, idx)


def _box_bwd(res, cot):
    from miniraytracer_tpu.ops import intersect as ix
    from miniraytracer_tpu.ops.lookup import lookup_cols

    blo, bhi, bcs, boff, ro, rd, t, idx = res
    gt, _ = cot
    hit = t < INF * 0.5
    # mask NaN residuals / miss-placeholder index off non-hit lanes (see
    # _tri_bwd): their gradient is genuinely zero, and unmasked NaN
    # features would scatter NaN into box row 0's cotangent
    rox, roy, roz = (jnp.where(hit, c, 0.0) for c in (ro.x, ro.y, ro.z))
    rdx, rdy, rdz = (jnp.where(hit, c, 1.0) for c in (rd.x, rd.y, rd.z))
    idx = jnp.where(hit, idx, 0)
    ts = jnp.where(hit, t, 0.0)
    (lox, loy, loz, hix, hiy, hiz, sn, cs, ofx, ofy, ofz) = lookup_cols(
        idx, (blo[:, 0], blo[:, 1], blo[:, 2],
              bhi[:, 0], bhi[:, 1], bhi[:, 2],
              bcs[:, 0], bcs[:, 1],
              boff[:, 0], boff[:, 1], boff[:, 2]))
    ox = rox - ofx
    oy = roy - ofy
    oz = roz - ofz
    lo = (cs * ox - sn * oz, oy, cs * oz + sn * ox)
    ld = (cs * rdx - sn * rdz, rdy, cs * rdz + sn * rdx)
    # winner face: re-derive by nearest candidate (intersect.box_record)
    cands = ix._box_face_ts(lo, ld, (lox, loy, loz), (hix, hiy, hiz))
    face = jnp.argmin(jnp.abs(cands - ts[None, :]), axis=0)
    axis = face // 2
    is_min = (face % 2) == 0
    ld_a = jnp.where(axis == 0, ld[0], jnp.where(axis == 1, ld[1], ld[2]))
    inv = 1.0 / jnp.where(jnp.abs(ld_a) > 1e-12, ld_a,
                          jnp.where(ld_a >= 0, 1e-12, -1e-12))
    g = jnp.where(hit, gt, 0.0)
    d_bound = g * inv
    d_lo_a = -d_bound
    d_ld_a = -g * ts * inv
    # chain through the local transform, per axis:
    #   a=0: lo0 = cs*ox - sn*oz, ld0 = cs*rdx - sn*rdz
    #   a=1: lo1 = oy,            ld1 = rdy
    #   a=2: lo2 = cs*oz + sn*ox, ld2 = cs*rdz + sn*rdx
    a0 = axis == 0
    a1 = axis == 1
    a2 = axis == 2
    z = jnp.zeros_like(g)
    dl0 = jnp.where(a0, d_lo_a, z)
    dl1 = jnp.where(a1, d_lo_a, z)
    dl2 = jnp.where(a2, d_lo_a, z)
    dd0 = jnp.where(a0, d_ld_a, z)
    dd1 = jnp.where(a1, d_ld_a, z)
    dd2 = jnp.where(a2, d_ld_a, z)
    d_rox = dl0 * cs + dl2 * sn
    d_roy = dl1
    d_roz = -dl0 * sn + dl2 * cs
    d_rdx = dd0 * cs + dd2 * sn
    d_rdy = dd1
    d_rdz = -dd0 * sn + dd2 * cs
    d_sn = -dl0 * oz + dl2 * ox - dd0 * rdz + dd2 * rdx
    d_cs = dl0 * ox + dl2 * oz + dd0 * rdx + dd2 * rdz
    mn = jnp.where(is_min, 1.0, 0.0)
    mx = 1.0 - mn
    w = jnp.stack([
        jnp.where(a0, d_bound * mn, z), jnp.where(a1, d_bound * mn, z),
        jnp.where(a2, d_bound * mn, z),
        jnp.where(a0, d_bound * mx, z), jnp.where(a1, d_bound * mx, z),
        jnp.where(a2, d_bound * mx, z),
        d_sn, d_cs,
        -d_rox, -d_roy, -d_roz,  # off enters as (ro - off)
    ], axis=1)  # (N, 11)
    rows = _scatter_rows(idx, w, blo.shape[0])
    d_blo = rows[:, 0:3]
    d_bhi = rows[:, 3:6]
    d_bcs = rows[:, 6:8]
    d_boff = rows[:, 8:11]
    d_ro = V3(d_rox, d_roy, d_roz)
    d_rd = V3(d_rdx, d_rdy, d_rdz)
    return d_blo, d_bhi, d_bcs, d_boff, None, d_ro, d_rd, None


box_hit_d.defvjp(_box_fwd, _box_bwd)
