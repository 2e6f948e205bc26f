import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.ops import intersect as ix
from miniraytracer_tpu.scene import types as T
from miniraytracer_tpu.ops.vecmath import V3
from miniraytracer_tpu.scene.builder import SceneBuilder


def mk_rays(origins, dirs, time=0.0, inside=0):
    ro = jnp.asarray(np.atleast_2d(origins), jnp.float32)
    rd = jnp.asarray(np.atleast_2d(dirs), jnp.float32)
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    n = ro.shape[0]
    return ix.Rays(
        ro=V3.from_arr(ro),
        rd=V3.from_arr(rd),
        time=jnp.full((n,), time, jnp.float32),
        inside=jnp.full((n,), inside, jnp.int32),
    )


def base_builder():
    b = SceneBuilder()
    b.set_camera([0, 0, 0], [0, 0, -1], [0, 1, 0], 40, 1.0, 0.0, 1.0, 0.0, 1.0)
    return b


def test_sphere_hit_front_and_miss():
    b = base_builder()
    m = b.lambertian(b.tex_const([1, 0, 0]))
    b.sphere([0, 0, -5], 1.0, m)
    scene = b.build()
    rays = mk_rays([[0, 0, 0], [0, 3, 0]], [[0, 0, -1], [0, 0, -1]])
    rec = ix.scene_hit(scene, rays)
    assert bool(rec.hit[0]) and not bool(rec.hit[1])
    np.testing.assert_allclose(float(rec.t[0]), 4.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.p.arr[0]), [0, 0, -4], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.n.arr[0]), [0, 0, 1], atol=1e-5)
    # uv: normal (0,0,1): phi=atan2(1,0)=pi/2, u = 0.5 - 0.25 = 0.25; v=0.5
    np.testing.assert_allclose(float(rec.u[0]), 0.25, atol=1e-5)
    np.testing.assert_allclose(float(rec.v[0]), 0.5, atol=1e-5)


def test_sphere_backface_only_when_inside():
    b = base_builder()
    m = b.dielectric(1.5)
    b.sphere([0, 0, 0], 2.0, m)
    scene = b.build()
    # ray starting at center: front root negative, back root +2
    r_out = mk_rays([0, 0, 0], [0, 0, -1], inside=0)
    r_in = mk_rays([0, 0, 0], [0, 0, -1], inside=1)
    rec0 = ix.scene_hit(scene, r_out)
    rec1 = ix.scene_hit(scene, r_in)
    assert not bool(rec0.hit[0])  # sphere.cpp:33 backface needs isInside
    assert bool(rec1.hit[0])
    np.testing.assert_allclose(float(rec1.t[0]), 2.0, rtol=1e-5)


def test_hollow_sphere_negative_radius_flips_normal():
    b = base_builder()
    m = b.dielectric(1.5)
    b.sphere([0, 0, -5], -1.0, m)
    scene = b.build()
    rec = ix.scene_hit(scene, mk_rays([0, 0, 0], [0, 0, -1]))
    assert bool(rec.hit[0])
    np.testing.assert_allclose(np.asarray(rec.n.arr[0]), [0, 0, -1], atol=1e-5)  # inward


def test_moving_sphere_lerp():
    b = base_builder()
    m = b.lambertian(b.tex_const([1, 1, 1]))
    b.sphere([0, 0, -5], 1.0, m, center1=[2, 0, -5], t0=0.0, t1=1.0)
    scene = b.build()
    rec0 = ix.scene_hit(scene, mk_rays([0, 0, 0], [0, 0, -1], time=0.0))
    rec_half = ix.scene_hit(scene, mk_rays([1, 0, 0], [0, 0, -1], time=0.5))
    assert bool(rec0.hit[0]) and bool(rec_half.hit[0])
    np.testing.assert_allclose(float(rec_half.t[0]), 4.0, rtol=1e-5)


def test_rect_one_sided():
    b = base_builder()
    m = b.lambertian(b.tex_const([1, 1, 1]))
    b.xz_rect(0, 5, 0, 5, 2.0, m)  # y=2 plane, normal +y
    scene = b.build()
    from_above = mk_rays([2.5, 5, 2.5], [0, -1, 0])
    from_below = mk_rays([2.5, 0, 2.5], [0, 1, 0])
    rec_a = ix.scene_hit(scene, from_above)
    rec_b = ix.scene_hit(scene, from_below)
    assert bool(rec_a.hit[0]) and not bool(rec_b.hit[0])
    np.testing.assert_allclose(float(rec_a.t[0]), 3.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec_a.n.arr[0]), [0, 1, 0], atol=1e-6)
    np.testing.assert_allclose(float(rec_a.u[0]), 0.5, atol=1e-5)


def test_rect_flipped_ctor_args_flip_normal():
    b = base_builder()
    m = b.lambertian(b.tex_const([1, 1, 1]))
    b.xz_rect(5, 0, 0, 5, 2.0, m)  # x0 > x1 => normal -y (rect.cpp:6-22)
    scene = b.build()
    rec = ix.scene_hit(scene, mk_rays([2.5, 0, 2.5], [0, 1, 0]))
    assert bool(rec.hit[0])
    np.testing.assert_allclose(np.asarray(rec.n.arr[0]), [0, -1, 0], atol=1e-6)


def test_triangle_hit_and_backface_cull():
    b = base_builder()
    m = b.lambertian(b.tex_const([1, 1, 1]))
    # triangle in z=-3 plane with normal +z (ccw as seen from +z)
    b.triangle([-1, -1, -3], [1, -1, -3], [0, 1, -3], m)
    scene = b.build()
    front = mk_rays([0, 0, 0], [0, 0, -1])
    back = mk_rays([0, 0, -6], [0, 0, 1])
    rec_f = ix.scene_hit(scene, front)
    rec_b = ix.scene_hit(scene, back)
    assert bool(rec_f.hit[0]) and not bool(rec_b.hit[0])
    np.testing.assert_allclose(float(rec_f.t[0]), 3.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec_f.n.arr[0]), [0, 0, 1], atol=1e-5)
    # backface hits when inside (triangle.cpp:227-235)
    rec_bi = ix.scene_hit(scene, mk_rays([0, 0, -6], [0, 0, 1], inside=1))
    assert bool(rec_bi.hit[0])


def test_box_is_one_sided_prim():
    """The box primitive (box.h: 6 outward one-sided rects as ONE prim)."""
    b = base_builder()
    m = b.lambertian(b.tex_const([1, 1, 1]))
    b.box([0, 0, 0], [1, 1, 1], m)
    scene = b.build()
    assert scene.n_boxes == 1 and scene.has_boxes
    rec = ix.scene_hit(scene, mk_rays([0.5, 0.5, 3], [0, 0, -1]))
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.n.arr[0]), [0, 0, 1], atol=1e-5)
    # from inside: all faces backfacing -> no hit (matches one-sided rects)
    rec_in = ix.scene_hit(scene, mk_rays([0.5, 0.5, 0.5], [0, 0, -1]))
    assert not bool(rec_in.hit[0])


def test_box_prim_matches_box_tris():
    """Box prim vs the legacy 12-triangle bake: identical hits/normals on
    exterior random rays (the equivalence oracle for the new primitive)."""
    import jax.numpy as jnp

    from miniraytracer_tpu.ops.vecmath import V3 as _V3

    def mk(tris, rot):
        b = base_builder()
        m = b.lambertian(b.tex_const([1, 1, 1]))
        f = b.box_tris if tris else b.box
        f([-1, 0, -1], [1, 1.5, 1], m, rot_y_deg=rot, offset=(0.5, 0, 0.5))
        f([-3, 0, -1], [-2, 2.5, 0], m)
        return b.build()

    rng = np.random.RandomState(1)
    N = 5000
    ro = _V3(*(jnp.asarray(rng.uniform(-4, 4, N).astype(np.float32))
               for _ in range(3)))
    d = rng.normal(size=(3, N)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0)
    rd = _V3(*(jnp.asarray(d[k]) for k in range(3)))
    rays = ix.Rays(ro=ro, rd=rd, time=jnp.zeros((N,)),
                   inside=jnp.zeros((N,), jnp.int32))
    for rot in (0.0, 18.0):
        rt = ix.scene_hit(mk(True, rot), rays)
        rb = ix.scene_hit(mk(False, rot), rays)
        assert (np.asarray(rt.hit) == np.asarray(rb.hit)).all()
        both = np.asarray(rt.hit)
        tt, tb = np.asarray(rt.t)[both], np.asarray(rb.t)[both]
        rel = np.abs(tt - tb) / np.maximum(np.abs(tt), 1e-9)
        assert rel.max() < 1e-4, rel.max()
        for c in "xyz":
            nt = np.asarray(getattr(rt.n, c))[both]
            nb_ = np.asarray(getattr(rb.n, c))[both]
            assert np.abs(nt - nb_).max() < 1e-6


def test_rotated_translated_box():
    b = base_builder()
    m = b.lambertian(b.tex_const([1, 1, 1]))
    b.box([0, 0, 0], [165, 330, 165], m, rot_y_deg=15.0, offset=[265, 0, 295])
    scene = b.build()
    # ray from above center of the box
    cx = 265 + 165 / 2
    cz = 295 + 165 / 2
    rec = ix.scene_hit(scene, mk_rays([cx, 500, cz], [0, -1, 0]))
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 170.0, atol=1.0)
    np.testing.assert_allclose(np.asarray(rec.n.arr[0]), [0, 1, 0], atol=1e-4)


def test_closest_of_multiple_types():
    b = base_builder()
    m = b.lambertian(b.tex_const([1, 1, 1]))
    b.sphere([0, 0, -10], 1.0, m)
    b.xy_rect(-5, 5, -5, 5, -6, m)  # closer plane, normal +z
    b.triangle([-1, -1, -3], [1, -1, -3], [0, 1, -3], m)  # closest
    scene = b.build()
    rec = ix.scene_hit(scene, mk_rays([0, 0, 0], [0, 0, -1]))
    assert int(rec.mat[0]) == m
    np.testing.assert_allclose(float(rec.t[0]), 3.0, rtol=1e-5)


def test_volume_sphere_scatter_distribution():
    """Reference double-probe semantics (volumes.cpp:11-12 + one-sided
    sphere backfaces, sphere.cpp:33-43): exterior rays with isInside == 0
    get only ONE boundary hit -> NO scatter; rays inside a dielectric
    (isInside > 0) see both roots and scatter with the exponential free
    path. See REFERENCE_PARITY.md."""
    b = base_builder()
    alb = b.tex_const([1, 1, 1])
    b.volume_sphere([0, 0, -10], 2.0, density=0.5, albedo_tex=alb)
    scene = b.build()
    n = 20000
    from miniraytracer_tpu.ops import rng

    k = rng.ray_key(jnp.arange(n), jnp.zeros((n,), jnp.uint32))
    uv = rng.uniform(k, 0)[:, None]

    def mk(inside):
        return ix.Rays(
            ro=V3.zeros((n,)),
            rd=V3(jnp.zeros(n), jnp.zeros(n), jnp.full(n, -1.0)),
            time=jnp.zeros((n,)),
            inside=jnp.full((n,), inside, jnp.int32),
        )

    # exterior, isInside=0: rec2 probe fails -> volume inert (parity quirk)
    rec0 = ix.scene_hit(scene, mk(0), u_volume=uv)
    assert not np.asarray(rec0.hit).any()

    # inside a dielectric: both roots visible -> scatters exactly like the
    # reference (entry t=8, exit t=12, P = 1 - exp(-0.5*4))
    rec = ix.scene_hit(scene, mk(1), u_volume=uv)
    hits = np.asarray(rec.hit)
    ts = np.asarray(rec.t)[hits]
    p_expect = 1 - np.exp(-0.5 * 4)
    assert abs(hits.mean() - p_expect) < 0.02
    assert ts.min() >= 8.0 and ts.max() <= 12.0
    d = ts - 8.0
    mean_expect = (1 / 0.5) - 4 * np.exp(-2) / p_expect
    assert abs(d.mean() - mean_expect) < 0.05


def test_volume_box_is_inert_like_reference():
    """Box volume boundaries are six OUTWARD one-sided rects (box.h:12-21):
    a convex one-sided boundary can never produce the two front-facing hits
    the double-probe needs, so the reference's smoke boxes scatter NOTHING —
    verified against the real reference render (REFERENCE_PARITY.md: the
    physically-correct version diverged ~10% on cornell_smoke; the faithful
    one matches to 0.13%)."""
    b = base_builder()
    alb = b.tex_const([1, 1, 1])
    b.volume_box([0, 0, 0], [165, 165, 165], density=1e9, albedo_tex=alb, rot_y_deg=-18.0, offset=[130, 0, 65])
    scene = b.build()
    cx, cz = 130 + 82, 65 + 82
    for ro, rd in [([cx, 300, cz], [0, -1, 0]),   # from outside, above
                   ([cx, 80, cz], [0, -1, 0])]:   # from inside
        rays = mk_rays(ro, rd)
        uv = jnp.full((1, 1), 0.5, jnp.float32)
        rec = ix.scene_hit(scene, rays, u_volume=uv)
        assert not bool(rec.hit[0])
