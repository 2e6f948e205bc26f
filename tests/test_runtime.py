"""Native runtime library (csrc/): BVH build, OBJ parse, tile ordering.
Each native path is validated against its NumPy fallback and against
structural invariants."""

import os

import numpy as np
import pytest

from miniraytracer_tpu.utils import runtime as rt

REF_OBJ = "/root/reference/obj"


def _random_boxes(n, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
    e = rng.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    return c - e, c + e


def _check_bvh(bmin, bmax, nb, nm, po, leaf_size):
    n = bmin.shape[0]
    assert sorted(po.tolist()) == list(range(n))
    seen = []

    def walk(ni, depth=0):
        assert depth < 200
        left, first, count, order = nm[ni]
        lo, hi = nb[ni, :3], nb[ni, 3:]
        assert (lo <= hi + 1e-6).all()
        if count > 0:
            assert count <= leaf_size
            sel = po[first : first + count]
            assert (bmin[sel] >= lo - 1e-4).all()
            assert (bmax[sel] <= hi + 1e-4).all()
            seen.extend(sel.tolist())
        else:
            for ch in (left, left + 1):
                clo, chi = nb[ch, :3], nb[ch, 3:]
                assert (clo >= lo - 1e-4).all() and (chi <= hi + 1e-4).all()
            walk(left, depth + 1)
            walk(left + 1, depth + 1)

    walk(0)
    assert sorted(seen) == list(range(n))


@pytest.mark.parametrize("n", [1, 2, 7, 100, 1000])
def test_bvh_invariants(n):
    bmin, bmax = _random_boxes(n)
    nb, nm, po = rt.bvh_build(bmin, bmax, leaf_size=4)
    _check_bvh(bmin, bmax, nb, nm, po, 4)


def test_bvh_degenerate_identical_centroids():
    # all prims at the same point: the reference's midpoint split would
    # produce an empty partition (SURVEY.md 9 family of quirks); ours must
    # terminate with median/half fallbacks
    bmin = np.zeros((64, 3), np.float32)
    bmax = np.ones((64, 3), np.float32)
    nb, nm, po = rt.bvh_build(bmin, bmax, leaf_size=2)
    _check_bvh(bmin, bmax, nb, nm, po, 2)


def test_bvh_numpy_fallback_matches_native():
    """Same tree structure/bounds; prim order within a partition may differ
    (std::partition is unstable, the NumPy fallback is stable)."""
    if not rt.native_available():
        pytest.skip("native lib unavailable")
    bmin, bmax = _random_boxes(500, seed=3)
    nb1, nm1, po1 = rt.bvh_build(bmin, bmax, leaf_size=4)
    nb2, nm2, po2 = rt._bvh_build_numpy(bmin, bmax, 4)
    assert nb1.shape == nb2.shape
    np.testing.assert_allclose(nb1, nb2, atol=1e-5)
    # left/first/count/order identical; leaf prim SETS identical
    np.testing.assert_array_equal(nm1, nm2)
    for left, first, count, _ in nm1:
        if count > 0:
            assert set(po1[first : first + count]) == set(po2[first : first + count])


def test_tile_order_is_permutation_and_matches_numpy():
    for tx, ty in [(1, 1), (5, 4), (16, 16), (13, 7)]:
        order = rt.tile_order(tx, ty)
        assert sorted(order.tolist()) == list(range(tx * ty))
        order_np = rt._tile_order_numpy(tx, ty, rt.TILE_HILBERT | rt.TILE_INVERT)
        np.testing.assert_array_equal(order, order_np)


def test_tile_order_inverted_spreads_early_tiles():
    # the point of the bit-reversed Hilbert order (work_queue.cpp:84-127):
    # the first few tiles should be far apart, not adjacent
    order = rt.tile_order(16, 16)
    xy = np.stack([order[:4] % 16, order[:4] // 16], 1)
    d01 = np.abs(xy[0] - xy[1]).sum()
    assert d01 >= 8  # first two tiles at least half the screen apart


@pytest.mark.skipif(not os.path.exists(REF_OBJ), reason="reference assets absent")
def test_obj_parse_native_vs_python():
    for name in ["pyramid.obj", "bunny.obj"]:
        p = os.path.join(REF_OBJ, name)
        v1, n1, f1 = rt.obj_parse(p)
        v2, n2, f2 = rt._obj_parse_python(p)
        np.testing.assert_allclose(v1, v2)
        np.testing.assert_array_equal(f1, f2)
        if n1.shape[0] or n2.shape[0]:
            np.testing.assert_allclose(n1, n2)


@pytest.mark.skipif(not os.path.exists(REF_OBJ), reason="reference assets absent")
def test_obj_known_face_counts():
    # face counts recorded in SURVEY.md section 2 assets table
    counts = {"bunny.obj": 4968, "Teapot3_no_vt.obj": 6320, "pyramid.obj": 6}
    for name, expect in counts.items():
        _, _, f = rt.obj_parse(os.path.join(REF_OBJ, name))
        assert f.shape[0] == expect, name


def test_bvh_depth_bounded_on_adversarial_distribution():
    """Exponentially clustered centroids force near-1:(n-1) midpoint splits;
    without the depth-bounded median fallback the tree depth grows O(n) and
    overflows the traversal's MAX_STACK=48 short stack."""
    n = 4000
    x = np.geomspace(1.0, 1e-30, n).astype(np.float32)
    bmin = np.stack([x, np.zeros_like(x), np.zeros_like(x)], 1)
    bmax = bmin + np.float32(1e-6)

    def max_depth(nm):
        depth = {0: 0}
        worst = 0
        stack = [0]
        while stack:
            ni = stack.pop()
            left, _, count, _ = nm[ni]
            worst = max(worst, depth[ni])
            if count == 0:
                depth[left] = depth[left + 1] = depth[ni] + 1
                stack += [left, left + 1]
        return worst

    for build in ([rt.bvh_build] if rt.native_available() else []) + [rt._bvh_build_numpy]:
        nb, nm, po = build(bmin, bmax, 4)
        _check_bvh(bmin, bmax, nb, nm, po, 4)
        assert max_depth(nm) <= 46, build.__name__


def test_tile_pixel_batches_cover_frame_in_hilbert_order():
    w, h, ts = 50, 34, 8
    batches = rt.tile_pixel_batches(w, h, ts, n_batches=6)
    assert len(batches) == 6
    sizes = {b.size for b in batches}
    assert len(sizes) == 1  # equal batch sizes (padded)
    allpix = np.concatenate(batches)
    assert set(allpix.tolist()) == set(range(w * h))  # full coverage
    # the first batch must start exactly with tile_order's first tiles
    tx = -(-w // ts)
    first_tile = rt.tile_order(tx, -(-h // ts))[0]
    x0, y0 = (first_tile % tx) * ts, (first_tile // tx) * ts
    assert batches[0][0] == x0 + y0 * w
