"""ctypes bindings for the native runtime library (csrc/libmrt_runtime.so).

The native layer owns the host-side, latency-sensitive runtime work that the
reference implements in C++ — BVH construction (triangle.h:78-152 /
scene_object.h:283-319), OBJ parsing (obj_loader.cpp:14-163), and tile-order
generation (work_queue.cpp:33-127). Device compute stays in JAX/XLA/Pallas.

The library is built on demand with `make -C csrc` (g++; no pybind11 — plain
C ABI + ctypes). Every entry point has a NumPy fallback so the package works
without a toolchain; `native_available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "libmrt_runtime.so")

_lock = threading.Lock()
_lib = None
_lib_tried = False


def _load():
    global _lib, _lib_tried
    with _lock:
        if _lib_tried:
            return _lib
        _lib_tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(os.path.join(_CSRC, "Makefile")):
            try:
                subprocess.run(
                    ["make", "-C", _CSRC], check=True, capture_output=True, timeout=120
                )
            except Exception:
                pass
        if os.path.exists(_LIB_PATH):
            try:
                lib = ctypes.CDLL(_LIB_PATH)
                lib.mrt_bvh_build.restype = ctypes.c_int32
                lib.mrt_obj_parse.restype = ctypes.c_int32
                lib.mrt_tile_order.restype = None
                _lib = lib
            except Exception:
                _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def _cptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


# ---------------------------------------------------------------------------
# BVH build
# ---------------------------------------------------------------------------


def bvh_build(bmin: np.ndarray, bmax: np.ndarray, leaf_size: int = 4):
    """Build a flat BVH over prim AABBs.

    Returns (node_bounds (M,6) f32, node_meta (M,4) i32 [left, first, count,
    order], prim_order (n,) i32). Interior nodes have count == 0 and children
    (left, left+1); leaves index prim_order[first:first+count].
    """
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    n = bmin.shape[0]
    assert bmin.shape == (n, 3) and bmax.shape == (n, 3)
    lib = _load()
    if lib is not None:
        nb = np.empty((2 * n - 1 if n > 1 else 1, 6), np.float32)
        nm = np.empty((nb.shape[0], 4), np.int32)
        po = np.empty((n,), np.int32)
        cnt = lib.mrt_bvh_build(
            _cptr(bmin, ctypes.c_float), _cptr(bmax, ctypes.c_float),
            ctypes.c_int32(n), ctypes.c_int32(leaf_size),
            _cptr(nb, ctypes.c_float), _cptr(nm, ctypes.c_int32),
            _cptr(po, ctypes.c_int32),
        )
        if cnt > 0:
            return nb[:cnt].copy(), nm[:cnt].copy(), po
    return _bvh_build_numpy(bmin, bmax, leaf_size)


def _bvh_build_numpy(bmin, bmax, leaf_size):
    """Pure-NumPy fallback (same layout/semantics as csrc/bvh.cpp)."""
    n = bmin.shape[0]
    centroid = 0.5 * (bmin + bmax)
    order = np.arange(n, dtype=np.int32)
    bounds, meta = [], []

    def new_node(first, count):
        idx = len(bounds)
        sel = order[first : first + count]
        bounds.append(np.concatenate([bmin[sel].min(0), bmax[sel].max(0)]))
        meta.append([-1, first, count, 0])
        return idx

    def order_code(li, axis):
        lc = 0.5 * (bounds[li][axis] + bounds[li][3 + axis])
        rc = 0.5 * (bounds[li + 1][axis] + bounds[li + 1][3 + axis])
        code = 0
        for oct_ in range(8):
            dir_neg = (oct_ >> axis) & 1
            left_first = (lc >= rc) if dir_neg else (lc <= rc)
            if left_first:
                code |= 1 << oct_
        return code

    # depth past which splits MUST be median: midpoint partitions can
    # degenerate to 1:(n-1), overflowing the traversal's fixed short stack
    # (ops/bvh.py MAX_STACK = 48). Median halves the count, so total depth
    # <= 22 + ceil(log2(n)) <= 46 < 48 for n < 16M (mirrors csrc/bvh.cpp).
    MEDIAN_DEPTH = 22

    def subdivide(ni, depth):
        _, first, count, _ = meta[ni]
        if count <= leaf_size:
            return
        sel = order[first : first + count]
        c = centroid[sel]
        ext = c.max(0) - c.min(0)
        axis = int(np.argmax(ext))
        if ext[axis] <= 0:
            mid = first + count // 2
        elif depth >= MEDIAN_DEPTH:
            key = c[:, axis]
            order[first : first + count] = sel[np.argsort(key, kind="stable")]
            mid = first + count // 2
        else:
            split = 0.5 * (c[:, axis].min() + c[:, axis].max())
            left_mask = c[:, axis] < split
            order[first : first + count] = np.concatenate([sel[left_mask], sel[~left_mask]])
            mid = first + int(left_mask.sum())
            if mid == first or mid == first + count:
                sel = order[first : first + count]
                key = centroid[sel][:, axis]
                order[first : first + count] = sel[np.argsort(key, kind="stable")]
                mid = first + count // 2
        li = new_node(first, mid - first)
        new_node(mid, first + count - mid)
        meta[ni] = [li, first, 0, 0]
        meta[ni][3] = order_code(li, axis)
        subdivide(li, depth + 1)
        subdivide(li + 1, depth + 1)

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000 + 2 * n))
    try:
        new_node(0, n)
        subdivide(0, 0)
    finally:
        sys.setrecursionlimit(old_limit)
    return (
        np.asarray(bounds, np.float32),
        np.asarray(meta, np.int32),
        order,
    )


# ---------------------------------------------------------------------------
# OBJ parsing
# ---------------------------------------------------------------------------


def obj_parse(path: str):
    """Parse an OBJ file -> (verts (V,3) f32, normals (N,3) f32, faces (F,6)
    i32 [v0 v1 v2 n0 n1 n2], normal index -1 = none). Same subset as the
    reference parser (v / vn / f, triangles)."""
    lib = _load()
    if lib is not None:
        nv = ctypes.c_int32()
        nn = ctypes.c_int32()
        nf = ctypes.c_int32()
        rc = lib.mrt_obj_parse(
            path.encode(), ctypes.byref(nv), ctypes.byref(nn), ctypes.byref(nf),
            None, None, None,
        )
        if rc == 0:
            verts = np.empty((nv.value, 3), np.float32)
            normals = np.empty((max(nn.value, 1), 3), np.float32)
            faces = np.empty((max(nf.value, 1), 6), np.int32)
            rc = lib.mrt_obj_parse(
                path.encode(), ctypes.byref(nv), ctypes.byref(nn), ctypes.byref(nf),
                _cptr(verts, ctypes.c_float), _cptr(normals, ctypes.c_float),
                _cptr(faces, ctypes.c_int32),
            )
            if rc == 0:
                return verts, normals[: nn.value], faces[: nf.value]
    return _obj_parse_python(path)


def _obj_parse_python(path: str):
    verts, normals, faces = [], [], []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            if parts[0] == "v" and len(parts) >= 4:
                verts.append([float(x) for x in parts[1:4]])
            elif parts[0] == "vn" and len(parts) >= 4:
                normals.append([float(x) for x in parts[1:4]])
            elif parts[0] == "f" and len(parts) >= 4:
                vi, ni = [], []
                ok = True
                for tok in parts[1:4]:
                    seg = tok.split("/")
                    try:
                        vi.append(int(seg[0]) - 1)
                    except ValueError:
                        ok = False
                        break
                    if len(seg) >= 3 and seg[2]:
                        ni.append(int(seg[2]) - 1)
                    else:
                        ni.append(-1)
                if ok:
                    faces.append(vi + ni)
    return (
        np.asarray(verts, np.float32).reshape(-1, 3),
        np.asarray(normals, np.float32).reshape(-1, 3),
        np.asarray(faces, np.int32).reshape(-1, 6),
    )


# ---------------------------------------------------------------------------
# Tile ordering
# ---------------------------------------------------------------------------

TILE_ROW_MAJOR = 0
TILE_MORTON = 1
TILE_HILBERT = 2
TILE_INVERT = 16  # bit-reversed sequence ("inverted", the reference default)


def tile_order(tiles_x: int, tiles_y: int, mode: int = TILE_HILBERT | TILE_INVERT):
    """Tile visit order (indices tx + ty*tiles_x) along the selected curve —
    the reference's inverted-Hilbert shuffle by default (work_queue.cpp:84-127).
    """
    lib = _load()
    n = tiles_x * tiles_y
    if lib is not None:
        out = np.empty((n,), np.int32)
        lib.mrt_tile_order(
            ctypes.c_int32(tiles_x), ctypes.c_int32(tiles_y),
            ctypes.c_int32(mode), _cptr(out, ctypes.c_int32),
        )
        return out
    return _tile_order_numpy(tiles_x, tiles_y, mode)


def tile_pixel_batches(width: int, height: int, tilesize: int,
                       n_batches: int = 8,
                       mode: int = TILE_HILBERT | TILE_INVERT):
    """Split the frame's pixel ids into `n_batches` equal-size batches that
    together sweep the tiles in `tile_order` (inverted Hilbert by default) —
    the progressive-preview schedule (work_queue.cpp:84-127): rendering the
    batches in order refines the frame uniformly, like the reference's live
    window. Pixel ids use the framebuffer layout x + y*width. The final
    batch is padded by repeating the last pixel id (harmless: duplicate
    lanes compute identical merged rows).

    Returns a list of (B,) int64 numpy arrays, equal B across batches.
    """
    tilesize = max(1, int(tilesize))
    tx = -(-width // tilesize)
    ty = -(-height // tilesize)
    order = tile_order(tx, ty, mode)
    ids = np.empty((width * height,), np.int64)
    pos = 0
    for t in order:
        x0 = int(t % tx) * tilesize
        y0 = int(t // tx) * tilesize
        xs = np.arange(x0, min(x0 + tilesize, width))
        ys = np.arange(y0, min(y0 + tilesize, height))
        tile_ids = (xs[None, :] + ys[:, None] * width).ravel()
        ids[pos : pos + tile_ids.size] = tile_ids
        pos += tile_ids.size
    assert pos == width * height
    n_batches = max(1, min(n_batches, width * height))
    bsize = -(-ids.size // n_batches)
    padded = np.concatenate([ids, np.full((bsize * n_batches - ids.size,),
                                          ids[-1], np.int64)])
    return [padded[i * bsize : (i + 1) * bsize] for i in range(n_batches)]


def _hilbert_d2xy(side, d):
    x = y = 0
    s = 1
    t = d
    while s < side:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def _tile_order_numpy(tiles_x, tiles_y, mode):
    side = 1
    while side < max(tiles_x, tiles_y):
        side *= 2
    cells = side * side
    bits = cells.bit_length() - 1
    invert = bool(mode & 16)
    kind = mode & 15
    out = []
    for d in range(cells):
        dd = int(format(d, f"0{bits}b")[::-1], 2) if invert and bits else d
        if kind == TILE_HILBERT:
            x, y = _hilbert_d2xy(side, dd)
        elif kind == TILE_MORTON:
            x = y = 0
            for b in range(16):
                x |= ((dd >> (2 * b)) & 1) << b
                y |= ((dd >> (2 * b + 1)) & 1) << b
        else:
            x, y = dd % side, dd // side
        if x < tiles_x and y < tiles_y:
            out.append(x + y * tiles_x)
    return np.asarray(out, np.int32)
