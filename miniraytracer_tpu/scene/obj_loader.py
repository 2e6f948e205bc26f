"""Wavefront OBJ mesh loader (host-side).

Covers the reference loader's format subset (obj_loader.cpp:14-163):
`v x y z`, `vn x y z`, and faces `f a b c` / `f a//an b//bn c//cn`
(1-based indices, no texcoords, no negative indices). Vertices get
scale -> rotate -> translate; normals get the inverse rotation
(obj_loader.cpp:80-133). `flip` swaps winding (a<->c).

Parsing is done by the native runtime library (csrc/obj_loader.cpp via
utils.runtime, with a pure-Python fallback); the transform baking and
vectorized edge-form conversion happen here in NumPy.
"""

from __future__ import annotations

import math

import numpy as np

from miniraytracer_tpu.utils import runtime as rt

_F = np.float32


def _roty(deg):
    r = math.radians(deg)
    c, s = math.cos(r), math.sin(r)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], _F)


def read_obj(path, scale=1.0, rot_y_deg=0.0, translate=(0, 0, 0), flip=False):
    """Parse OBJ -> (verts_a, verts_b, verts_c, n_a, n_b, n_c) arrays (T,3).

    Normals are per-vertex when the file provides them, else the flat
    geometric normal (triangle.cpp ctor without normals).
    """
    V, N, F = rt.obj_parse(path)
    if F.shape[0] == 0:
        z = np.zeros((0, 3), _F)
        return z, z, z, z, z, z

    R = _roty(rot_y_deg)
    off = np.asarray(translate, _F)
    Vt = (V * _F(scale)) @ R.T + off

    if flip:  # swap winding a <-> c (obj_loader.cpp winding flip)
        vi = F[:, [2, 1, 0]]
        ni = F[:, [5, 4, 3]]
    else:
        vi = F[:, :3]
        ni = F[:, 3:]

    a, b, c = Vt[vi[:, 0]], Vt[vi[:, 1]], Vt[vi[:, 2]]
    has_n = (ni >= 0).all(axis=1) & (N.shape[0] > 0)
    # flat geometric normals where vertex normals are absent
    gn = np.cross(b - a, c - a)
    ln = np.linalg.norm(gn, axis=1, keepdims=True)
    gn = np.where(ln > 0, gn / np.maximum(ln, 1e-30), gn)

    def vert_n(k):
        if N.shape[0] == 0:
            return gn
        # pure-rotation normal transform: n' = R @ n (the reference's
        # row-vector * inverse-rotation, obj_loader.cpp:117-119)
        nn = N[np.clip(ni[:, k], 0, max(N.shape[0] - 1, 0))] @ R.T
        return np.where(has_n[:, None], nn, gn)

    an, bn, cn = vert_n(0), vert_n(1), vert_n(2)
    return tuple(np.asarray(x, _F) for x in (a, b, c, an, bn, cn))
