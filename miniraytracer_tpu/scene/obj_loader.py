"""Wavefront OBJ mesh loader (host-side, NumPy).

Covers the reference loader's format subset (obj_loader.cpp:14-163):
`v x y z`, `vn x y z`, and faces `f a b c` / `f a//an b//bn c//cn`
(1-based indices, no texcoords, no negative indices). Vertices get
scale -> rotate -> translate; normals get the inverse rotation
(obj_loader.cpp:80-133). `flip` swaps winding (a<->c).

Returns triangle arrays in edge form ready for SceneBuilder.triangle rows.
"""

from __future__ import annotations

import math

import numpy as np

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
    verts, norms = [], []
    faces, face_norms = [], []
    with open(path, "r") as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            tag = parts[0]
            if tag == "v":
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif tag == "vn":
                norms.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif tag == "f":
                idx = []
                nidx = []
                for tok in parts[1:4]:
                    if "//" in tok:
                        a, b = tok.split("//")
                        idx.append(int(a) - 1)
                        nidx.append(int(b) - 1)
                    else:
                        idx.append(int(tok.split("/")[0]) - 1)
                faces.append(idx)
                face_norms.append(nidx if nidx else None)

    V = np.asarray(verts, _F)
    N = np.asarray(norms, _F) if norms else None
    R = _roty(rot_y_deg)
    off = np.asarray(translate, _F)
    Vt = (V * _F(scale)) @ R.T + off

    a_l, b_l, c_l, an_l, bn_l, cn_l = [], [], [], [], [], []
    for fi, f_idx in enumerate(faces):
        ai, bi, ci = f_idx
        fn = face_norms[fi]
        if flip:
            ai, ci = ci, ai
            if fn:
                fn = [fn[2], fn[1], fn[0]]
        a, b, c = Vt[ai], Vt[bi], Vt[ci]
        if fn:
            # pure-rotation normal transform: n' = R @ n (the reference's
            # row-vector * inverse-rotation, obj_loader.cpp:117-119)
            an, bn, cn = N[fn[0]] @ R.T, N[fn[1]] @ R.T, N[fn[2]] @ R.T
        else:
            n = np.cross(b - a, c - a)
            ln = np.linalg.norm(n)
            n = n / ln if ln > 0 else n
            an = bn = cn = n
        a_l.append(a); b_l.append(b); c_l.append(c)
        an_l.append(an); bn_l.append(bn); cn_l.append(cn)

    return tuple(np.asarray(x, _F) for x in (a_l, b_l, c_l, an_l, bn_l, cn_l))
