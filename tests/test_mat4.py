"""Mat4 library vs closed-form/numpy oracles (the reference validates its
SIMD variants with microbenchmarks + a .natvis debugger; we assert math)."""

import numpy as np
import jax.numpy as jnp

from miniraytracer_tpu.ops import mat4 as M


def test_identity_and_matmul():
    a = M.translate([1, 2, 3]) @ M.scale(2.0)
    p = M.apply_point(a, [1, 1, 1])
    np.testing.assert_allclose(np.asarray(p), [3, 4, 5], atol=1e-6)


def test_invert_roundtrip():
    m = M.translate([1, -2, 3]) @ M.rotate_axis(0.7, [1, 2, 3]) @ M.scale([2, 3, 4])
    mi = M.invert(m)
    np.testing.assert_allclose(np.asarray(m @ mi), np.eye(4), atol=1e-5)


def test_rotate_y_matches_reference_sense():
    # scene_object.cpp:85-92: x' = c*x + s*z, z' = c*z - s*x
    import math

    r = math.radians(30)
    m = M.rotate_y(r)
    p = np.asarray(M.apply_point(m, [1, 0, 0]))
    np.testing.assert_allclose(p, [math.cos(r), 0, -math.sin(r)], atol=1e-6)
    p2 = np.asarray(M.apply_point(m, [0, 0, 1]))
    np.testing.assert_allclose(p2, [math.sin(r), 0, math.cos(r)], atol=1e-6)


def test_scale_axis_and_reflect():
    m = M.scale_axis(3.0, [1, 0, 0])
    np.testing.assert_allclose(np.asarray(M.apply_point(m, [1, 1, 0])), [3, 1, 0], atol=1e-6)
    r = M.reflect([0, 1, 0])
    np.testing.assert_allclose(np.asarray(M.apply_point(r, [1, 2, 3])), [1, -2, 3], atol=1e-6)


def test_involution():
    m = M.involution([0, 0, 1])
    np.testing.assert_allclose(np.asarray(M.apply_point(m, [1, 2, 3])), [-1, -2, 3], atol=1e-6)


def test_rotation_preserves_length_and_normal_rule():
    m = M.rotate_axis(1.1, [1, 1, 0])
    v = np.array([1.0, 2.0, 3.0])
    out = np.asarray(M.apply_vector(m, v))
    np.testing.assert_allclose(np.linalg.norm(out), np.linalg.norm(v), rtol=1e-6)
    # for pure rotation, normal transform == vector transform
    n = np.asarray(M.apply_normal(m, v))
    np.testing.assert_allclose(n, out, atol=1e-5)


def test_transpose():
    m = M.rotate_z(0.3)
    np.testing.assert_allclose(
        np.asarray(M.transpose(m)), np.asarray(m).T, atol=1e-7
    )
