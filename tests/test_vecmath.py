import jax.numpy as jnp
import numpy as np
import pytest

from miniraytracer_tpu.ops import vecmath as vm


def rand_vecs(n, seed=0, scale=1.0):
    rs = np.random.RandomState(seed)
    return jnp.asarray(rs.randn(n, 3).astype(np.float32) * scale)


def test_dot_cross_matches_numpy():
    a, b = rand_vecs(64, 1), rand_vecs(64, 2)
    np.testing.assert_allclose(vm.dot(a, b), np.sum(np.asarray(a) * np.asarray(b), -1), rtol=1e-5)
    np.testing.assert_allclose(vm.cross(a, b), np.cross(np.asarray(a), np.asarray(b)), rtol=1e-5, atol=1e-6)


def test_normalize_unit_and_zero_safe():
    a = rand_vecs(32, 3)
    n = vm.normalize(a)
    np.testing.assert_allclose(vm.length(n), np.ones(32), rtol=1e-5)
    z = vm.normalize(jnp.zeros((4, 3)))
    assert np.all(np.isfinite(np.asarray(z)))


def test_reflect_properties():
    v = vm.normalize(rand_vecs(16, 4))
    n = vm.normalize(rand_vecs(16, 5))
    r = vm.reflect(v, n)
    # |r| == |v|, and angle of incidence == angle of reflection
    np.testing.assert_allclose(vm.length(r), vm.length(v), rtol=1e-5)
    np.testing.assert_allclose(vm.dot(r, n), -vm.dot(v, n), rtol=1e-4, atol=1e-5)


def test_refract_snell_and_tir():
    # straight-on ray: refracts straight through
    v = jnp.array([[0.0, 0.0, -1.0]])
    n = jnp.array([[0.0, 0.0, 1.0]])
    refr, ok = vm.refract(v, n, jnp.array([0.5]))
    assert bool(ok[0])
    np.testing.assert_allclose(np.asarray(refr[0]), [0, 0, -1], atol=1e-6)

    # grazing ray into a denser->lighter interface: TIR
    v = vm.normalize(jnp.array([[1.0, 0.0, -0.05]]))
    refr, ok = vm.refract(v, n, jnp.array([1.5]))
    assert not bool(ok[0])

    # Snell's law magnitude check
    v = vm.normalize(jnp.array([[0.6, 0.0, -0.8]]))
    eta = jnp.array([0.75])
    refr, ok = vm.refract(v, n, eta)
    assert bool(ok[0])
    refr_n = vm.normalize(refr)
    sin_i = 0.6
    sin_t = float(jnp.sqrt(refr_n[0, 0] ** 2 + refr_n[0, 1] ** 2))
    np.testing.assert_allclose(sin_t, 0.75 * sin_i, rtol=1e-5)


def test_luminance_bt709():
    c = jnp.array([[1.0, 1.0, 1.0], [1.0, 0.0, 0.0]])
    lum = np.asarray(vm.luminance(c))
    np.testing.assert_allclose(lum[0], 1.0, rtol=1e-4)
    np.testing.assert_allclose(lum[1], 0.212655, rtol=1e-5)


def test_argb32_pack():
    c = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0], [2.0, -1.0, 0.5]])
    packed = np.asarray(vm.argb32(c))
    assert packed[0] == 0xFF000000
    assert packed[1] == 0xFFFFFFFF
    assert packed[2] == (0xFF << 24 | 255 << 16 | 0 << 8 | int(0.5 * 255.99))


def test_onb_orthonormal_and_transform():
    n = vm.normalize(rand_vecs(32, 7))
    u, v, w = vm.onb_from_w(n)
    for a, b in [(u, v), (u, w), (v, w)]:
        np.testing.assert_allclose(vm.dot(a, b), np.zeros(32), atol=1e-5)
    for a in (u, v, w):
        np.testing.assert_allclose(vm.length(a), np.ones(32), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(w), np.asarray(n), atol=1e-6)
    # local z maps to w
    local = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (32, 1))
    np.testing.assert_allclose(np.asarray(vm.onb_local_to_world(u, v, w, local)), np.asarray(w), atol=1e-6)
