import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.ops import rng


def test_uniform_range_and_determinism():
    keys = rng.ray_key(jnp.arange(10000), jnp.zeros(10000, jnp.uint32))
    u = np.asarray(rng.uniform(keys, 0))
    assert u.min() >= 0.0 and u.max() < 1.0
    u2 = np.asarray(rng.uniform(keys, 0))
    np.testing.assert_array_equal(u, u2)
    # different slots decorrelate
    u3 = np.asarray(rng.uniform(keys, 1))
    assert abs(np.corrcoef(u, u3)[0, 1]) < 0.05


def test_uniform_statistics():
    keys = rng.ray_key(jnp.arange(200000), jnp.full((200000,), 3, jnp.uint32))
    u = np.asarray(rng.uniform(keys, 7))
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(u.var() - 1.0 / 12.0) < 0.002
    # chi-square on 64 bins
    hist, _ = np.histogram(u, bins=64, range=(0, 1))
    expected = len(u) / 64
    chi2 = np.sum((hist - expected) ** 2 / expected)
    assert chi2 < 64 * 2.0  # loose bound


def test_stream_independence_pixel_vs_sample():
    n = 100000
    k1 = rng.ray_key(jnp.arange(n), jnp.zeros(n, jnp.uint32))
    k2 = rng.ray_key(jnp.arange(n), jnp.ones(n, jnp.uint32))
    u1 = np.asarray(rng.uniform(k1, 0))
    u2 = np.asarray(rng.uniform(k2, 0))
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.01


def _keys(n, seed=0):
    return rng.ray_key(jnp.arange(n) + seed * 1000003, jnp.zeros(n, jnp.uint32))


def test_on_sphere_uniform():
    n = 200000
    k = _keys(n, 1)
    d = np.asarray(rng.sample_on_sphere(rng.uniform(k, 0), rng.uniform(k, 1)).arr)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-4)
    assert np.all(np.abs(d.mean(0)) < 0.01)
    # each component uniform in [-1,1] for a uniform sphere: var = 1/3
    np.testing.assert_allclose(d.var(0), 1.0 / 3.0, atol=0.01)


def test_in_ball_uniform():
    n = 200000
    k = _keys(n, 2)
    p = np.asarray(rng.sample_in_ball(rng.uniform(k, 0), rng.uniform(k, 1), rng.uniform(k, 2)).arr)
    r = np.linalg.norm(p, axis=-1)
    assert r.max() <= 1.0
    # P(r < t) = t^3
    for t in (0.3, 0.5, 0.8):
        assert abs((r < t).mean() - t**3) < 0.01


def test_in_disk_uniform():
    n = 200000
    k = _keys(n, 3)
    p = np.asarray(rng.sample_in_disk(rng.uniform(k, 0), rng.uniform(k, 1)).arr)
    r = np.linalg.norm(p[:, :2], axis=-1)
    assert np.all(p[:, 2] == 0)
    assert r.max() <= 1.0
    for t in (0.3, 0.5, 0.8):
        assert abs((r < t).mean() - t**2) < 0.01


def test_cosine_direction_matches_reference_formula():
    # pcg.cpp:87-98 with fixed uniforms
    r1, r2 = 0.3, 0.7
    d = np.asarray(rng.sample_cosine_direction(jnp.float32(r1), jnp.float32(r2)).arr)
    import math

    z = math.sqrt(1 - r2)
    phi = 2 * math.pi * r1
    x = math.cos(phi) * 2 * math.sqrt(r2)
    y = math.sin(phi) * 2 * math.sqrt(r2)
    np.testing.assert_allclose(d, [x, y, z], rtol=1e-5)


def test_towards_sphere_within_cone():
    n = 10000
    k = _keys(n, 4)
    radius, dist_sq = 1.0, 25.0
    d = np.asarray(
        rng.sample_towards_sphere(radius, dist_sq, rng.uniform(k, 0), rng.uniform(k, 1)).arr
    )
    cos_max = np.sqrt(1 - radius**2 / dist_sq)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, rtol=1e-4)
    assert d[:, 2].min() >= cos_max - 1e-5


def test_pcg32_exact_vs_reference_constants():
    # pcg32_srandom_r warmup sequence must be deterministic; regression-lock
    # the first outputs for the reference's fixed seeds (main.cpp:302).
    g = rng.Pcg32(11350390909718046443, 6305599193148252115)
    vals = [g.rand32() for _ in range(4)]
    assert all(0 <= v <= 0xFFFFFFFF for v in vals)
    g2 = rng.Pcg32(11350390909718046443, 6305599193148252115)
    assert vals == [g2.rand32() for _ in range(4)]
    # distinct from raw-constructed (pre-main G_rng semantics)
    graw = rng.Pcg32(11350390909718046443, 6305599193148252115, raw=True)
    assert [graw.rand32() for _ in range(4)] != vals
    f = g.randf()
    assert 0.0 <= f < 1.0
