"""Camera ray generation (camera.h:16-45): look-at basis, film mapping,
thin-lens aperture, shutter interval."""

import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.models import camera as C
from miniraytracer_tpu.ops import rng
from miniraytracer_tpu.scene.builder import make_camera


def _keys(n):
    return rng.ray_key(jnp.arange(n, dtype=jnp.uint32), jnp.zeros(n, jnp.uint32))


def test_center_ray_points_at_lookat():
    cam = make_camera([0, 0, 0], [0, 0, -10], [0, 1, 0], 60, 1.0, 0.0, 10.0, 0.0, 0.0)
    rays = C.get_rays(cam, jnp.asarray([0.5]), jnp.asarray([0.5]), _keys(1))
    np.testing.assert_allclose(
        [float(rays.rd.x[0]), float(rays.rd.y[0]), float(rays.rd.z[0])],
        [0, 0, -1], atol=1e-6,
    )
    assert int(rays.inside[0]) == 0


def test_film_corners_span_fov():
    # vfov 90 at focus 1: film half-height = tan(45) = 1
    cam = make_camera([0, 0, 0], [0, 0, -1], [0, 1, 0], 90, 1.0, 0.0, 1.0, 0.0, 0.0)
    rays = C.get_rays(
        cam, jnp.asarray([0.5, 0.5]), jnp.asarray([0.0, 1.0]), _keys(2)
    )
    # bottom edge: direction y/z = -1 -> 45 degrees down
    np.testing.assert_allclose(float(rays.rd.y[0] / -rays.rd.z[0]), -1.0, atol=1e-5)
    np.testing.assert_allclose(float(rays.rd.y[1] / -rays.rd.z[1]), 1.0, atol=1e-5)


def test_aperture_jitters_origin_within_lens_radius():
    cam = make_camera([0, 0, 0], [0, 0, -10], [0, 1, 0], 60, 1.0, 2.0, 10.0, 0.0, 0.0)
    n = 20000
    rays = C.get_rays(cam, jnp.full((n,), 0.5), jnp.full((n,), 0.5), _keys(n))
    r = np.sqrt(np.asarray(rays.ro.x) ** 2 + np.asarray(rays.ro.y) ** 2)
    assert r.max() <= 1.0 + 1e-5  # lens radius = aperture/2
    assert r.mean() > 0.3  # actually spread over the disk
    # focus plane invariance: all rays hit the focus point despite jitter
    t = -10.0 / np.asarray(rays.rd.z)
    fx = np.asarray(rays.ro.x) + t * np.asarray(rays.rd.x)
    fy = np.asarray(rays.ro.y) + t * np.asarray(rays.rd.y)
    np.testing.assert_allclose(fx, 0.0, atol=1e-4)
    np.testing.assert_allclose(fy, 0.0, atol=1e-4)


def test_shutter_interval_uniform():
    cam = make_camera([0, 0, 0], [0, 0, -1], [0, 1, 0], 60, 1.0, 0.0, 1.0, 0.25, 0.75)
    n = 50000
    rays = C.get_rays(cam, jnp.full((n,), 0.5), jnp.full((n,), 0.5), _keys(n))
    t = np.asarray(rays.time)
    assert t.min() >= 0.25 and t.max() <= 0.75
    np.testing.assert_allclose(t.mean(), 0.5, atol=0.01)
