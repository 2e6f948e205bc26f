"""Batched thin-lens + motion-blur camera ray generation (camera.h:38-45).
Componentwise SoA: ray origins/directions are vecmath.V3."""

from __future__ import annotations

import jax.numpy as jnp

from miniraytracer_tpu.ops import rng
from miniraytracer_tpu.ops.vecmath import V3, vnormalize
from miniraytracer_tpu.ops.intersect import Rays
from miniraytracer_tpu.scene.types import Camera

# camera's RNG sub-key tag (draws: 0,1 lens disk, 2 shutter time)
CAM_FOLD = 0x0C0FFEE


def _v3_of(vec) -> V3:
    """V3 of a (3,) parameter array (scalar components)."""
    return V3(vec[0], vec[1], vec[2])


def get_rays(cam: Camera, s, t, keys) -> Rays:
    """Generate rays for film coordinates (s, t) in [0,1)^2, batched (N,).

    Per-ray randomness (lens disk + shutter time) comes from the ray's
    counter-based key so results are schedule-independent.
    """
    kc = rng.fold(keys, CAM_FOLD)
    u1 = rng.uniform(kc, 0)
    u2 = rng.uniform(kc, 1)
    u3 = rng.uniform(kc, 2)
    rd_disk = rng.sample_in_disk(u1, u2) * cam.lens_radius
    cu = _v3_of(cam.u)
    cv = _v3_of(cam.v)
    offset = cu * rd_disk.x + cv * rd_disk.y
    time = cam.time0 + (cam.time1 - cam.time0) * u3
    origin = _v3_of(cam.origin) + offset
    direction = (
        _v3_of(cam.llcorner)
        + _v3_of(cam.horz) * s
        + _v3_of(cam.vert) * t
        - _v3_of(cam.origin)
        - offset
    )
    return Rays(
        ro=origin,
        rd=vnormalize(direction),
        time=time,
        inside=jnp.zeros(s.shape, jnp.int32),
    )
