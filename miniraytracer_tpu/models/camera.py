"""Batched thin-lens + motion-blur camera ray generation (camera.h:38-45)."""

from __future__ import annotations

import jax.numpy as jnp

from miniraytracer_tpu.ops import rng, vecmath as vm
from miniraytracer_tpu.ops.intersect import Rays
from miniraytracer_tpu.scene.types import Camera

# camera's RNG sub-key tag (draws: 0,1 lens disk, 2 shutter time)
CAM_FOLD = 0x0C0FFEE


def get_rays(cam: Camera, s, t, keys) -> Rays:
    """Generate rays for film coordinates (s, t) in [0,1)^2, batched (N,).

    Per-ray randomness (lens disk + shutter time) comes from the ray's
    counter-based key so results are schedule-independent.
    """
    kc = rng.fold(keys, CAM_FOLD)
    u1 = rng.uniform(kc, 0)
    u2 = rng.uniform(kc, 1)
    u3 = rng.uniform(kc, 2)
    rd_disk = cam.lens_radius * rng.sample_in_disk(u1, u2)
    offset = rd_disk[:, 0:1] * cam.u + rd_disk[:, 1:2] * cam.v
    time = cam.time0 + (cam.time1 - cam.time0) * u3
    origin = cam.origin + offset
    direction = (
        cam.llcorner
        + s[:, None] * cam.horz
        + t[:, None] * cam.vert
        - cam.origin
        - offset
    )
    return Rays(
        ro=origin,
        rd=vm.normalize(direction),
        time=time,
        inside=jnp.zeros(s.shape, jnp.int32),
    )
