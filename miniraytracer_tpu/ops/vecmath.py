"""Vector math core (TPU-native replacement for the reference SIMD library).

The reference implements a hand-written SSE/AVX Vec3/Vec4 library
(vec3.h, mrt_math.h). On TPU the vector unit is exposed through XLA, so the
"SIMD core" is ordinary jnp code over `(..., 3)` arrays: XLA lays these out on
the 8x128 VPU lanes and fuses the elementwise chains. All semantics
(reflect/refract conventions, BT.709 luminance, gamma, ARGB8 packing) follow
the reference formulas: vec3.h:178-198 (reflect/refract), vec3.h:275-279
(luminance), vec3.h:327-333 (ARGB32), onb.h:19-31 (orthonormal basis).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched 3-vector dot product over the last axis -> (...)."""
    return jnp.sum(a * b, axis=-1)


def sdot(a: jnp.ndarray) -> jnp.ndarray:
    """Squared length (reference `sdot`)."""
    return jnp.sum(a * a, axis=-1)


def length(a: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(sdot(a))


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def normalize(a: jnp.ndarray) -> jnp.ndarray:
    """Normalize over the last axis. Safe for zero vectors (returns 0)."""
    n2 = sdot(a)
    inv = jnp.where(n2 > 0, 1.0 / jnp.sqrt(jnp.where(n2 > 0, n2, 1.0)), 0.0)
    return a * inv[..., None]


def reflect(v: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """Mirror reflection (vec3.h:178-181): v - 2*dot(v,n)*n."""
    return v - (2.0 * dot(v, n))[..., None] * n


def refract(v: jnp.ndarray, n: jnp.ndarray, ni_over_nt: jnp.ndarray):
    """Snell refraction (vec3.h:185-198).

    `v` is the (normalized) incident direction, `n` the normal oriented
    *against* v (facing normal). Returns `(refracted, ok)` where `ok` is False
    on total internal reflection (then `refracted` content is unspecified but
    finite). Refracted vector is NOT normalized (matches reference).
    """
    ncosI = dot(v, n)
    sinT2 = (ni_over_nt * ni_over_nt) * (1.0 - ncosI * ncosI)
    ok = sinT2 <= 1.0
    cosT = jnp.sqrt(jnp.maximum(1.0 - sinT2, 0.0))
    cosI = -ncosI
    refracted = ni_over_nt[..., None] * v + (ni_over_nt * cosI - cosT)[..., None] * n
    return refracted, ok


def luminance(c: jnp.ndarray) -> jnp.ndarray:
    """Relative luminance, BT.709 weights (vec3.h:275-279)."""
    w = jnp.array([0.212655, 0.715158, 0.072187], dtype=c.dtype)
    return jnp.sum(c * w, axis=-1)


def gamma_correct(c: jnp.ndarray) -> jnp.ndarray:
    """sqrt gamma (vec3.h gamma_correct)."""
    return jnp.sqrt(jnp.maximum(c, 0.0))


def argb32(c: jnp.ndarray) -> jnp.ndarray:
    """Pack float RGB in [0,1] into uint32 0xAARRGGBB (vec3.h:327-333).

    Clamps to 1.0 and scales by 255.99 like the reference.
    """
    v = jnp.clip(c, 0.0, 1.0) * 255.99
    v = v.astype(jnp.uint32)
    a = jnp.uint32(0xFF) << 24
    return a | (v[..., 0] << 16) | (v[..., 1] << 8) | v[..., 2]


def onb_from_w(n: jnp.ndarray):
    """Orthonormal basis from a (normalized) normal (onb.h:19-23).

    Returns (u, v, w) with w = n.
    """
    w = n
    a = jnp.where(
        (jnp.abs(w[..., 0]) > 0.9)[..., None],
        jnp.array([0.0, 1.0, 0.0], dtype=n.dtype),
        jnp.array([1.0, 0.0, 0.0], dtype=n.dtype),
    )
    v = normalize(cross(w, a))
    u = cross(w, v)
    return u, v, w


def onb_local_to_world(u, v, w, vec):
    """onb * vec (onb.h:25-27): vec.x*u + vec.y*v + vec.z*w."""
    return vec[..., 0:1] * u + vec[..., 1:2] * v + vec[..., 2:3] * w
