"""Texture sampling: constant / sine-checker / Perlin turbulence / image.

Tagged-dispatch equivalent of texture.h's virtual `sample(u, v, p)`:
all texture kinds are evaluated batched and masked-selected by type code.
Kinds not present in a scene are pruned statically (SceneData meta flags)
so e.g. Cornell never pays for Perlin gathers.

Formulas follow the reference exactly:
- checker: sin(s*x)*sin(s*y)*sin(s*z) < 0 -> odd else even (texture.cpp:7-14)
- perlin:  gradient noise with hermite-smoothed trilinear interp over
  permuted gradient table (texture.cpp:68-152), 7-octave turbulence with
  |acc| (texture.cpp:155-165); tables replicate the pre-main G_rng init
  (texture.cpp:167-203, see builder.perlin_tables)
- image:   nearest-neighbor, clamped, v-flipped (texture.cpp:207-225)
"""

from __future__ import annotations

import jax.numpy as jnp

from miniraytracer_tpu.scene import types as T


def perlin_noise(scene: T.SceneData, p: jnp.ndarray) -> jnp.ndarray:
    """Gradient Perlin noise at points p (N,3) -> (N,). texture.cpp:118-152."""
    pf = jnp.floor(p)
    uvw = p - pf  # fractional part
    ijk = pf.astype(jnp.int32)
    # hermite cubic smoothing (texture.cpp:70-71)
    uvw_h = uvw * uvw * (3.0 - 2.0 * uvw)

    acc = jnp.zeros(p.shape[:-1], p.dtype)
    for di in (0, 1):
        xi = scene.perlin_px[(ijk[..., 0] + di) & 255]
        ax = jnp.where(di == 1, uvw_h[..., 0], 1.0 - uvw_h[..., 0])
        wx = uvw[..., 0] - di
        for dj in (0, 1):
            yi = scene.perlin_py[(ijk[..., 1] + dj) & 255]
            ay = jnp.where(dj == 1, uvw_h[..., 1], 1.0 - uvw_h[..., 1])
            wy = uvw[..., 1] - dj
            for dk in (0, 1):
                zi = scene.perlin_pz[(ijk[..., 2] + dk) & 255]
                az = jnp.where(dk == 1, uvw_h[..., 2], 1.0 - uvw_h[..., 2])
                wz = uvw[..., 2] - dk
                grad = scene.perlin_vec[xi ^ yi ^ zi]  # (N,3)
                d = grad[..., 0] * wx + grad[..., 1] * wy + grad[..., 2] * wz
                acc = acc + ax * ay * az * d
    return acc


def perlin_turbulence(scene: T.SceneData, p: jnp.ndarray, depth: int = 7) -> jnp.ndarray:
    """7-octave |sum w_i * noise(2^i p)| (texture.cpp:155-165)."""
    acc = jnp.zeros(p.shape[:-1], p.dtype)
    weight = 1.0
    pc = p
    for _ in range(depth):
        acc = acc + weight * perlin_noise(scene, pc)
        weight *= 0.5
        pc = pc * 2.0
    return jnp.abs(acc)


def image_sample(scene: T.SceneData, img_id, hw, u, v) -> jnp.ndarray:
    """Nearest-neighbor, clamped, v-flipped (texture.cpp:207-225)."""
    h = hw[..., 0].astype(jnp.int32)
    w = hw[..., 1].astype(jnp.int32)
    i = jnp.clip((u * w.astype(u.dtype)).astype(jnp.int32), 0, w - 1)
    j = jnp.clip(((1.0 - v) * h.astype(v.dtype)).astype(jnp.int32), 0, h - 1)
    return scene.images[img_id, j, i]  # (N,3)


def sample_texture(scene: T.SceneData, tex_id: jnp.ndarray, u, v, p) -> jnp.ndarray:
    """Batched texture::sample for per-ray texture ids (N,) -> (N,3)."""
    ttype = scene.tex_type[tex_id]
    c0 = scene.tex_c0[tex_id]
    c1 = scene.tex_c1[tex_id]
    scale = scene.tex_scale[tex_id]

    out = c0  # TEX_CONST

    # checker (sine product in world space)
    sp = scale[:, None] * p
    sines = jnp.sin(sp[:, 0]) * jnp.sin(sp[:, 1]) * jnp.sin(sp[:, 2])
    checker = jnp.where((sines < 0)[:, None], c1, c0)
    out = jnp.where((ttype == T.TEX_CHECKER)[:, None], checker, out)

    if scene.has_perlin:
        turb = perlin_turbulence(scene, scale[:, None] * p)
        out = jnp.where((ttype == T.TEX_PERLIN)[:, None], turb[:, None] * jnp.ones(3, p.dtype), out)

    if scene.has_image:
        img_id = scene.tex_img[tex_id]
        hw = c1[:, :2]  # builder stashes (h, w) in tex_c1 for image textures
        img = image_sample(scene, img_id, hw, u, v)
        out = jnp.where((ttype == T.TEX_IMAGE)[:, None], img, out)

    return out
