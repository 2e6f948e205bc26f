"""Fused Pallas Perlin-turbulence kernel (exact parity mode).

The reference's perlin texture (texture.cpp:107-203) does, per shading
event, 7 octaves x 8 corners x (3 permutation lookups + a gradient-vector
lookup). On TPU every table lookup is the enemy: XLA gathers run on the
scalar path (~450us per 250k indices), and the XLA one-hot-matmul
workaround materializes (256, N) one-hot operands in HBM — measured 3x
SLOWER than the gathers for this access pattern (round-1 post-mortem in
STATUS.md).

This kernel keeps everything on-chip: the 256-entry permutation/gradient
tables live in VMEM, the one-hots are built in VMEM registers per ray
block and consumed by the MXU immediately, and all 7 octaves (plus the
hermite-smoothed trilinear interpolation and the |.| turbulence fold) run
in one fused program. Per ray block and octave there are exactly TWO MXU
dots:

  - permutation: block-diagonal (6, 768) [px;roll(px);py;roll(py);pz;
    roll(pz)] against a 3-hot (768, B) matrix -> all six lattice values
    (the roll pairing serves both di=0 and di=1 corners from ONE one-hot)
  - gradients: (3, 256) gradient table against the (256, 8B) concatenated
    corner one-hots -> all 8 corner gradient vectors

Exactness: the permutation values are small ints (bf16-exact through any
MXU pass); the gradient dot uses Precision.HIGHEST (one-hot selection
passes f32 values through bit-exactly). Validated compiled-vs-XLA-path on
the real chip (the interpret mode cannot catch MXU precision loss —
STATUS.md precision post-mortem).

Forward-only: the AD (scan) integrator keeps the differentiable XLA path
in models/textures.py; the while-loop renderers dispatch here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from miniraytracer_tpu.ops.vecmath import V3

try:  # optional: CPU-only envs use the XLA path
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False

RAY_BLOCK = 512
DEPTH = 7  # turbulence octaves (texture.cpp:158)


def _turb_kernel(p_ref, perm6_ref, vec_ref, out_ref):
    """p_ref (3, B); perm6_ref (6, 768) block-diag [perm, rolled]x3 axes;
    vec_ref (3, 256) gradient table; out_ref (1, B) turbulence."""
    b = p_ref.shape[1]
    iota768 = jax.lax.broadcasted_iota(jnp.int32, (768, b), 0)
    iota256x8 = jax.lax.broadcasted_iota(jnp.int32, (256, 8, b), 0)

    acc_t = jnp.zeros((1, b), jnp.float32)
    weight = 1.0
    for octave in range(DEPTH):
        scale = float(2.0**octave)

        def prep(c):
            pf = jnp.floor(c)
            fr = c - pf
            h = fr * fr * (3.0 - 2.0 * fr)  # hermite (texture.cpp:70-71)
            return pf.astype(jnp.int32), fr, h

        ix, fx, hx = prep(p_ref[0:1, :] * scale)
        iy, fy, hy = prep(p_ref[1:2, :] * scale)
        iz, fz, hz = prep(p_ref[2:3, :] * scale)

        # ---- permutation lookups: ONE 3-hot dot for all six values ----
        key = jnp.concatenate(
            [ix & 255, 256 + (iy & 255), 512 + (iz & 255)], axis=0
        )  # (3, B)
        onehot3 = (
            (iota768 == key[0:1, :]).astype(jnp.float32)
            + (iota768 == key[1:2, :]).astype(jnp.float32)
            + (iota768 == key[2:3, :]).astype(jnp.float32)
        )  # (768, B), three ones per column (disjoint 256-blocks)
        # int-valued table: bf16-exact through the default MXU pass
        pv = jnp.dot(perm6_ref[:], onehot3, preferred_element_type=jnp.float32)
        pv = pv.astype(jnp.int32)  # rows: x0 x1 y0 y1 z0 z1

        # ---- 8 corner gradient indices -> one concatenated one-hot dot ----
        gis = []
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    gis.append(
                        pv[di : di + 1, :]
                        ^ pv[2 + dj : 3 + dj, :]
                        ^ pv[4 + dk : 5 + dk, :]
                    )
        gi8 = jnp.concatenate(gis, axis=0)  # (8, B)
        ohg = (iota256x8 == gi8[None, :, :]).astype(jnp.float32).reshape(256, 8 * b)
        g = jnp.dot(
            vec_ref[:],
            ohg,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # f32 values pass bit-exact
        ).reshape(3, 8, b)

        # ---- hermite-smoothed trilinear interp (texture.cpp:83-105) ----
        acc = jnp.zeros((1, b), jnp.float32)
        c = 0
        for di in (0, 1):
            ax = hx if di else 1.0 - hx
            wx = fx - di
            for dj in (0, 1):
                ay = hy if dj else 1.0 - hy
                wy = fy - dj
                for dk in (0, 1):
                    az = hz if dk else 1.0 - hz
                    wz = fz - dk
                    d = g[0, c] * wx + g[1, c] * wy + g[2, c] * wz
                    acc = acc + ax * ay * az * d
                    c += 1
        acc_t = acc_t + weight * acc
        weight *= 0.5
    out_ref[:] = jnp.abs(acc_t)


def perm6_table(px, py, pz) -> jnp.ndarray:
    """(6, 768) block-diagonal [perm; roll(perm, -1)] per axis: rows 2a and
    2a+1 hold axis a's values for lattice offsets 0 and +1, columns are
    256-blocks per axis (zero outside the axis's block)."""
    out = jnp.zeros((6, 768), jnp.float32)
    for a, perm in enumerate((px, py, pz)):
        v = jnp.asarray(perm, jnp.float32)
        out = out.at[2 * a, 256 * a : 256 * (a + 1)].set(v)
        out = out.at[2 * a + 1, 256 * a : 256 * (a + 1)].set(jnp.roll(v, -1))
    return out


@partial(jax.jit, static_argnames=("interpret",))
def flash_turbulence(perm6, vec3, p: V3, *, interpret: bool = False):
    """7-octave Perlin turbulence |sum w_i noise(2^i p)| for points p (N,).

    perm6: (6, 768) from perm6_table; vec3: (3, 256) gradient components
    (scene.perlin_vec.T). Returns (N,) float32, matching the XLA reference
    path (models/textures.perlin_noise tables mode) to float-reassociation
    tolerance (<1e-7 absolute; same tables, same formula, same quirks).
    """
    n = p.x.shape[0]
    pm = jnp.stack([p.x, p.y, p.z], axis=0)  # (3, N)
    rem = (-n) % RAY_BLOCK
    if rem:
        pm = jnp.pad(pm, ((0, 0), (0, rem)))
    n_pad = pm.shape[1]
    out = pl.pallas_call(
        _turb_kernel,
        grid=(n_pad // RAY_BLOCK,),
        in_specs=[
            pl.BlockSpec((3, RAY_BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        interpret=interpret,
    )(pm, perm6, vec3)
    return out[0, :n]
