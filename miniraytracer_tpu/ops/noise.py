"""Fused Pallas Perlin-turbulence kernel (exact parity mode).

The reference's perlin texture (texture.cpp:107-203) does, per shading
event, 7 octaves x 8 corners x (3 permutation lookups + a gradient-vector
lookup). On TPU every table lookup is the enemy: XLA gathers run on the
scalar path (~450us per 250k indices), and the XLA one-hot-matmul
workaround materializes (256, N) one-hot operands in HBM — measured 3x
SLOWER than the gathers for this access pattern (round-1 post-mortem in
STATUS.md).

This kernel keeps everything on-chip, with 256-entry lookups FACTORIZED
into 16x16 hi/lo-nibble pairs: a lookup T[k] with k = 16*h + l becomes

    T[k] = < onehot16(h),  T2 @ onehot16(l) >,   T2 = T.reshape(16, 16)

so building the selection masks costs 2x16 lane compares instead of 256.
(The v1 kernel built full-width (256, 8B) one-hots in VMEM; the compare/
cast chain made it 0.7x the XLA path — measured. v2 is the same math with
8x fewer VPU ops.) Per octave:

  - permutation: 3 hi/lo one-hot pairs (one per axis; the rolled-table
    trick serves both the +0 and +1 lattice corners from the same index),
    6 (16,16)@(16,B) dots + masked row-reductions
  - gradients: the 8 corner indices (XOR of permutation values) share one
    (16, 8B) hi/lo pair; 3 dots of (16,16)@(16,8B) at HIGHEST precision
    (one-hot selection passes f32 values through bit-exactly)

All 7 octaves plus the hermite-smoothed trilinear interpolation and the
|.| turbulence fold run in one fused program; integer perm values are
bf16-exact through the default MXU pass.

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


def noise_tables(px, py, pz, vec):
    """Pack the scene's Perlin tables for the kernel.

    Returns (perm96 (96, 16) f32, vec48 (48, 16) f32):
    perm96: six stacked 16x16 tables [px, roll(px,-1), py, roll(py,-1),
    pz, roll(pz,-1)] (the roll serves the +1 lattice corner from the same
    index). vec48: gradient components [gx, gy, gz] each (256,) -> (16,16).
    """
    tabs = []
    for perm in (px, py, pz):
        v = jnp.asarray(perm, jnp.float32)
        tabs.append(v.reshape(16, 16))
        tabs.append(jnp.roll(v, -1).reshape(16, 16))
    perm96 = jnp.concatenate(tabs, axis=0)  # (96, 16)
    vec = jnp.asarray(vec, jnp.float32)  # (256, 3)
    vec48 = jnp.concatenate(
        [vec[:, 0].reshape(16, 16), vec[:, 1].reshape(16, 16),
         vec[:, 2].reshape(16, 16)], axis=0
    )  # (48, 16)
    return perm96, vec48


def _onehot16_pair(idx):
    """idx (R, B) int32 in [0, 256) -> (hi (16, R*B), lo (16, R*B)) f32."""
    r, b = idx.shape
    flat = idx.reshape(1, r * b)
    iota = jax.lax.broadcasted_iota(jnp.int32, (16, r * b), 0)
    hi = (iota == (flat >> 4)).astype(jnp.float32)
    lo = (iota == (flat & 15)).astype(jnp.float32)
    return hi, lo


def _lut256(table16, oh, ol, precision=None):
    """T[idx] via the factorized lookup: <oh, T2 @ ol> -> (1, RB)."""
    m = jnp.dot(table16, ol, preferred_element_type=jnp.float32,
                precision=precision)  # (16, RB)
    return jnp.sum(m * oh, axis=0, keepdims=True)


def _turb_kernel(p_ref, perm_ref, vec_ref, out_ref):
    """p_ref (3, B); perm_ref (96, 16) = 6 stacked 16x16 perm tables;
    vec_ref (48, 16) = 3 stacked 16x16 gradient tables; out (1, B)."""
    b = p_ref.shape[1]
    hiP = jax.lax.Precision.HIGHEST

    acc_t = jnp.zeros((1, b), jnp.float32)
    weight = 1.0
    for octave in range(DEPTH):
        scale = float(2.0**octave)

        def prep(c):
            pf = jnp.floor(c)
            fr = c - pf
            h = fr * fr * (3.0 - 2.0 * fr)  # hermite (texture.cpp:70-71)
            return pf.astype(jnp.int32) & 255, fr, h

        ix, fx, hx = prep(p_ref[0:1, :] * scale)
        iy, fy, hy = prep(p_ref[1:2, :] * scale)
        iz, fz, hz = prep(p_ref[2:3, :] * scale)

        # ---- permutation values: one hi/lo pair per axis, 2 tables each ----
        pv = []  # x0 x1 y0 y1 z0 z1, each (1, B)
        for a, idx in enumerate((ix, iy, iz)):
            oh, ol = _onehot16_pair(idx)
            for roll in (0, 1):
                t16 = perm_ref[(2 * a + roll) * 16 : (2 * a + roll + 1) * 16, :]
                # int-valued table: bf16-exact through the default MXU pass
                pv.append(_lut256(t16, oh, ol).astype(jnp.int32))

        # ---- 8 corner gradient indices -> one shared (16, 8B) hi/lo pair ----
        gis = []
        for di in (0, 1):
            for dj in (0, 1):
                for dk in (0, 1):
                    gis.append(pv[di] ^ pv[2 + dj] ^ pv[4 + dk])
        gi8 = jnp.concatenate(gis, axis=0)  # (8, B)
        ohg, olg = _onehot16_pair(gi8)  # (16, 8B) each
        g = jnp.concatenate(
            [
                _lut256(vec_ref[0:16, :], ohg, olg, hiP),
                _lut256(vec_ref[16:32, :], ohg, olg, hiP),
                _lut256(vec_ref[32:48, :], ohg, olg, hiP),
            ],
            axis=0,
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


@partial(jax.jit, static_argnames=("interpret",))
def flash_turbulence(perm96, vec48, p: V3, *, interpret: bool = False):
    """7-octave Perlin turbulence |sum w_i noise(2^i p)| for points p (N,).

    perm96/vec48 from noise_tables. Returns (N,) float32, matching the XLA
    reference path (models/textures.perlin_turbulence tables mode) to
    float-reassociation tolerance (<1e-7 absolute; same tables, same
    formula, same quirks).
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
    )(pm, perm96, vec48)
    return out[0, :n]
