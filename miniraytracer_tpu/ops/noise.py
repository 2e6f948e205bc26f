"""Fused Pallas Perlin-turbulence kernel (exact parity mode).

The reference's perlin texture (texture.cpp:107-203) does, per shading
event, 7 octaves x 8 corners x (3 permutation lookups + a gradient-vector
lookup). On TPU every table lookup is the enemy: XLA gathers run on the
scalar path (~450us per 250k indices), and the XLA one-hot-matmul
workaround materializes (256, N) one-hot operands in HBM — measured 3x
SLOWER than the gathers for this access pattern (round-1 post-mortem in
STATUS.md).

v3 (round 2): every 256-entry lookup is a Mosaic LANE-GATHER — the one
gather form Mosaic lowers is `take_along_axis` on a single (8, 128) vreg,
so each table is stored as two lane-replicated (8, 128) half-tiles and a
lookup is two gathers + a half-select (ops/bounce._plut). This replaced
the v2 16x16 one-hot factorization (two 16-wide MXU dots + masked
reduction per lookup): measured on v5e, the gather kernel runs the whole
7-octave turbulence at ~227 Mrays/s inside the fused bounce kernel vs
~7 Mrays/s for the v2 matmul path end-to-end. Values pass through the
gather bit-exactly (no MXU precision concerns at all).

The actual turbulence body lives in ops/bounce.py (`_turbulence`) so the
fused bounce kernel and this standalone kernel (used by the XLA wavefront
path for image+perlin scenes like earth) share one implementation.

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

BLOCK_ROWS = 8  # (8, 128) lane tiles — the only Mosaic gather shape
LANE_BLOCK = BLOCK_ROWS * 128
DEPTH = 7  # turbulence octaves (texture.cpp:158)


def noise_tables(px, py, pz, vec):
    """Pack the scene's Perlin tables for the kernel.

    Returns ptab (96, 128) f32: six 256-entry tables [px, py, pz, gx, gy,
    gz], each as two lane-replicated (8, 128) half-tiles (rows [16k, 16k+8)
    hold entries [0:128], rows [16k+8, 16k+16) hold [128:256]) — the
    lane-gather layout of ops/bounce.pack_scene."""

    def _ghalves(t256):
        t = jnp.asarray(t256, jnp.float32)
        return jnp.concatenate([
            jnp.tile(t[:128][None, :], (8, 1)),
            jnp.tile(t[128:][None, :], (8, 1)),
        ])

    vec = jnp.asarray(vec, jnp.float32)  # (256, 3)
    return jnp.concatenate([
        _ghalves(px), _ghalves(py), _ghalves(pz),
        _ghalves(vec[:, 0]), _ghalves(vec[:, 1]), _ghalves(vec[:, 2]),
    ])  # (96, 128)


def _turb_kernel(p_ref, ptab_ref, out_ref):
    """p_ref (3, 8, 128); ptab_ref (96, 128); out (8, 128)."""
    from miniraytracer_tpu.ops.bounce import _turbulence

    p = V3(p_ref[0], p_ref[1], p_ref[2])
    out_ref[:] = _turbulence(ptab_ref, p)


@partial(jax.jit, static_argnames=("interpret",))
def flash_turbulence(ptab, p: V3, *, interpret: bool = False):
    """7-octave Perlin turbulence |sum w_i noise(2^i p)| for points p (N,).

    ptab from noise_tables. Returns (N,) float32, matching the XLA
    reference path (models/textures.perlin_turbulence tables mode) to
    float-reassociation tolerance (same tables, same formula, same quirks;
    table values pass through the lane-gathers bit-exactly).
    """
    n = p.x.shape[0]
    pm = jnp.stack([p.x, p.y, p.z], axis=0)  # (3, N)
    rem = (-n) % LANE_BLOCK
    if rem:
        pm = jnp.pad(pm, ((0, 0), (0, rem)))
    n_pad = pm.shape[1]
    r128 = n_pad // 128
    pm = pm.reshape(3, r128, 128)
    out = pl.pallas_call(
        _turb_kernel,
        grid=(r128 // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((3, BLOCK_ROWS, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((96, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r128, 128), jnp.float32),
        interpret=interpret,
    )(pm, ptab)
    return out.reshape(-1)[:n]
