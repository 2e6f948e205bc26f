"""Wavefront path-tracing integrator + progressive render driver.

The reference integrator is a recursive `trace()` (main.cpp:66-118). On TPU
recursion and divergence are replaced by a *wavefront*: all rays advance in
lockstep through a bounded bounce loop carrying
(origin, dir, time, isInside, throughput, radiance, alive). The recursion

    result(d) = emitted_d + f_d * result(d+1)

unrolls to  L += beta * emitted_d;  beta *= f_d  with the reference's exact
branch semantics:
- specular bounce drops `emitted` (main.cpp:81-83)
- miss adds the background: sky lerp for scenes below Cornell, else black
  (main.cpp:110-116)
- depth cap / light hit terminates with emission only (main.cpp:105-107)

Two loop modes: `lax.while_loop` with an all-dead early exit for fast
forward-only renders, and `lax.scan` (static trip count) for the
differentiable path (reverse-mode AD needs a reversible loop).

The progressive driver replicates the draw2 worker (main.cpp:193-243):
per-pass stratified sample offsets (main.cpp:316-332), non-finite samples
replaced by the previous pixel value (main.cpp:214-219), incremental
averaging, and the luminance clamp applied to the running average
(main.cpp:226-229).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from miniraytracer_tpu.models import camera as cam_mod
from miniraytracer_tpu.models import materials as mat_mod
from miniraytracer_tpu.ops import intersect as ix
from miniraytracer_tpu.ops import rng, vecmath as vm
from miniraytracer_tpu.scene import types as T


class PathState(NamedTuple):
    ro: jnp.ndarray
    rd: jnp.ndarray
    time: jnp.ndarray
    inside: jnp.ndarray
    beta: jnp.ndarray  # (N,3) throughput
    radiance: jnp.ndarray  # (N,3)
    alive: jnp.ndarray  # (N,) bool
    keys: jnp.ndarray  # (N,) u32 per-path root key
    rays_traced: jnp.ndarray  # () f32 counter (metrics, main.cpp:68)


def _background(scene: T.SceneData, rd):
    if scene.use_sky:
        t = 0.5 * (rd[:, 1] + 1.0)
        white = jnp.array([1.0, 1.0, 1.0])
        blue = jnp.array([0.5, 0.7, 1.0])
        return (1.0 - t)[:, None] * white + t[:, None] * blue
    return jnp.zeros_like(rd)


def _bounce(scene: T.SceneData, state: PathState, depth, max_bounces) -> PathState:
    """One wavefront bounce for every ray (dead lanes masked)."""
    rays = ix.Rays(ro=state.ro, rd=state.rd, time=state.time, inside=state.inside)
    keys_b = rng.fold(state.keys, depth)

    if scene.n_volumes > 0:
        u_vol = jnp.stack(
            [rng.uniform(keys_b, mat_mod.SLOT_VOL + vi) for vi in range(scene.n_volumes)],
            axis=-1,
        )
    else:
        u_vol = None

    rec = ix.scene_hit(scene, rays, u_vol)
    depth_ok = depth < max_bounces
    sc = mat_mod.shade(scene, rays, rec, keys_b, depth_ok)

    alive = state.alive
    # miss -> background, path dies
    miss = alive & ~rec.hit
    radiance = state.radiance + jnp.where(
        miss[:, None], state.beta * _background(scene, state.rd), 0.0
    )
    # emission (skipped on the specular-scatter branch)
    emit_mask = alive & rec.hit & sc.add_emitted
    radiance = radiance + jnp.where(emit_mask[:, None], state.beta * sc.emitted, 0.0)

    cont = alive & rec.hit & sc.scattered
    beta = jnp.where(cont[:, None], state.beta * sc.weight, state.beta)
    # kill zero-throughput paths (estimator-identical, saves traversal work)
    cont = cont & jnp.any(beta > 0.0, axis=-1)

    return PathState(
        ro=jnp.where(cont[:, None], rec.p, state.ro),
        rd=jnp.where(cont[:, None], sc.new_rd, state.rd),
        time=state.time,
        inside=jnp.where(cont, sc.new_inside, state.inside),
        beta=beta,
        radiance=radiance,
        alive=cont,
        keys=state.keys,
        rays_traced=state.rays_traced + jnp.sum(alive.astype(jnp.float32)),
    )


def trace_paths(scene: T.SceneData, rays0: ix.Rays, keys, max_bounces: int, loop: str = "while"):
    """Integrate radiance for a batch of primary rays.

    Returns (radiance (N,3), rays_traced ()). `loop='scan'` gives the
    AD-compatible fixed-trip-count variant.
    """
    n = rays0.ro.shape[0]
    state = PathState(
        ro=rays0.ro,
        rd=rays0.rd,
        time=rays0.time,
        inside=rays0.inside,
        beta=jnp.ones((n, 3)),
        radiance=jnp.zeros((n, 3)),
        alive=jnp.ones((n,), bool),
        keys=keys,
        rays_traced=jnp.float32(0.0),
    )
    # depth runs 0..max_bounces inclusive: at depth==max_bounces only
    # emission/background is collected (scatter gated by depth_ok)
    if loop == "scan":
        # remat each bounce: the backward sweep re-runs the forward bounce
        # instead of keeping every per-bounce intermediate live — trades
        # FLOPs for HBM, required at 500x500 x 33 bounces
        bounce = jax.checkpoint(
            lambda sc, s, depth: _bounce(sc, s, depth, max_bounces)
        )

        def body(s, depth):
            return bounce(scene, s, depth), None

        state, _ = jax.lax.scan(body, state, jnp.arange(max_bounces + 1))
    else:
        def cond(carry):
            depth, s = carry
            return (depth <= max_bounces) & jnp.any(s.alive)

        def body(carry):
            depth, s = carry
            return depth + 1, _bounce(scene, s, depth, max_bounces)

        _, state = jax.lax.while_loop(cond, body, (jnp.int32(0), state))
    return state.radiance, state.rays_traced


# ---------------------------------------------------------------------------
# Progressive full-frame renderer (draw2 semantics)
# ---------------------------------------------------------------------------


def sample_offsets(spp: int):
    """Stratified sqrt(spp)^2 regular grid of subpixel offsets
    (main.cpp:316-332). Returns (ns, 2) float32 and ns."""
    import numpy as np

    sq = int(np.sqrt(spp))
    ns = sq * sq
    offs = np.zeros((ns, 2), np.float32)
    for i in range(sq):
        for j in range(sq):
            offs[i * sq + j] = ((i + 0.5) / sq, (j + 0.5) / sq)
    return jnp.asarray(offs), ns


def sample_radiance(
    scene: T.SceneData,
    pix: jnp.ndarray,  # (N,) u32 pixel ids (index = x + y*width, bottom row 0)
    sample_idx: jnp.ndarray,  # () i32
    offset: jnp.ndarray,  # (2,) subpixel offset
    *,
    width: int,
    height: int,
    max_bounces: int,
    loop: str = "while",
):
    """One radiance sample for each listed pixel. Returns ((N,3), rays ())."""
    x = (pix % width).astype(jnp.float32)
    y = (pix // width).astype(jnp.float32)
    s = (x + offset[0]) / width
    t = (y + offset[1]) / height
    keys = rng.ray_key(pix, jnp.full(pix.shape, sample_idx, jnp.uint32))
    rays = cam_mod.get_rays(scene.camera, s, t, keys)
    return trace_paths(scene, rays, keys, max_bounces, loop=loop)


def merge_pass(frame, color, sample_idx, n_new, max_lum):
    """Fold `n_new` fresh per-pixel sample averages (`color`) into the running
    average `frame` that already holds `sample_idx` samples — draw2 semantics
    (main.cpp:221-229): incremental average then luminance clamp on the
    running average. `color` must already be NaN-guarded."""
    k = sample_idx.astype(jnp.float32)
    new_frame = jnp.where(
        sample_idx > 0,
        frame + (color - frame) * (n_new / (k + n_new)),
        color,
    )
    lum = vm.luminance(new_frame)
    scale = jnp.where(lum > max_lum, max_lum / jnp.maximum(lum, 1e-12), 1.0)
    return new_frame * scale[:, None]


def render_pixels(
    scene: T.SceneData,
    frame: jnp.ndarray,  # (N, 3) running average rows for `pix`
    pix: jnp.ndarray,  # (N,) u32 pixel ids
    sample_idx: jnp.ndarray,  # () i32
    offset: jnp.ndarray,  # (2,)
    max_lum: jnp.ndarray,  # ()
    *,
    width: int,
    height: int,
    max_bounces: int,
    loop: str = "while",
):
    """One progressive pass over an arbitrary pixel subset (shard-friendly
    core). Returns (frame', rays_traced)."""
    radiance, rays_traced = sample_radiance(
        scene, pix, sample_idx, offset,
        width=width, height=height, max_bounces=max_bounces, loop=loop,
    )
    # NaN policy (main.cpp:214-219): non-finite -> previous pixel (or 0)
    finite = jnp.all(jnp.isfinite(radiance), axis=-1, keepdims=True)
    prev = jnp.where(sample_idx > 0, frame, jnp.zeros_like(frame))
    color = jnp.where(finite, radiance, prev)
    return merge_pass(frame, color, sample_idx, 1.0, max_lum), rays_traced


@partial(jax.jit, static_argnames=("width", "height", "max_bounces", "loop"))
def render_pass(
    scene: T.SceneData,
    frame: jnp.ndarray,  # (H*W, 3) running average
    sample_idx: jnp.ndarray,  # () i32
    offset: jnp.ndarray,  # (2,) subpixel offset
    max_lum: jnp.ndarray,  # ()
    *,
    width: int,
    height: int,
    max_bounces: int,
    loop: str = "while",
):
    """One progressive pass: 1 sample for every pixel, merged draw2-style.

    Pixel layout matches the reference framebuffer: index = x + y*width with
    v measured from the bottom (main.cpp:156-157) — flip rows for display.
    Returns (frame', rays_traced).
    """
    pix = jnp.arange(width * height, dtype=jnp.uint32)
    return render_pixels(
        scene, frame, pix, sample_idx, offset, max_lum,
        width=width, height=height, max_bounces=max_bounces, loop=loop,
    )


def render(
    scene: T.SceneData,
    width: int,
    height: int,
    spp: int,
    max_bounces: int = 32,
    max_lum: float = 1000.0,
    loop: str = "while",
    progress=None,
):
    """Full progressive render. Returns (frame (H,W,3) linear, stats dict).

    Host loop over sample passes (the reference's work_queue_dynamic outer
    dimension, work_queue.cpp:158-175); each pass is one fused device program
    over all pixels.
    """
    import time as _time

    offs, ns = sample_offsets(spp)
    frame = jnp.zeros((width * height, 3), jnp.float32)
    ray_counts = []  # device scalars; summed once at the end (no per-pass sync)
    t0 = _time.perf_counter()
    ml = jnp.float32(max_lum)
    for i in range(ns):
        frame, rays_traced = render_pass(
            scene, frame, jnp.int32(i), offs[i], ml,
            width=width, height=height, max_bounces=max_bounces, loop=loop,
        )
        ray_counts.append(rays_traced)
        if progress is not None:
            progress(i + 1, ns, frame)
    frame.block_until_ready()
    elapsed = _time.perf_counter() - t0
    total_rays = float(sum(ray_counts))
    stats = {
        "seconds": elapsed,
        "rays": total_rays,
        "mrays_per_s": total_rays / elapsed / 1e6 if elapsed > 0 else 0.0,
        "spp": ns,
    }
    return frame.reshape(height, width, 3), stats
