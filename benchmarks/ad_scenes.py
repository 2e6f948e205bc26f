"""Differentiable-path (forward+backward) throughput for ALL nine scenes.

The north star asks for gradients w.r.t. albedo/emission/geometry as a
first-class capability — this publishes the per-scene train-step table
(VERDICT round 3 item 3): one full differentiable render step (forward
render of `spp_step` samples/pixel + reverse sweep producing TrainParams
gradients) at the reference's Cornell headline config (500x500, 32-bounce
cap). Scenes eligible for the fused custom-VJP bounce kernel
(bounce_ad.can_fuse_ad) use it; the rest run the packed regeneration-in-
scan XLA path with the culled custom-VJP intersection kernels.

Run on the TPU:  python benchmarks/ad_scenes.py [scene ...]
Prints one result line per scene and a JSON summary line at the end.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from miniraytracer_tpu.models import integrator as integ  # noqa: E402
from miniraytracer_tpu.models import scenes as S  # noqa: E402
from miniraytracer_tpu.ops import bounce_ad  # noqa: E402
from miniraytracer_tpu.parallel import (  # noqa: E402
    extract_params, make_mesh, make_train_step,
)
from miniraytracer_tpu.parallel.render import (  # noqa: E402
    make_frame, render_pass_sharded,
)

BASELINE_MRAYS = 8.0  # measured reference CPU forward (see bench.py)
SCENES = ["random_spheres", "random_spheres_2", "two_spheres",
          "perlin_spheres", "earth", "cornell_box", "cornell_smoke",
          "book2_final", "triangles"]


def measure_scene(name: str, *, width=500, height=500, bounces=32,
                  pack=16, spp_step=8, steps=4, scan_steps=0):
    scene = getattr(S, name)(width / height)
    mesh = make_mesh(len(jax.devices()), 1)
    offs, _ = integ.sample_offsets(64)
    ml = jnp.float32(1000.0)
    fused = bounce_ad.can_fuse_ad(scene)
    if not fused and bounce_ad.can_fuse_ad_ext(scene):
        from miniraytracer_tpu.ops import hybrid as _H

        # same measured policy as the forward auto-pick: ext-material +
        # image scenes train faster on the packed scan (random_spheres_2
        # on-chip: ext 2.40 vs packed 2.71 Mrays/s)
        if not (_H.ext_mat_mode(scene) and scene.has_image):
            fused = "ext"  # hybrid-ext fused step (culled VJP kernels)

    # target frame: one progressive pass
    frame = make_frame(width, height, mesh)
    frame, _ = render_pass_sharded(
        scene, frame, jnp.int32(0), offs, ml,
        width=width, height=height, max_bounces=bounces, mesh=mesh,
        loop="while",
    )
    jax.block_until_ready(frame)

    step = make_train_step(mesh, width=width, height=height,
                           max_bounces=bounces, pack=pack,
                           spp_step=spp_step, fused_ad=fused,
                           scan_steps=scan_steps, scene=scene)
    params = extract_params(scene)
    lr = jnp.float32(0.0)

    # traced-ray accounting (same protocol as bench.py): the step's forward
    # trip count, measured with the exact item list the step renders
    if fused:
        pix_all = jnp.arange(width * height, dtype=jnp.uint32)
        _s, nv, step_rays = bounce_ad.sample_pixel_sums_fused(
            scene, pix_all, 0, spp_step, width=width, height=height,
            max_bounces=bounces, scan_steps=scan_steps,
            use_ext=(fused == "ext"))
        rays = float(step_rays)
        done_frac = float(nv.sum()) / (width * height * spp_step)
    else:
        pix_all = jnp.tile(jnp.arange(width * height, dtype=jnp.uint32),
                           spp_step)
        samp_all = jnp.repeat(jnp.arange(spp_step, dtype=jnp.int32),
                              width * height)
        off_all = offs[samp_all % offs.shape[0]]
        pad = (-pix_all.shape[0]) % pack
        if pad:
            pix_all = jnp.concatenate(
                [pix_all, jnp.full((pad,), width * height - 1, jnp.uint32)])
            samp_all = jnp.concatenate([samp_all, samp_all[-1:].repeat(pad)])
            off_all = jnp.concatenate(
                [off_all, jnp.broadcast_to(off_all[-1:], (pad, 2))])
        _, done_mask, ray_ctr = integ.sample_radiance_packed(
            scene, pix_all, samp_all, off_all, width=width, height=height,
            max_bounces=bounces, pack=pack, scan_steps=scan_steps)
        done_frac = float(done_mask.mean())
        rays = float(ray_ctr)

    # two warmups (second compiles the fed-back param shardings)
    params, loss, grads = step(params, scene, frame, jnp.int32(0), offs, lr)
    params, loss, grads = step(params, scene, frame, jnp.int32(0), offs, lr)
    # NOT block_until_ready: a device->host VALUE transfer is the only
    # completion signal the remote-tunnel backend cannot fake (mid-sweep,
    # block_until_ready intermittently returned in ~1 ms on a 2.5 s step)
    float(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        params, loss, grads = step(params, scene, frame, jnp.int32(i), offs,
                                   lr)
    float(loss)
    dt = (time.perf_counter() - t0) / steps
    finite = all(bool(jnp.isfinite(g).all())
                 for g in jax.tree_util.tree_leaves(grads))
    mrays = rays / dt / 1e6
    return {
        "scene": name, "fwdbwd_mrays_per_s": round(mrays, 3),
        "vs_baseline": round(mrays / BASELINE_MRAYS, 3),
        "path": ({True: "fused-vjp", "ext": "fused-vjp-ext"}.get(fused, "packed-scan")),
        "step_seconds": round(dt, 3), "rays_per_step": rays,
        "done_frac": round(done_frac, 5), "grads_finite": finite,
        "loss": float(loss),
    }


def main():
    names = sys.argv[1:] or SCENES
    results = []
    for name in names:
        try:
            r = measure_scene(name)
        except Exception as e:  # keep sweeping; report the failure
            r = {"scene": name, "error": f"{type(e).__name__}: {e}"}
        print(r, flush=True)
        results.append(r)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
