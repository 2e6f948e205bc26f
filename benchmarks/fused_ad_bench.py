#!/usr/bin/env python
"""On-chip validation + timing of the fused custom-VJP bounce step.

1. Exactness: fused forward (sum, nvalid) and TrainParams gradients vs the
   XLA packed scan path at a small config (both on-chip).
2. Headline timing: full 500x500 Cornell train step, fused vs packed, with an
   spp_step sweep for the fused path.

Usage: python benchmarks/fused_ad_bench.py [--quick]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.models import integrator as integ
from miniraytracer_tpu.models import scenes as S
from miniraytracer_tpu.ops import bounce_ad
from miniraytracer_tpu.parallel import (
    extract_params, make_mesh, make_train_step,
)
from miniraytracer_tpu.parallel.render import make_frame, render_pass_sharded


def check_exactness(scene, W=24, H=24, spp=2, B=8):
    from tests.test_bounce_ad import (  # reuse the parity harness
        _fold_packed, _loss_fused, _loss_packed, _scan_steps,
    )

    steps = _scan_steps(spp, B)
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    sum_x, nv_x, done = _fold_packed(scene, pix, spp, W, H, B, steps)
    assert bool(done.all())
    sum_f, nv_f, _ = bounce_ad.sample_pixel_sums_fused(
        scene, pix, 0, spp, width=W, height=H, max_bounces=B,
        scan_steps=steps)
    nv_eq = bool((np.asarray(nv_f) == np.asarray(nv_x)).all())
    d = np.abs(np.stack([sum_f.x, sum_f.y, sum_f.z], -1)
               - np.asarray(sum_x)).max()
    print(f"forward: nvalid equal={nv_eq}  max sum diff={d:.3e}")

    params = extract_params(scene)
    target = jnp.full((W * H, 3), 0.25, jnp.float32)
    lf, gf = jax.value_and_grad(_loss_fused)(
        params, scene, pix, spp, W, H, B, steps, target)
    lx, gx = jax.value_and_grad(_loss_packed)(
        params, scene, pix, spp, W, H, B, steps, target)
    print(f"loss: fused={float(lf):.6f} xla={float(lx):.6f}")
    worst = 0.0
    for name, a, b in zip(gf._fields, gf, gx):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-3)
        rel = np.abs(a - b).max() / scale
        worst = max(worst, rel)
        print(f"  grad {name:<10} ref|max|={np.abs(b).max():.4e} "
              f"rel-err={rel:.3e}")
    ok = worst < 5e-3 and nv_eq and d < 1e-4
    print(f"exactness: {'OK' if ok else 'FAIL'} (worst grad rel {worst:.3e})")
    return ok


def time_step(scene, W, H, B, *, fused, pack, spp_step, steps=4,
              scan_steps=0):
    mesh = make_mesh(len(jax.devices()), 1)
    offs, _ = integ.sample_offsets(64)
    frame = make_frame(W, H, mesh)
    frame, _ = render_pass_sharded(
        scene, frame, jnp.int32(0), offs, jnp.float32(1000.0),
        width=W, height=H, max_bounces=B, mesh=mesh, loop="while")
    step = make_train_step(mesh, width=W, height=H, max_bounces=B,
                           pack=pack, scan_steps=scan_steps,
                           spp_step=spp_step, fused_ad=fused)
    params = extract_params(scene)
    lr = jnp.float32(0.0)
    params, loss, _ = step(params, scene, frame, jnp.int32(0), offs, lr)
    params, loss, _ = step(params, scene, frame, jnp.int32(0), offs, lr)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for i in range(steps):
        params, loss, _ = step(params, scene, frame, jnp.int32(i), offs, lr)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / steps

    if fused:
        pix_all = jnp.arange(W * H, dtype=jnp.uint32)
        _s, nv, rays = bounce_ad.sample_pixel_sums_fused(
            scene, pix_all, 0, spp_step, width=W, height=H, max_bounces=B,
            scan_steps=scan_steps)
        rays = float(rays)
        done = float(nv.sum()) / (W * H * spp_step)
    else:
        _, pass_rays = render_pass_sharded(
            scene, make_frame(W, H, mesh), jnp.int32(0), offs,
            jnp.float32(1000.0), width=W, height=H, max_bounces=B, mesh=mesh,
            loop="scan")
        rays = float(pass_rays) * spp_step
        done = 1.0
    mrays = rays / dt / 1e6
    tag = "fused" if fused else f"packed(pack={pack})"
    print(f"{tag:>16} spp_step={spp_step:<3} {dt*1e3:8.1f} ms/step  "
          f"{mrays:8.2f} Mrays/s  done={done:.4f}  loss={float(loss):.5f}")
    return mrays


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--skip-exact", action="store_true")
    args = ap.parse_args()

    scene = S.cornell_box(1.0)
    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    print(f"can_fuse_ad(cornell)={bounce_ad.can_fuse_ad(scene)}")

    if not args.skip_exact:
        if not check_exactness(scene):
            print("ABORT: exactness failed")
            return

    W = H = 500
    B = 32
    print(f"\n-- headline config {W}x{H} x{B} bounces --")
    time_step(scene, W, H, B, fused=False, pack=16, spp_step=8)
    for spp_step in ([8] if args.quick else [4, 8, 16, 32]):
        time_step(scene, W, H, B, fused=True, pack=1, spp_step=spp_step)


if __name__ == "__main__":
    main()
