#!/usr/bin/env python
"""Same-session sweep of the fused AD step's (spp_step, scan_steps) knobs.

Why: the bench headline's (pack=16, spp_step=8) defaults come from the
round-2 sweep of the PACKED scan path; the fused custom-VJP step (round 3)
and the k_sub multi-bounce step (round 5) changed the cost model. In the
fused path one lane = one pixel tracing `spp_step` samples sequentially, and
the scan length defaults to spp*6 + bounces + 1 — the (bounces+1)=33-step
drain tail is a FIXED cost amortized over spp samples (40% of the scan at
spp=8, 26% at 16, 15% at 32). More spp per step is the same estimator over
a longer claim window (claim_limit = scan_steps - 33 scales with it), so
done_frac stays ~1 and nothing is biased; the knob only changes how much
scan-tail overhead each traced ray carries.

Protocol: one process, one chip, all configs compiled up front, then K
interleaved slope-timed rounds (the round-4 timing-integrity rules: value
-transfer fences, slope differencing to cancel tunnel RTT). Reports
Mrays/s (per-config exact traced-ray counters) + done_frac per config.

Reference for the metric: bench.py (the driver scoreboard).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def slope_seconds(call, fence, k):
    t0 = time.perf_counter()
    call()
    fence()
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(1 + k):
        call()
    fence()
    t_many = time.perf_counter() - t0
    return max(t_many - t_one, 1e-9) / k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=500)
    ap.add_argument("--height", type=int, default=500)
    ap.add_argument("--bounces", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=2, help="slope window calls")
    ap.add_argument("--scene", type=str, default="cornell_box")
    ap.add_argument("--configs", type=str, default="",
                    help="override the config grid: 'spp/scan,spp/scan,...' "
                         "(scan 0 = the spp*6+bounces+1 auto formula)")
    args = ap.parse_args()

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from miniraytracer_tpu.models import integrator as integ
    from miniraytracer_tpu.models import scenes as S
    from miniraytracer_tpu.ops import bounce_ad
    from miniraytracer_tpu.parallel import (extract_params, make_mesh,
                                            make_train_step)
    from miniraytracer_tpu.parallel.render import make_frame, render_pass_sharded

    W, H, B = args.width, args.height, args.bounces
    scene = getattr(S, args.scene)(W / H)
    mesh = make_mesh(len(jax.devices()), 1)
    offs, _ = integ.sample_offsets(64)
    ml = jnp.float32(1000.0)

    # (spp_step, scan_steps): 0 = the spp*6+33 default; trimmed variants
    # probe how much drain tail the claim gate actually needs. Full round-5
    # measured grid (cornell 500x500x32, done_frac / median Mrays/s):
    #   auto scan:  8/81 .99977 142 | 16/129 .99988 180 | 32/225 .99993 211
    #               64/417 .99996 228 | 128/801 .99997 239
    #   trimmed:    8/65 .98680 173 | 16/105 .99426 218 | 32/185 .99646 253
    #               32/165 .98840 279 | 64/345 .99742 274 | 64/305 .99006 306
    #               96/501 .99740 284 | 128/657 .99740 289  <- bench default
    # Adoption bar: done_frac >= 0.997 (trimming monotonically raises
    # Mrays/s by unstarting samples, so the knob needs a stated criterion).
    configs = [
        (8, 0),     # the pre-round-5 bench default (scan 81)
        (32, 185),
        (64, 345),
        (128, 0),   # zero-trim reference (scan 801)
        (128, 657),  # adopted bench default
    ]
    if args.configs:
        configs = [tuple(int(v) for v in c.split("/"))
                   for c in args.configs.split(",")]

    target = make_frame(W, H, mesh)
    target, _ = render_pass_sharded(
        scene, target, jnp.int32(0), offs, ml,
        width=W, height=H, max_bounces=B, mesh=mesh, loop="while")
    jax.block_until_ready(target)
    params0 = extract_params(scene)
    lr = jnp.float32(0.0)
    pix_all = jnp.arange(W * H, dtype=jnp.uint32)

    entries = []
    for spp, ss in configs:
        step = make_train_step(mesh, width=W, height=H, max_bounces=B,
                               pack=16, scan_steps=ss, spp_step=spp,
                               fused_ad=True)
        # exact traced rays + completed-sample fraction for this config
        _s, nv, step_rays = bounce_ad.sample_pixel_sums_fused(
            scene, pix_all, 0, spp, width=W, height=H, max_bounces=B,
            scan_steps=ss)
        done = float(nv.sum()) / (W * H * spp)
        rays = float(step_rays)
        params, loss, _ = step(params0, scene, target, jnp.int32(0), offs, lr)
        params, loss, _ = step(params, scene, target, jnp.int32(1), offs, lr)
        float(loss)  # value-transfer fence before any timing
        entries.append(dict(spp=spp, ss=ss, step=step, rays=rays, done=done,
                            params=params, loss=loss, i=2, secs=[]))
        print(f"[compile] spp={spp} ss={ss or spp*6+B+1} done={done:.5f} "
              f"rays/step={rays/1e6:.2f}M", flush=True)

    for rep in range(args.reps):
        for e in entries:
            def call(e=e):
                e["i"] += 1
                e["params"], e["loss"], _ = e["step"](
                    e["params"], scene, target, jnp.int32(e["i"]), offs, lr)

            def fence(e=e):
                float(e["loss"])

            e["secs"].append(slope_seconds(call, fence, args.k))
        print(f"[rep {rep}] " + "  ".join(
            f"{e['spp']}/{e['ss'] or e['spp']*6+B+1}:"
            f"{e['rays']/e['secs'][-1]/1e6:.1f}" for e in entries),
            flush=True)

    print("\nspp  scan  done     Mrays/s (median of reps)   windows")
    for e in entries:
        mr = [e["rays"] / s / 1e6 for s in e["secs"]]
        print(f"{e['spp']:>3}  {e['ss'] or e['spp']*6+B+1:>4}  "
              f"{e['done']:.5f}  {statistics.median(mr):8.1f}   "
              + " ".join(f"{v:.1f}" for v in mr))


if __name__ == "__main__":
    main()
