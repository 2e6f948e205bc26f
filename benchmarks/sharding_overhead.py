"""Sharding-overhead curve on the virtual CPU mesh (SURVEY.md section 2.2).

Real 1->N-host scaling is untestable in a single-chip environment, so this
bounds the SPMD program's *overhead* instead: render a FIXED total frame
(same pixels, same spp) on dp in {1, 2, 4, 8} virtual CPU devices. The
host's cores are shared by all virtual devices, so the total compute work
per wall-second is constant across dp; any wall-time increase over dp=1 is
sharding overhead (pixel padding to dp multiples, the sp psum, per-device
dispatch, and shard_map bookkeeping).

The frame is 250x250 (62,500 pixels - NOT divisible by 8) so the padding
path is exercised at every dp.

Usage:  python benchmarks/sharding_overhead.py [--spp 16] [--bounces 16]
Writes benchmarks/sharding_overhead.json and prints a table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from miniraytracer_tpu.models import scenes  # noqa: E402
from miniraytracer_tpu.parallel.mesh import make_mesh  # noqa: E402
from miniraytracer_tpu.parallel.render import render_wavefront_distributed  # noqa: E402


def time_render(scene, w, h, spp, mesh, bounces, reps=3):
    # warm (compile)
    render_wavefront_distributed(scene, w, h, spp, mesh, max_bounces=bounces)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        frame, stats = render_wavefront_distributed(
            scene, w, h, spp, mesh, max_bounces=bounces)
        best = min(best, time.perf_counter() - t0)
    return best, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--bounces", type=int, default=16)
    ap.add_argument("--size", type=int, default=250)
    args = ap.parse_args()

    assert jax.devices()[0].platform == "cpu" and len(jax.devices()) >= 8
    scene = scenes.cornell_box(1.0)
    w = h = args.size

    rows = []
    t1 = None
    for dp in (1, 2, 4, 8):
        mesh = make_mesh(dp, 1)
        t, stats = time_render(scene, w, h, args.spp, mesh, args.bounces)
        if t1 is None:
            t1 = t
        overhead = t / t1 - 1.0
        rows.append(dict(dp=dp, seconds=round(t, 3),
                         overhead_vs_dp1=round(overhead, 4),
                         mrays_per_s=round(stats["mrays_per_s"], 3)))
        print(f"dp={dp}:  {t:7.3f} s   overhead {overhead*100:+6.1f}%   "
              f"{stats['mrays_per_s']:.2f} Mrays/s")

    out = dict(
        method="fixed total work (250x250, spp=%d, bounces=%d) on shared-core "
               "virtual CPU devices; overhead = t(dp)/t(dp=1) - 1" %
               (args.spp, args.bounces),
        host_cores=os.cpu_count(), rows=rows,
    )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "sharding_overhead.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
