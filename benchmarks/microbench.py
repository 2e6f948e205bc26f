"""Microbenchmark suite — the reference's Benchmarks/ (Google Benchmark over
SIMD variants) translated to the TPU build's hot primitives.

Methodology: the axon TPU tunnel adds a large, variable per-dispatch RTT,
so naive timing measures the network. Every benchmark here is SLOPE-timed:
the op is chained N1 and N2 times inside one `lax.scan` program (data
dependency prevents elision) and the per-iteration cost is
(T(N2) - T(N1)) / (N2 - N1) — dispatch and transfer cancel.

Run:  python benchmarks/microbench.py [--n 250000] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=250000, help="ray/lane count")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from miniraytracer_tpu.models.scenes import cornell_box, triangles
    from miniraytracer_tpu.ops import flash, intersect as ix, lookup, rng
    from miniraytracer_tpu.ops.vecmath import V3, vnormalize, vcross, vdot

    N = args.n
    key = jax.random.PRNGKey(0)

    def slope(name, step, init, n1=10, n2=50):
        def chain(x, iters):
            out, _ = jax.lax.scan(lambda c, _: (step(c), None), x, None, length=iters)
            return out
        times = {}
        for iters in (n1, n2):
            jc = jax.jit(lambda x, it=iters: chain(x, it))
            o = jc(init)
            _ = float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))
            best = 1e18
            for _rep in range(2):
                t0 = time.perf_counter()
                o = jc(init)
                _ = float(jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))
                best = min(best, time.perf_counter() - t0)
            times[iters] = best
        per = (times[n2] - times[n1]) / (n2 - n1)
        results.append({"name": name, "us_per_iter": round(per * 1e6, 2),
                        "ns_per_lane": round(per / N * 1e9, 4)})
        if not args.json:
            print(f"{name:34s} {per*1e6:10.1f} us/iter  {per/N*1e9:8.3f} ns/lane", flush=True)

    results = []
    x0 = jax.random.normal(key, (N,))

    # --- vec core (bench_vec3.cpp analogues) ---
    v1 = V3(x0, x0 * 0.5, x0 * 0.25)
    slope("v3 dot+mul chain", lambda x: x + vdot(v1, v1) * 1e-9, x0)
    slope("v3 cross+normalize", lambda x: x + vnormalize(vcross(v1, V3(x, x, x))).x * 1e-9, x0)
    slope("rng pcg_hash+uniform", lambda x: x + rng.uniform(x.astype(jnp.uint32), 0) * 1e-9, x0)

    # --- lookup strategies ---
    K = 512
    tab = jax.random.normal(key, (K,))
    idx0 = jax.random.randint(key, (N,), 0, K)
    slope("lookup 1 col K=512", lambda i: (i + lookup.lookup_cols(i, (tab,))[0].astype(jnp.int32)) % K, idx0)

    # --- intersection sweeps on real scenes ---
    cornell = cornell_box(1.0)
    ro = V3(jnp.full((N,), 278.0), jnp.full((N,), 278.0), jnp.full((N,), -790.0))
    rd = vnormalize(V3(x0 * 0.1, x0 * 0.05, jnp.ones((N,))))
    zeros_i = jnp.zeros((N,), jnp.int32)

    def mkrays(xx):
        return ix.Rays(ro=V3(xx * 0 + 278.0, ro.y, ro.z), rd=rd, time=jnp.zeros(N), inside=zeros_i)

    slope("scene_hit cornell (19 prims)",
          lambda xx: xx + ix.scene_hit(cornell, mkrays(xx)).t * 1e-12, x0)

    tri = triangles(1.0)
    m = V3(tri.tri_m[:, 0], tri.tri_m[:, 1], tri.tri_m[:, 2])
    u = V3(tri.tri_u[:, 0], tri.tri_u[:, 1], tri.tri_u[:, 2])
    v = V3(tri.tri_v[:, 0], tri.tri_v[:, 1], tri.tri_v[:, 2])
    coeffs = flash.tri_coefficients(m, u, v, tri.tri_active)
    if flash.HAVE_PALLAS and jax.default_backend() == "tpu":
        slope("flash_tri 11.3k tris",
              lambda xx: xx + flash.flash_tri_hit(coeffs, V3(xx * 0 + 278.0, ro.y, ro.z), rd, zeros_i, 1e-3)[0] * 1e-12,
              x0, n1=4, n2=12)
    slope("brute tri sweep 11.3k tris",
          lambda xx: xx + ix._chunked_min(
              lambda s, c: ix.tri_ts(tri, mkrays(xx), s, c, ix.TMIN, jnp.full((N,), ix.INF)),
              tri.n_tris, N)[0] * 1e-12,
          x0, n1=2, n2=6)

    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
