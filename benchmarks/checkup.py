"""On-chip regression checkup: one run validates every production kernel
path against the dense oracles AND every scene's image statistics against
the REAL reference renderer's archive (tests/reference_renders.npz).

The CPU test suite covers all of this in interpret mode; this harness is
the on-device complement (TPU MXU precision, Mosaic lowering, the real
accel dispatch) built to spend tunnel time efficiently: run it inside the
persistent worker (benchmarks/tpu_worker.py) after kernel changes.

Prints PASS/FAIL lines; exits nonzero on any FAIL when run as a script.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FAILS = []


def check(name, ok, detail=""):
    tag = "PASS" if ok else "FAIL"
    print(f"{tag} {name}  {detail}", flush=True)
    if not ok:
        FAILS.append(name)


def kernel_exactness():
    import jax.numpy as jnp

    from miniraytracer_tpu.ops import flash
    from miniraytracer_tpu.ops.vecmath import V3
    from miniraytracer_tpu.models import scenes as S

    sc = S.triangles(1.0)
    m3 = V3(sc.tri_m[:, 0], sc.tri_m[:, 1], sc.tri_m[:, 2])
    u3 = V3(sc.tri_u[:, 0], sc.tri_u[:, 1], sc.tri_u[:, 2])
    v3 = V3(sc.tri_v[:, 0], sc.tri_v[:, 1], sc.tri_v[:, 2])
    coeffs = flash.tri_coefficients(m3, u3, v3, sc.tri_active)
    cull = flash.tri_cull_build(m3, u3, v3, sc.tri_active, coeffs)

    n = 1 << 15
    rng = np.random.default_rng(3)
    ro_ = rng.uniform([-50, -50, -50], [600, 600, 600], (n, 3)).astype(np.float32)
    rd_ = rng.standard_normal((n, 3)).astype(np.float32)
    rd_ /= np.linalg.norm(rd_, axis=1, keepdims=True)
    ro = V3(*[jnp.asarray(ro_[:, i]) for i in range(3)])
    rd = V3(*[jnp.asarray(rd_[:, i]) for i in range(3)])
    inside = jnp.asarray((rng.uniform(size=n) < 0.2).astype(np.int32))

    t_ref, _ = flash.flash_tri_hit(coeffs, ro, rd, inside, 0.001)
    t_ref = np.asarray(t_ref)
    for lbl, fn in (("tri_resident", flash.flash_tri_hit_resident),
                    ("tri_streamed", flash.flash_tri_hit_streamed)):
        t_, _ = fn(cull, ro, rd, inside, 0.001)
        check(f"kernel {lbl} exact",
              np.array_equal(np.asarray(t_), t_ref))

    sp = S.random_spheres(1.0)
    sco = flash.sphere_coefficients(sp)
    scull = flash.sph_cull_build(sp, sco)
    time_ = jnp.asarray(rng.uniform(0, 1, n).astype(np.float32))
    ro2_ = rng.uniform([-12, 0, -12], [12, 4, 12], (n, 3)).astype(np.float32)
    ro2 = V3(*[jnp.asarray(ro2_[:, i]) for i in range(3)])
    t_d, _ = flash.flash_sphere_hit(sco, ro2, rd, time_, inside, 0.001)
    t_d = np.asarray(t_d)
    for lbl, fn in (("sph_gated", flash.flash_sphere_hit_gated),
                    ("sph_streamed", flash.flash_sphere_hit_streamed)):
        t_, _ = fn(scull, ro2, rd, time_, inside, 0.001)
        check(f"kernel {lbl} exact",
              np.array_equal(np.asarray(t_), t_d))


def scene_parity(tol=0.02):
    """All nine scenes at the archive config (100x100 x 64 spp, depth 16)
    through the PRODUCTION auto renderer; channel means vs the real
    reference binary's frames."""
    import jax

    from miniraytracer_tpu.models import integrator as integ
    from miniraytracer_tpu.models import scenes as S

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "reference_renders.npz")
    ref = np.load(path)
    for name in ref.files:
        gen = getattr(S, name, None)
        if gen is None:
            continue
        sc = gen(1.0)
        t0 = time.perf_counter()
        f, st = integ.render_auto(sc, 100, 100, 64, 16)
        jax.block_until_ready(f)
        el = time.perf_counter() - t0
        ours = np.asarray(f).reshape(-1, 3).mean(axis=0)
        theirs = np.asarray(ref[name]).reshape(-1, 3).mean(axis=0)
        rel = np.abs(ours - theirs) / np.maximum(np.abs(theirs), 1e-6)
        check(f"parity {name}", bool((rel < tol).all()),
              f"rel {np.round(rel, 4)} ({el:.1f}s)")


def _render_by_name(which, scene, w, h, spp, bounces):
    from miniraytracer_tpu.models import integrator as integ

    if which == "fused":
        from miniraytracer_tpu.ops import bounce

        return bounce.render_wavefront_fused(scene, w, h, spp, bounces)
    if which == "workqueue":
        return integ.render_workqueue(scene, w, h, spp, bounces)
    if which == "hybrid":
        from miniraytracer_tpu.ops import hybrid

        return hybrid.render_wavefront_hybrid(scene, w, h, spp, bounces)
    return integ.render_wavefront(scene, w, h, spp, bounces)


def auto_pick_check(margin=0.9, spp=16):
    """pick_renderer's hard-coded thresholds (integrator.py) are one-chip
    constants: this measures the PICKED renderer against the runner-up in
    the same session and fails if the pick loses by more than `margin`
    (catches silent drift on a new chip generation / image size / scene
    mix — VERDICT r4 weak #3). Slope-timed with value-transfer fences."""
    import jax.numpy as jnp

    from miniraytracer_tpu.models import integrator as integ
    from miniraytracer_tpu.models import scenes as S
    from miniraytracer_tpu.ops import hybrid

    runner_up = {
        "fused": lambda sc: "workqueue",
        "workqueue": lambda sc: ("hybrid" if hybrid.can_hybrid(sc)
                                 else "wavefront"),
        "hybrid": lambda sc: "workqueue",
        "wavefront": lambda sc: ("hybrid" if hybrid.can_hybrid(sc)
                                 else "workqueue"),
    }

    def slope_window(which, sc):
        def once():
            f, st = _render_by_name(which, sc, 500, 500, spp, 32)
            return f, st

        t0 = time.perf_counter()
        f, st = once()
        float(jnp.asarray(f).ravel()[0])
        t_one = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(3):
            f, st = once()
        float(jnp.asarray(f).ravel()[0])
        t_three = time.perf_counter() - t0
        return st["rays"] / max((t_three - t_one) / 2.0, 1e-9) / 1e6

    for name in ("two_spheres", "cornell_box", "perlin_spheres", "earth",
                 "random_spheres", "random_spheres_2", "book2_final",
                 "triangles"):
        sc = getattr(S, name)(1.0)
        pick = integ.pick_renderer(sc)
        other = runner_up.get(pick, lambda sc: "wavefront")(sc)
        # warm both, then TWO interleaved windows each, best-of (a single
        # window's few-hundred-ms RTT swing can flip the ratio — see
        # bench.py's median-of-windows rationale); best-of is symmetric
        # across the pair, so a spurious FAIL needs the same transient to
        # hit the pick twice
        for which in (pick, other):
            f, _ = _render_by_name(which, sc, 500, 500, spp, 32)
            float(jnp.asarray(f).ravel()[0])
        m_pick = m_other = 0.0
        for _ in range(2):
            m_pick = max(m_pick, slope_window(pick, sc))
            m_other = max(m_other, slope_window(other, sc))
        check(f"auto-pick {name}", m_pick >= margin * m_other,
              f"picked {pick} {m_pick:.1f} vs {other} {m_other:.1f} Mrays/s")


def ksub_grad_parity():
    """Compiled gradient parity for the multi-bounce AD kernel (k_sub>1):
    loss and TrainParams cotangents at sub_steps=4 must match sub_steps=1
    (the CPU suite asserts only the forward — the interpret-mode vjp of
    chained bounce bodies is impractical there)."""
    import jax
    import jax.numpy as jnp

    from miniraytracer_tpu.models import scenes as S
    from miniraytracer_tpu.ops import bounce_ad
    from miniraytracer_tpu.parallel.train import (apply_params,
                                                  extract_params)

    scene = S.cornell_box(1.0)
    W = H = 64
    spp, B = 4, 8
    pix = jnp.arange(W * H, dtype=jnp.uint32)
    params = extract_params(scene)
    target = jnp.full((W * H, 3), 0.25, jnp.float32)

    def loss(params, ks):
        sc = apply_params(scene, params)
        summ, nv, _ = bounce_ad.sample_pixel_sums_fused(
            sc, pix, 0, spp, width=W, height=H, max_bounces=B,
            sub_steps=ks)
        mean = (jnp.stack([summ.x, summ.y, summ.z], -1)
                / jnp.maximum(nv, 1.0)[:, None])
        err = jnp.where(nv[:, None] > 0, mean - target, 0.0)
        return jnp.sum(err * err)

    l1, g1 = jax.value_and_grad(lambda p: loss(p, 1))(params)
    l4, g4 = jax.value_and_grad(lambda p: loss(p, 4))(params)
    ok = abs(float(l4) - float(l1)) <= 1e-4 * max(abs(float(l1)), 1e-9)
    worst = 0.0
    for name in params._fields:
        a = np.asarray(getattr(g1, name))
        b = np.asarray(getattr(g4, name))
        scale = max(np.abs(a).max(), 1e-8)
        worst = max(worst, float(np.abs(a - b).max() / scale))
    ok = ok and worst < 1e-3
    check("ksub grad parity", ok,
          f"loss {float(l1):.6f} vs {float(l4):.6f}, worst rel {worst:.2e}")


def main():
    kernel_exactness()
    scene_parity()
    ksub_grad_parity()
    auto_pick_check()
    print(f"checkup: {len(FAILS)} failures", flush=True)
    return 1 if FAILS else 0


if __name__ == "__main__":
    sys.exit(main())
