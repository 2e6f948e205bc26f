#!/usr/bin/env python
"""Headline benchmark: Mrays/s/chip forward+backward on Cornell box 500x500.

The north-star metric (BASELINE.json): a full differentiable render step —
forward wavefront trace + reverse-mode sweep producing gradients w.r.t.
material albedo, emission, and sphere/triangle geometry — at the reference's
default Cornell configuration (500x500, 32-bounce cap, cmdline_parser.h:6-15).

Baseline: MEASURED, not estimated — we built the reference headless as a
test oracle (REFERENCE_PARITY.md) and ran it on this machine's CPU:
scene 5 (Cornell), 500x500 x 16 spp x depth 32, 8 threads ->
12.19M rays / 1.52 s = 8.0 Mrays/s, forward only (the reference has no
backward pass at all). `vs_baseline` > 1 therefore means one TPU chip
computes forward AND backward faster than the whole reference CPU computes
forward. For reference, our forward-only number is reported in `extra`
(123 Mrays/s on the same config class, ~15x the reference CPU).

Prints exactly one JSON line.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import statistics
import subprocess
import sys
import time

BASELINE_MRAYS = 8.0  # measured: reference CPU, Cornell 500x500, 8 threads


CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_last.json")


def _health_probe(q):  # module-level: spawn requires picklability
    try:
        import jax.numpy as jnp

        q.put(float(jnp.ones((8,)).sum()) == 8.0)
    except Exception:
        q.put(False)


def _tpu_healthy(timeout_s: float = 240.0) -> bool:
    """Probe the device with a hard deadline (the axon tunnel can hang a
    trivial op for minutes when it is down). The deadline must cover the
    COLD first-op cost of a fresh process (~2-3 min measured even when the
    tunnel is up) — a 45 s probe reports false negatives forever."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_health_probe, args=(q,))
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.terminate()
        p.join()
        return False
    try:
        return bool(q.get_nowait())
    except Exception:
        return False


def _slope_seconds(call, fence, k: int) -> float:
    """Seconds per call by slope timing: time (1 call + fence) and
    (1+k calls + fence) and difference — cancels the ~0.3-0.6 s tunnel-RTT
    cost of the value-transfer fence (the only completion signal the
    tunnel backend cannot fake; see the in-line notes at the call sites)."""
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
    ap.add_argument("--fwd-passes", type=int, default=16)
    ap.add_argument("--fwdbwd-steps", type=int, default=4)
    ap.add_argument("--windows", type=int, default=3,
                    help="interleaved slope-timing windows per metric; the "
                         "headline is the median and the per-window values "
                         "land in extra (spread integrity, VERDICT r4)")
    ap.add_argument("--pack", type=int, default=16,
                    help="samples per lane in the packed AD scan (1 = legacy "
                         "full-width scan). Default from the on-chip joint "
                         "sweep (round 2): (pack, spp_step) = (16,8) 16.73, "
                         "(8,4) 14.53, (4,4) 10.89, (2,8) 6.75 Mrays/s "
                         "fwd+bwd on Cornell 500x500x32.")
    ap.add_argument("--scan-steps", type=int, default=-1,
                    help="AD scan trip count. -1 = auto: 657 on the fused "
                         "path (the round-5 sweep winner at the done>=0.997 "
                         "bar, benchmarks/spp_sweep.py; claim window 624), "
                         "0 (the spp*6+bounces+1 formula) otherwise.")
    ap.add_argument("--spp-step", type=int, default=-1,
                    help="samples per pixel per train step. -1 = auto: 128 "
                         "on the fused path (one lane = one pixel tracing "
                         "spp samples sequentially; the (bounces+1)-step "
                         "drain tail plus the alive-fraction decay of the "
                         "scan tail are FIXED costs amortized over spp — "
                         "round-5 same-session sweep: spp 8/16/32/64/128 at "
                         "auto scan = 142/180/211/228/239 Mrays/s, trimmed "
                         "at done>=0.997 = 274/284/289; see STATUS.md), "
                         "8 on the packed fallback (round-2 sweep).")
    ap.add_argument("--fused-ad", type=str, default="auto",
                    choices=["auto", "on", "off"],
                    help="use the fused custom-VJP bounce step "
                         "(ops/bounce_ad) for the train step when the scene "
                         "is fuse-eligible (auto), always (on), or never "
                         "(off).")
    ap.add_argument("--scene", type=str, default="cornell_box")
    ap.add_argument("--wait-minutes", type=float, default=45.0,
                    help="how long to wait for the TPU tunnel before falling "
                         "back to the cached result. The default covers a "
                         "full tunnel down-cycle plus the 2-4 min cold first "
                         "op (the 12-min default lost to the cycle in rounds "
                         "1 and 3).")
    args = ap.parse_args()

    # the axon tunnel cycles up/down; wait for an up-window, else report the
    # last successful measurement (flagged) rather than hanging the driver.
    # Every probe attempt is logged to stderr so a cached fallback is
    # auditable from the driver's capture.
    deadline = time.time() + args.wait_minutes * 60
    attempt = 0
    while True:
        attempt += 1
        t0 = time.time()
        healthy = _tpu_healthy()
        print(f"[bench] tpu probe #{attempt}: "
              f"{'UP' if healthy else 'down'} ({time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        if healthy or time.time() >= deadline:
            break
        time.sleep(45)
    if not healthy:
        if os.path.exists(CACHE):
            with open(CACHE) as f:
                cached = json.load(f)
            cached.setdefault("extra", {})["cached_from_previous_run"] = True
            cached["extra"]["reason"] = "tpu tunnel unreachable at bench time"
            print(json.dumps(cached))
            return
        print(json.dumps({
            "metric": "cornell_500x500_mrays_per_s_fwdbwd",
            "value": 0.0, "unit": "Mrays/s/chip", "vs_baseline": 0.0,
            "extra": {"error": "tpu tunnel unreachable and no cached result"},
        }))
        return

    import jax

    # persistent compile cache: the 500x500 fwd+bwd program is expensive to
    # compile and identical across bench runs
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_bench")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp

    from miniraytracer_tpu.models import integrator as integ
    from miniraytracer_tpu.models import scenes as S
    from miniraytracer_tpu.parallel import make_mesh, make_train_step, extract_params
    from miniraytracer_tpu.parallel.render import make_frame, render_pass_sharded

    W, H, B = args.width, args.height, args.bounces
    scene = getattr(S, args.scene)(W / H)
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, 1)
    offs, _ = integ.sample_offsets(64)
    ml = jnp.float32(1000.0)

    # ---- forward-only throughput (secondary) ----
    # primary fwd number: the production single-chip path (mrt.render /
    # render_auto — what the README table measures); the sharded wrapper
    # (render_wavefront_distributed) is reported separately. BOTH labeled:
    # round-4 same-session measurements showed the two paths swinging
    # 140-572 Mrays/s on Cornell with tunnel/session conditions, so a
    # single unlabeled "forward" number is not meaningful (VERDICT r3
    # weak #2)
    from miniraytracer_tpu.parallel.render import render_wavefront_distributed

    fwd_spp = 64
    frame_img, _ = render_wavefront_distributed(
        scene, W, H, fwd_spp, mesh, max_bounces=B, max_lum=1000.0
    )  # warmup/compile
    _, fstats = render_wavefront_distributed(
        scene, W, H, fwd_spp, mesh, max_bounces=B, max_lum=1000.0
    )
    rays_per_pass = fstats["rays"] / fwd_spp

    from miniraytracer_tpu.models.integrator import render_auto

    f0, astats = render_auto(scene, W, H, fwd_spp, max_bounces=B)  # warm
    float(jnp.asarray(f0).ravel()[0])  # REAL completion before the clock
    # starts (the warm call's internal block_until_ready can fake-return
    # on the tunnel backend, leaking its execution into the timed window
    # — observed as a 50x-low fwd number).
    # Slope timing: each fenced segment ends in ONE device->host VALUE
    # transfer (the only completion signal the tunnel backend cannot fake),
    # but that transfer costs a ~0.3-0.6 s tunnel RTT — comparable to the
    # render itself on fused scenes (measured: 2 fenced cornell renders in
    # 0.51 s of which ~0.28 s was the fence). Timing (1 render + fence) and
    # (1+K renders + fence) and differencing cancels the constant RTT.
    fwd_k = 4
    fwd_state = {}

    def _fwd_call():
        fwd_state["f"], fwd_state["a"] = render_auto(
            scene, W, H, fwd_spp, max_bounces=B)

    def _fwd_fence():
        float(jnp.asarray(fwd_state["f"]).ravel()[0])

    # target for the training step: a progressive-pass frame
    frame = make_frame(W, H, mesh)
    frame, _ = render_pass_sharded(
        scene, frame, jnp.int32(0), offs, ml,
        width=W, height=H, max_bounces=B, mesh=mesh, loop="while",
    )
    jax.block_until_ready(frame)

    # ---- forward+backward training step (headline) ----
    from miniraytracer_tpu.ops import bounce_ad

    fused = (args.fused_ad == "on"
             or (args.fused_ad == "auto" and bounce_ad.can_fuse_ad(scene)))
    # resolve the auto (-1) step-config defaults per path (see the argparse
    # help): the fused sweep winner would OOM the packed fallback (items =
    # pixels x spp there), so each path keeps its own tuned default
    if args.spp_step < 0:
        args.spp_step = 128 if fused else 8
    if args.scan_steps < 0:
        args.scan_steps = 657 if (fused and args.spp_step == 128) else 0
    step = make_train_step(mesh, width=W, height=H, max_bounces=B,
                           pack=args.pack, scan_steps=args.scan_steps,
                           spp_step=args.spp_step, fused_ad=fused)
    params = extract_params(scene)
    target = frame  # use the partially converged render as the target
    lr = jnp.float32(0.0)
    # measure rays of one scan-mode pass (the step's forward trip count)
    _, scan_rays = render_pass_sharded(
        scene, make_frame(W, H, mesh), jnp.int32(0), offs, ml,
        width=W, height=H, max_bounces=B, mesh=mesh, loop="scan",
    )
    # one step renders spp_step samples per pixel; discount the (tiny)
    # fraction of items the claim-gated scan leaves unstarted so the
    # reported rays are what was actually traced, not the nominal budget
    if fused:
        # the fused step reports its own exact traced-ray counter; nvalid
        # gives the completed-sample fraction directly
        pix_all = jnp.arange(W * H, dtype=jnp.uint32)
        _sum, nv, step_rays = bounce_ad.sample_pixel_sums_fused(
            scene, pix_all, 0, args.spp_step, width=W, height=H,
            max_bounces=B, scan_steps=args.scan_steps)
        done_frac = float(nv.sum()) / (W * H * args.spp_step)
        scan_rays = float(step_rays)
    elif args.pack > 1:
        # replicate the step's exact item list (pixels x spp_step samples)
        pix_all = jnp.tile(jnp.arange(W * H, dtype=jnp.uint32), args.spp_step)
        samp_all = jnp.repeat(
            jnp.arange(args.spp_step, dtype=jnp.int32), W * H
        )
        off_all = offs[samp_all % offs.shape[0]]
        pad = (-pix_all.shape[0]) % args.pack
        if pad:
            pix_all = jnp.concatenate(
                [pix_all, jnp.full((pad,), W * H - 1, jnp.uint32)]
            )
            samp_all = jnp.concatenate([samp_all, samp_all[-1:].repeat(pad)])
            off_all = jnp.concatenate(
                [off_all, jnp.broadcast_to(off_all[-1:], (pad, 2))]
            )
        _, done_mask, _ = integ.sample_radiance_packed(
            scene, pix_all, samp_all, off_all, width=W, height=H,
            max_bounces=B, pack=args.pack, scan_steps=args.scan_steps,
        )
        done_frac = float(done_mask.mean())
    else:
        done_frac = 1.0
    if not fused:
        scan_rays = float(scan_rays) * args.spp_step * done_frac
    # two warmup steps: the second compiles the steady-state layout (fed-back
    # params carry jit-decided shardings that differ from the host arrays)
    params, loss, _ = step(params, scene, target, jnp.int32(0), offs, lr)
    params, loss, _ = step(params, scene, target, jnp.int32(0), offs, lr)
    float(loss)  # value transfer, not block_until_ready (see fwd note)

    step_state = {"params": params, "loss": loss, "i": 0}

    def _step_call():
        step_state["i"] += 1
        step_state["params"], step_state["loss"], _ = step(
            step_state["params"], scene, target,
            jnp.int32(step_state["i"]), offs, lr)

    def _step_fence():
        float(step_state["loss"])

    # K interleaved slope windows per metric, reported as median + spread:
    # session-to-session swing on the fused kernels is +-30% (README/
    # REFERENCE_PARITY), and a single window cannot distinguish a real
    # regression from ordinary drift WITHIN the run either. Interleaving
    # (fwd, fwdbwd, fwd, ...) makes both metrics sample the same
    # conditions; the per-window values land in extra so the spread of
    # THIS measurement is part of the record.
    n_win = max(1, args.windows)
    fwd_secs, step_secs = [], []
    for _ in range(n_win):
        fwd_secs.append(_slope_seconds(_fwd_call, _fwd_fence, fwd_k))
        step_secs.append(
            _slope_seconds(_step_call, _step_fence, args.fwdbwd_steps))
    a2 = fwd_state["a"]
    loss = step_state["loss"]
    fwd_win = [a2["rays"] / s / 1e6 for s in fwd_secs]
    step_win = [scan_rays / s / 1e6 for s in step_secs]
    fwd_mrays = statistics.median(fwd_win)
    fwdbwd_mrays = statistics.median(step_win)

    result = {
        "metric": "cornell_500x500_mrays_per_s_fwdbwd",
        "value": round(fwdbwd_mrays, 3),
        "unit": "Mrays/s/chip",
        "vs_baseline": round(fwdbwd_mrays / BASELINE_MRAYS, 3),
        "extra": {
            "fwd_mrays_per_s": round(fwd_mrays, 3),
            # per-window values (median is the headline): the spread is
            # the run's own uncertainty estimate
            "fwd_window_mrays": [round(v, 1) for v in fwd_win],
            "fwdbwd_window_mrays": [round(v, 2) for v in step_win],
            "fwd_spread_frac": round(
                (max(fwd_win) - min(fwd_win)) / max(fwd_mrays, 1e-9), 3),
            "fwdbwd_spread_frac": round(
                (max(step_win) - min(step_win)) / max(fwdbwd_mrays, 1e-9), 3),
            # which renderer produced fwd_mrays_per_s (render_auto's pick)
            "fwd_renderer": a2.get("renderer", "auto"),
            # the sharded wrapper's number for reference (slower at
            # n_dev=1: per-pass shard_map dispatch — see comment above)
            "fwd_sharded_mrays_per_s": round(fstats["mrays_per_s"], 3),
            "rays_per_pass_while": rays_per_pass,
            "rays_per_pass_scan": scan_rays,
            "loss": float(loss),
            "devices": n_dev,
            "bounces": B,
            "scene": scene.name,
            "pack": args.pack,
            "spp_step": args.spp_step,
            "fused_ad": fused,
            "done_frac": round(done_frac, 5),
            # VPU utilization from the EXACT lowered Mosaic op counts
            # (tools/roofline_count.py --ad: 8678 weighted slots per
            # lane-bounce fwd+bwd pair at k_sub=4, (8,128) lanes/block;
            # op-count error <5%). Clock: the round-4/5 940 MHz figure was
            # FALSIFIED by the round-5 spp sweep (289 Mrays/s measured >
            # its 221.8 "dual-issue ceiling"); v5e's public 197 TFLOP/s
            # bf16 peak / (4 MXUs x 128x128 x 2) derives ~1.5 GHz, used
            # here. The model is a utilization GAUGE, not an upper bound —
            # the VPU is multi-ALU (issue width up to 4/cycle):
            #   single-issue model  1.5e9*1024/8678 = 177.0 Mrays/s
            "sol_single_issue_frac": round(fwdbwd_mrays / 177.0, 2),
            # sustained average VPU issue slots per lane per cycle
            "vpu_slots_per_cycle": round(
                fwdbwd_mrays * 1e6 * 8678 / (1.5e9 * 1024), 2),
            # forward fused kernel: 2040 slots/bounce after LICM (1075
            # invariant broadcasts hoisted) -> 752.9 Mrays/s single-issue
            "fwd_sol_single_issue_frac": round(fwd_mrays / 752.9, 2),
            # provenance stamp: a cached fallback (cached_from_previous_run)
            # carries the ORIGINAL live measurement's time/device/rev, so a
            # stale or wrong-config cache is distinguishable from a fresh run
            "measured_utc": datetime.datetime.now(
                datetime.timezone.utc).isoformat(timespec="seconds"),
            "device_kind": jax.devices()[0].device_kind,
            "git_rev": _git_rev(),
        },
    }
    try:
        with open(CACHE, "w") as f:
            json.dump(result, f)
    except OSError:
        pass
    print(json.dumps(result))


def _git_rev() -> str:
    try:
        return subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


if __name__ == "__main__":
    main()
