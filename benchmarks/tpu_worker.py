"""Persistent TPU job worker for the flaky axon tunnel.

A fresh process pays ~2-4 min of tunnel cold-init before its first op, so
sequential one-shot experiment scripts are untenable. This worker warms the
tunnel ONCE and then executes python job files dropped into /tmp/tpu_jobs
in name order, inside the same live process (compiled functions and the
device connection stay warm). Each job gets a shared mutable dict `G` to
stash results/compiled fns for later jobs.

Usage:  nohup python benchmarks/tpu_worker.py > /tmp/tpu_worker.log 2>&1 &
        cat > /tmp/tpu_jobs/010_myjob.py <<EOF ... EOF
        tail -f /tmp/tpu_worker.log
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

print("devices:", jax.devices(), flush=True)
t0 = time.time()
print("warmup:", float(jnp.ones((8,)).sum()), f"({time.time()-t0:.1f}s)", flush=True)
print("READY", flush=True)

JOBS = "/tmp/tpu_jobs"
os.makedirs(JOBS, exist_ok=True)
G: dict = {}
seen = set()

while True:
    for f in sorted(os.listdir(JOBS)):
        if not f.endswith(".py") or f in seen:
            continue
        seen.add(f)
        path = os.path.join(JOBS, f)
        print(f"=== RUN {f}", flush=True)
        t0 = time.time()
        try:
            code = open(path).read()
            exec(compile(code, path, "exec"), {"__name__": "__job__", "G": G})
        except Exception:
            traceback.print_exc()
        print(f"=== DONE {f} ({time.time()-t0:.1f}s)", flush=True)
    time.sleep(2)
