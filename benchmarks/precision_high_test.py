import sys; sys.path.insert(0, "/root/repo")
"""Task 4: validate Precision.HIGH (bf16_3x) vs HIGHEST on the real chip.
Winner-agreement + t-error of flash_tri_hit at coordinate scale ~500,
plus slope timing of both."""
import time
import jax, jax.numpy as jnp, numpy as np

assert jax.devices()[0].platform != "cpu", jax.devices()

from miniraytracer_tpu.models import scenes as S
from miniraytracer_tpu.ops import flash
from miniraytracer_tpu.ops.vecmath import V3
from miniraytracer_tpu.ops import intersect as ix

scene = S.triangles(1.0)  # bunny+teapot, coords ~0-500
print("tris:", scene.n_tris)

m = V3(scene.tri_m[:, 0], scene.tri_m[:, 1], scene.tri_m[:, 2])
u = V3(scene.tri_u[:, 0], scene.tri_u[:, 1], scene.tri_u[:, 2])
v = V3(scene.tri_v[:, 0], scene.tri_v[:, 1], scene.tri_v[:, 2])
coeffs = flash.tri_coefficients(m, u, v, scene.tri_active)

# random rays spanning the scene (origin near camera region, random dirs)
rng = np.random.default_rng(0)
N = 65536
ro_np = rng.uniform([-200, -100, -200], [600, 500, 600], (N, 3)).astype(np.float32)
d = rng.normal(size=(N, 3)).astype(np.float32)
d /= np.linalg.norm(d, axis=1, keepdims=True)
ro = V3(*[jnp.asarray(ro_np[:, k]) for k in range(3)])
rd = V3(*[jnp.asarray(d[:, k]) for k in range(3)])
inside = jnp.zeros((N,), jnp.int32)

import functools
results = {}
for prec_name in ["HIGHEST", "HIGH"]:
    flash._PRECISION = getattr(jax.lax.Precision, prec_name)  # knob added below
    t, i = jax.jit(lambda: flash.flash_tri_hit(coeffs, ro, rd, inside, 0.001))()
    jax.block_until_ready(t)
    results[prec_name] = (np.asarray(t), np.asarray(i))

t_hi, i_hi = results["HIGHEST"]
t_h, i_h = results["HIGH"]
hit_hi = t_hi < 1e37
hit_h = t_h < 1e37
agree_hit = (hit_hi == hit_h).mean()
both = hit_hi & hit_h
agree_win = (i_hi[both] == i_h[both]).mean()
rel_t = np.abs(t_hi[both] - t_h[both]) / np.maximum(t_hi[both], 1e-6)
print(f"hit agreement {agree_hit*100:.4f}%  winner agreement {agree_win*100:.4f}%")
print(f"t rel err max {rel_t.max():.3e} p99 {np.percentile(rel_t, 99):.3e}")

# slope timing: chain K calls
def chain(prec, reps):
    flash._PRECISION = getattr(jax.lax.Precision, prec)
    @jax.jit
    def f(ro_x):
        def body(c, _):
            rox = V3(c, ro.y, ro.z)
            t, i = flash.flash_tri_hit(coeffs, rox, rd, inside, 0.001)
            return c + 1e-7 * t, None
        c, _ = jax.lax.scan(body, ro_x, None, length=reps)
        return c
    return f

for prec in ["HIGHEST", "HIGH"]:
    f1, f2 = chain(prec, 4), chain(prec, 12)
    r1 = f1(ro.x); jax.block_until_ready(r1)
    r2 = f2(ro.x); jax.block_until_ready(r2)
    t0 = time.perf_counter(); jax.block_until_ready(f1(ro.x)); t1 = time.perf_counter()
    jax.block_until_ready(f2(ro.x)); t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / 8
    print(f"{prec}: {per*1e3:.2f} ms/call -> {N/per/1e6:.1f} Mrays/s sweep")
