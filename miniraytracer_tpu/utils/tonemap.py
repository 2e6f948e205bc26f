"""HDR tone mapping operators (display path, main.cpp:416-484).

The linear framebuffer is ground truth (comparisons happen pre-tonemap,
main.cpp:57-58); these map it for display:
- drago: Adaptive Logarithmic Mapping (the reference's live default,
  main.cpp:416-444, L_dmax=230, bias=log0.7/log0.5)
- reinhard: Photographic Tone Reproduction (compiled-out alt, 445-476)
- gamma: plain sqrt gamma (477-484)

All need a global max-luminance reduction — on a sharded framebuffer this
is a `psum`-style full reduce (see parallel.render).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from miniraytracer_tpu.ops import vecmath as vm


def drago(frame: jnp.ndarray, l_dmax: float = 230.0, bias_num: float = 0.7) -> jnp.ndarray:
    """frame (...,3) linear -> display RGB in [0,1]."""
    bias = math.log(bias_num) / math.log(0.5)
    lum = vm.luminance(frame)
    l_wmax = jnp.max(lum)
    invlogmax = 1.0 / jnp.log10(l_wmax + 1.0)
    invmax = 1.0 / jnp.maximum(l_wmax, 1e-12)
    loglw = jnp.log(lum + 1.0)
    lum_new = (l_dmax * 0.01 * invlogmax) * (
        loglw / jnp.log(2.0 + (lum * invmax) ** bias * 8.0)
    )
    out = (lum_new[..., None] * frame) / (lum[..., None] + 1e-5)
    return jnp.clip(out, 0.0, 1.0)


def reinhard(frame: jnp.ndarray, key: float = 0.10, sigma: float = 1e-5) -> jnp.ndarray:
    lum = vm.luminance(frame)
    logavg = jnp.exp(jnp.mean(jnp.log(sigma + lum)))
    l_wmax = jnp.max(lum)
    invmax = 1.0 / jnp.maximum(l_wmax, 1e-12)
    lum_new = key / logavg * lum
    lum_new = lum_new * (1.0 + lum_new * (invmax * invmax)) / (1.0 + lum_new)
    out = (lum_new[..., None] * frame) / (lum[..., None] + sigma)
    return jnp.clip(out, 0.0, 1.0)


def gamma(frame: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(vm.gamma_correct(frame), 0.0, 1.0)


OPERATORS = {"drago": drago, "reinhard": reinhard, "gamma": gamma}
