"""Display-path operators vs the reference formulas (main.cpp:416-484,
vec3.h:275-333). The linear buffer is ground truth; these only shape the
displayed image."""

import math

import jax.numpy as jnp
import numpy as np

from miniraytracer_tpu.ops import vecmath as vm
from miniraytracer_tpu.utils import tonemap as tm


def test_luminance_bt709_weights():
    # vec3.h:275-279
    np.testing.assert_allclose(
        float(vm.luminance(jnp.array([1.0, 0.0, 0.0]))), 0.212655, rtol=1e-6
    )
    np.testing.assert_allclose(
        float(vm.luminance(jnp.array([1.0, 1.0, 1.0]))), 1.0, rtol=1e-5
    )


def test_drago_matches_reference_formula():
    """Drago adaptive log mapping, L_dmax=230, bias=log0.7/log0.5
    (main.cpp:416-444), checked against a scalar reimplementation."""
    rng = np.random.default_rng(0)
    frame = rng.uniform(0, 4.0, (8, 8, 3)).astype(np.float32)
    out = np.asarray(tm.drago(jnp.asarray(frame)))

    lum = frame @ np.array([0.212655, 0.715158, 0.072187], np.float32)
    l_wmax = lum.max()
    bias = math.log(0.7) / math.log(0.5)
    invlogmax = 1.0 / math.log10(l_wmax + 1.0)
    invmax = 1.0 / l_wmax
    expect = np.empty_like(frame)
    for i in range(8):
        for j in range(8):
            L = lum[i, j]
            lum_new = (230.0 * 0.01 * invlogmax) * (
                math.log(L + 1.0) / math.log(2.0 + (L * invmax) ** bias * 8.0)
            )
            expect[i, j] = np.clip(lum_new * frame[i, j] / (L + 1e-5), 0, 1)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_argb32_pack():
    # vec3.h:327-333: clamp to 1, scale 255.99, 0xAARRGGBB
    c = jnp.array([[1.0, 0.0, 0.5], [2.0, -1.0, 0.25]])
    packed = np.asarray(vm.argb32(c))
    assert packed[0] == (0xFF << 24 | 255 << 16 | 0 << 8 | int(0.5 * 255.99))
    assert packed[1] == (0xFF << 24 | 255 << 16 | 0 << 8 | int(0.25 * 255.99))


def test_reinhard_and_gamma_bounded():
    rng = np.random.default_rng(1)
    frame = jnp.asarray(rng.uniform(0, 100.0, (16, 16, 3)).astype(np.float32))
    for op in (tm.reinhard, tm.gamma):
        out = np.asarray(op(frame))
        assert out.min() >= 0.0 and out.max() <= 1.0
        assert np.isfinite(out).all()
