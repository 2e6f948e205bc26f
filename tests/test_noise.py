"""Fused Pallas turbulence kernel (interpret) vs the XLA texture path."""
import jax.numpy as jnp
import numpy as np
import pytest

from miniraytracer_tpu.ops import noise
from miniraytracer_tpu.ops.vecmath import V3
from miniraytracer_tpu.models import textures as tex
from miniraytracer_tpu.models.scenes import perlin_spheres

if not noise.HAVE_PALLAS:  # pragma: no cover
    pytest.skip("pallas unavailable", allow_module_level=True)


def test_flash_turbulence_matches_xla_path():
    scene = perlin_spheres(1.0)
    rng = np.random.default_rng(3)
    pts = rng.uniform(-9, 9, (4096, 3)).astype(np.float32)
    p = V3(*[jnp.asarray(pts[:, k]) for k in range(3)])
    ref = tex.perlin_turbulence(scene, p)
    ptab = noise.noise_tables(
        scene.perlin_px, scene.perlin_py, scene.perlin_pz, scene.perlin_vec
    )
    got = noise.flash_turbulence(ptab, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_flash_turbulence_negative_coords_and_padding():
    """Negative lattice cells (the & 255 wrap) and non-block-multiple N."""
    scene = perlin_spheres(1.0)
    rng = np.random.default_rng(5)
    pts = rng.uniform(-300, 300, (777, 3)).astype(np.float32)
    p = V3(*[jnp.asarray(pts[:, k]) for k in range(3)])
    ref = tex.perlin_turbulence(scene, p)
    ptab = noise.noise_tables(
        scene.perlin_px, scene.perlin_py, scene.perlin_pz, scene.perlin_vec
    )
    got = noise.flash_turbulence(ptab, p, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
