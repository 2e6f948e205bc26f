"""Statistical image parity vs the REAL reference renderer.

tests/reference_renders.npz holds 100x100 / 64spp / depth-16 frames from the
reference CPU binary (built headless from a patched copy — see
tests/make_reference_renders.py and REFERENCE_PARITY.md). Our RNG is
counter-based (different sample sequences), so parity is statistical:
channel MEANS must match within tolerance; per-pixel differences are MC
noise at the spp used.

These tolerances are tight because scene GEOMETRY is bit-matched: the host
PCG32 replicates the reference's fixed seeds AND its C++ right-to-left
argument-evaluation draw order (sphere placements, Perlin tables).
"""

import os

import numpy as np
import pytest

from miniraytracer_tpu.models import integrator as integ
from miniraytracer_tpu.models import scenes as S

REF = os.path.join(os.path.dirname(__file__), "reference_renders.npz")

# (scene id, spp, mean tolerance) — heavy scenes use fewer spp on CPU
CASES = [
    (0, 16, 0.02), (1, 16, 0.02), (2, 16, 0.01), (3, 16, 0.015),
    (4, 16, 0.015), (5, 16, 0.035), (6, 16, 0.015), (7, 4, 0.03),
    (8, 4, 0.05),
]


@pytest.fixture(scope="module")
def refs():
    if not os.path.exists(REF):
        pytest.skip("reference archive missing — run tests/make_reference_renders.py")
    with np.load(REF) as z:
        return {k: z[k] for k in z.files}


@pytest.mark.parametrize("sid,spp,tol", CASES, ids=[S.SCENE_NAMES[c[0]] for c in CASES])
def test_channel_means_match_reference(refs, sid, spp, tol):
    name = S.SCENE_NAMES[sid]
    ref = refs[name]
    scene = S.select_scene(sid, 1.0)
    ours, _ = integ.render_wavefront(scene, 100, 100, spp, max_bounces=16)
    ours = np.asarray(ours)
    assert np.isfinite(ours).all()
    ref_mean = ref.mean(axis=(0, 1))
    our_mean = ours.mean(axis=(0, 1))
    rel = np.abs(ref_mean - our_mean) / np.maximum(ref_mean, 1e-6)
    assert rel.max() < tol, f"{name}: ref {ref_mean} vs ours {our_mean}"


# Matched-spp gate (the README headline bound): ours at the archive's own
# 64 spp via the work-queue renderer. Deterministic given config (counter
# RNG), so tolerances sit ~1.5x above the measured CPU values
# (0.03%-0.46% for eight scenes, 0.78% for triangles — its dielectric
# meshes make it the highest-variance scene). Slow lane only.
CASES_64 = [
    (0, 0.005), (1, 0.007), (2, 0.001), (3, 0.003), (4, 0.002),
    (5, 0.005), (6, 0.003), (7, 0.007), (8, 0.012),
]


@pytest.mark.slow
@pytest.mark.parametrize("sid,tol", CASES_64,
                         ids=[S.SCENE_NAMES[c[0]] for c in CASES_64])
def test_channel_means_match_reference_64spp(refs, sid, tol):
    name = S.SCENE_NAMES[sid]
    ref = refs[name]
    scene = S.select_scene(sid, 1.0)
    ours, _ = integ.render_workqueue(scene, 100, 100, 64, max_bounces=16)
    ours = np.asarray(ours)
    assert np.isfinite(ours).all()
    ref_mean = ref.mean(axis=(0, 1))
    our_mean = ours.reshape(-1, 3).mean(axis=0)
    rel = np.abs(ref_mean - our_mean) / np.maximum(ref_mean, 1e-6)
    assert rel.max() < tol, f"{name}: ref {ref_mean} vs ours {our_mean}"
