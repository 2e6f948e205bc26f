"""Generate tests/reference_renders.npz from the REAL reference renderer.

The reference cannot build on Linux as-shipped (SURVEY.md 9.5: MSVC-only
lzcnt, missing MRT_ReportProgress, anonymous-union MSVC-isms). We build a
patched copy in /tmp/refbuild with a headless platform stub and a
linear-framebuffer dump (see the round notes / this repo's README): that
binary is the ground-truth oracle for "forward renders must match the
reference CPU images" (BASELINE.json).

Run (only needed to regenerate the archive):
    python tests/make_reference_renders.py

Config: 100x100, 64 spp, depth 16, all nine scenes. RNG sequences differ
between the two renderers (ours is counter-based), so parity is
statistical: image means match to ~0.5%; per-pixel differences are MC
noise at the chosen spp.
"""

import os
import subprocess

import numpy as np

BIN = "/tmp/refbuild/mrt_headless"
RUN_DIR = "/tmp/refbuild/run"
W = H = 100
SPP = 64
DEPTH = 16
SCENES = range(9)


def render_reference(scene_id):
    os.makedirs(RUN_DIR, exist_ok=True)
    out = os.path.join(RUN_DIR, "linear_out.bin")
    if os.path.exists(out):
        os.remove(out)
    subprocess.run(
        [BIN, "-scene", str(scene_id), "-width", str(W), "-height", str(H),
         "-samples", str(SPP), "-depth", str(DEPTH), "-mode", "1",
         "-threads", "8"],
        cwd=RUN_DIR, check=True, capture_output=True, timeout=1800,
    )
    return np.fromfile(out, np.float32).reshape(H, W, 3)


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    from miniraytracer_tpu.models.scenes import SCENE_NAMES

    frames = {}
    for sid in SCENES:
        frames[SCENE_NAMES[sid]] = render_reference(sid)
        print(f"{SCENE_NAMES[sid]}: mean={frames[SCENE_NAMES[sid]].mean():.4f}")
    path = os.path.join(os.path.dirname(__file__), "reference_renders.npz")
    np.savez_compressed(path, **frames)
    print("wrote", path)
