"""Regenerate the golden render archive (tests/golden_renders.npz).

Run after an INTENTIONAL estimator/semantics change:
    python tests/make_goldens.py
The archive holds tiny fixed-seed CPU renders of all nine scenes; the
counter-based RNG makes them deterministic across schedules/shardings, so
any diff is a real behavior change (SURVEY.md section 4 test strategy:
deterministic-mode regression, cmdline_parser.h:15).
"""

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from miniraytracer_tpu.models import integrator as integ  # noqa: E402
from miniraytracer_tpu.models import scenes as S  # noqa: E402

SIZE = 24
SPP = 4
BOUNCES = 6


def render_all():
    out = {}
    for sid, name in enumerate(S.SCENE_NAMES):
        scene = S.select_scene(sid, 1.0)
        frame, _ = integ.render_wavefront(scene, SIZE, SIZE, SPP, max_bounces=BOUNCES)
        out[name] = np.asarray(frame)
        print(f"{name}: mean={out[name].mean():.4f}")
    return out


if __name__ == "__main__":
    import os

    frames = render_all()
    path = os.path.join(os.path.dirname(__file__), "golden_renders.npz")
    np.savez_compressed(path, **frames)
    print("wrote", path)
