"""Render checkpoint/resume.

The reference has no checkpointing; its closest analogue is draw2's
progressive framebuffer, which always holds a valid partial render averaged
over completed passes (main.cpp:221-223, SURVEY.md section 5). We make that
state durable: a checkpoint is (running-average frame, samples completed,
render config). Because the RNG is counter-based and keyed on
(pixel, sample) — ops/rng.py — resuming at pass k reproduces exactly the
frames a straight-through render would have produced, independent of
sharding or schedule.
"""

from __future__ import annotations

import json

import numpy as np

FORMAT_VERSION = 1


def checkpoint_path(path: str) -> str:
    """Canonical on-disk path: np.savez appends '.npz' when missing, so both
    save and load normalize to it (a bare '-checkpoint X' then '-resume X'
    must round-trip)."""
    return path if path.endswith(".npz") else path + ".npz"


def save_checkpoint(path: str, frame, sample_idx: int, config: dict) -> str:
    """frame: (H*W, 3) or (H, W, 3) running average after `sample_idx` passes.
    Returns the actual file path written (with '.npz' appended if needed)."""
    path = checkpoint_path(path)
    np.savez_compressed(
        path,
        version=FORMAT_VERSION,
        frame=np.asarray(frame, np.float32),
        sample_idx=np.int64(sample_idx),
        config=json.dumps(config),
    )
    return path


def load_checkpoint(path: str):
    """Returns (frame, sample_idx, config dict)."""
    path = checkpoint_path(path)
    with np.load(path, allow_pickle=False) as z:
        if int(z["version"]) != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint version {int(z['version'])}")
        return z["frame"], int(z["sample_idx"]), json.loads(str(z["config"]))
