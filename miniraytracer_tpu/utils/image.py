"""Image output. The reference never writes files (window only); we add PNG
output as the headless equivalent of MRT_DrawToWindow. Row 0 of the
framebuffer is the *bottom* scanline (reference layout, main.cpp:156-157),
so files are written flipped."""

from __future__ import annotations

import numpy as np


def save_png(path: str, frame, flip: bool = True):
    """frame (H,W,3) float in [0,1] -> 8-bit PNG."""
    from PIL import Image

    arr = np.asarray(frame)
    if flip:
        arr = arr[::-1]
    arr8 = (np.clip(arr, 0.0, 1.0) * 255.99).astype(np.uint8)
    Image.fromarray(arr8).save(path)


def save_ppm(path: str, frame, flip: bool = True):
    """Dependency-free PPM writer (for environments without PIL)."""
    arr = np.asarray(frame)
    if flip:
        arr = arr[::-1]
    arr8 = (np.clip(arr, 0.0, 1.0) * 255.99).astype(np.uint8)
    h, w = arr8.shape[:2]
    with open(path, "wb") as f:
        f.write(f"P6\n{w} {h}\n255\n".encode())
        f.write(arr8.tobytes())
