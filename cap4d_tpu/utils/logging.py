"""Observability utilities: image-grid dumps + jax.profiler trace helper.

Reference parity: controlnet/cldm/logger.py (ImageLogger: periodic (b, t)
image grids during MMDM training) and SURVEY §5's TPU observability plan
(jax.profiler traces as a first-class feature; the reference only had CUDA
event timing)."""

from __future__ import annotations

import contextlib
from pathlib import Path

import numpy as np


def save_image_grid(images: np.ndarray, path: str | Path, pad: int = 2) -> None:
    """(B, T, H, W, 3) in [-1, 1] → one PNG grid (rows=B, cols=T)
    (cldm/logger.py:30-47 semantics)."""
    import cv2

    b, t, h, w, c = images.shape
    grid = np.ones((b * (h + pad) - pad, t * (w + pad) - pad, c), np.float32)
    for i in range(b):
        for j in range(t):
            grid[i * (h + pad) : i * (h + pad) + h,
                 j * (w + pad) : j * (w + pad) + w] = images[i, j]
    grid = ((np.clip(grid, -1, 1) + 1.0) / 2.0 * 255).astype(np.uint8)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), grid[..., ::-1])


@contextlib.contextmanager
def profile_trace(log_dir: str | Path | None):
    """jax.profiler trace scope; no-op when log_dir is None.

    Usage: `with profile_trace(args.profile_dir): run_hot_section()` — the
    trace is viewable in TensorBoard/XProf."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
