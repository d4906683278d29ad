"""Render snapshot test harness.

Python analogue of the reference snapshot tests
(`integration-tests/src/render_tests/harness/`): synthetic test inputs,
single-PTS renders, PNG golden comparison with per-pixel tolerance; goldens
regenerate with SMELTER_UPDATE_SNAPSHOTS=1 (reference: update-snapshots
feature flag).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image as PILImage

from smelter_tpu.core.types import Frame, FrameSet, PixelFormat, Resolution
from smelter_tpu.ops import color_convert as cc

SNAPSHOT_DIR = Path(__file__).parent / "snapshots"
ALLOWED_ERROR = 1.0  # mean abs u8 error tolerance (matches reference harness/test_case.rs:35)


def make_test_input(index: int, resolution: Resolution, pts: float = 0.0) -> Frame:
    """Synthetic input: solid hue per index with a white corner marker,
    uploaded as planar YUV420 (the most common real ingest format)."""
    h, w = resolution.height, resolution.width
    rgb = np.zeros((h, w, 3), np.float32)
    hues = [
        (0.9, 0.2, 0.2),
        (0.2, 0.9, 0.2),
        (0.2, 0.2, 0.9),
        (0.9, 0.9, 0.2),
        (0.9, 0.2, 0.9),
        (0.2, 0.9, 0.9),
        (0.7, 0.5, 0.3),
        (0.3, 0.5, 0.7),
    ]
    rgb[:] = hues[index % len(hues)]
    # white marker square in top-left, black bar at bottom
    rgb[: h // 8, : w // 8] = 1.0
    rgb[-h // 16 :, :] = 0.0
    import jax.numpy as jnp

    rgba = np.concatenate([rgb, np.ones((h, w, 1), np.float32)], axis=-1)
    y, u, v = cc.rgba_to_planar_yuv420(jnp.asarray(rgba))
    return Frame(
        data=(np.asarray(y), np.asarray(u), np.asarray(v)),
        format=PixelFormat.PLANAR_YUV420,
        resolution=resolution,
        pts=pts,
    )


def frame_to_rgb_u8(frame: Frame) -> np.ndarray:
    import jax.numpy as jnp

    if frame.format == PixelFormat.RGBA:
        return np.asarray(frame.data)[..., :3]
    if frame.format == PixelFormat.PLANAR_YUV420:
        y, u, v = frame.data
        rgba = cc.planar_yuv_to_rgba(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v))
        return np.asarray(cc.f32_to_u8(rgba))[..., :3]
    raise ValueError(frame.format)


def assert_snapshot(name: str, frame: Frame, allowed_error: float = ALLOWED_ERROR):
    """Compare rendered output vs committed golden PNG."""
    rgb = frame_to_rgb_u8(frame)
    SNAPSHOT_DIR.mkdir(exist_ok=True)
    path = SNAPSHOT_DIR / f"{name}.png"
    update = os.environ.get("SMELTER_UPDATE_SNAPSHOTS") == "1"
    if update or not path.exists():
        PILImage.fromarray(rgb).save(path)
        if not update:
            # first run generates the golden; subsequent runs compare
            return
    golden = np.asarray(PILImage.open(path).convert("RGB"), np.uint8)
    assert golden.shape == rgb.shape, f"{name}: shape {rgb.shape} != {golden.shape}"
    err = np.abs(golden.astype(np.float32) - rgb.astype(np.float32))
    mean_err = err.mean()
    if mean_err > allowed_error:
        actual_path = SNAPSHOT_DIR / f"{name}.actual.png"
        PILImage.fromarray(rgb).save(actual_path)
        raise AssertionError(
            f"snapshot {name}: mean error {mean_err:.3f} > {allowed_error} "
            f"(actual dumped to {actual_path})"
        )
