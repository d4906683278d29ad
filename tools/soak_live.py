#!/usr/bin/env python
"""Live-render soak: reproduce the round-1 concurrent-trace corruption.

Round 1 saw a ~1-in-3 live-soak failure: trace-time shape mismatches in
the banded-shear rotation when background compiles of new scene structures
ran concurrently with the hot 60 Hz render loop. Round 2 serialized all
program tracing behind `render/program.py:_TRACE_LOCK` (+ 3x compile
retry); round 3's barrel-shifter rewrite deleted the banded-shear code
(and its diagnostic assert) entirely. This soak drives the original
trigger: continuous scene-structure churn (new static rotation angles ->
new rotation programs compiling in the background) while the foreground
loop renders at full speed. Analysis: docs/TRACE_RACE.md.

Usage: python tools/soak_live.py [--rounds 20] [--seconds 12]
Exit 0 = all rounds clean; nonzero = corruption or render error.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def run_round(idx: int, seconds: float) -> dict:
    from smelter_tpu.core.types import (
        Frame,
        FrameSet,
        PixelFormat,
        Resolution,
        RGBAColor,
    )
    from smelter_tpu.ops.color_convert import rgba_to_planar_yuv420
    from smelter_tpu.render.renderer import Renderer
    from smelter_tpu.scene import components as comp

    rng = np.random.RandomState(idx)

    def yuv_frame(seed):
        w, h = 640, 360
        rgba = rng.randint(0, 255, (h, w, 4), np.uint8)
        rgba[..., 3] = 255
        y, u, v = [
            np.asarray(p)
            for p in rgba_to_planar_yuv420(rgba.astype(np.float32) / 255.0)
        ]
        return Frame(
            data=(y, u, v), format=PixelFormat.PLANAR_YUV420,
            resolution=Resolution(w, h), pts=0.0,
        )

    def scene(angle: float, wpx: float):
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.Rescaler(
                    child=comp.InputStream(input_id="cam_0"),
                    position=comp.AbsolutePosition(
                        width=wpx, height=wpx * 9 / 16, top=80.0, left=120.0,
                        rotation_degrees=angle,
                    ),
                ),
                comp.Rescaler(child=comp.InputStream(input_id="cam_1")),
            ],
        )

    from smelter_tpu.render.renderer import RendererOptions

    r = Renderer(RendererOptions(async_compile=True))
    r.register_input("cam_0")
    r.register_input("cam_1")
    frames = {"cam_0": yuv_frame(1), "cam_1": yuv_frame(2)}

    # first structure compiles synchronously so the async path has a last
    # frame to freeze
    r.update_scene("out", scene(10.0, 500.0),
                   Resolution(1280, 720), PixelFormat.PLANAR_YUV420)
    out = r.render(FrameSet(pts=0.0, frames=frames))
    jax.block_until_ready(out.frames["out"].data)

    n_frames = 0
    n_updates = 0
    deadline = time.monotonic() + seconds
    pts = 0.0
    angle = 10.0
    wpx = 500.0
    while time.monotonic() < deadline:
        # structure churn: a NEW planner-stable rotation angle + tile size
        # -> fresh banded-shear program compiling in the background while
        # the loop below keeps rendering (freeze-frame fallback). Updates
        # are spaced so the 1-vCPU test box can retire each compile; the
        # race window is trace-vs-execute concurrency, not churn volume.
        angle = (angle + 7.0) % 80.0 + 3.0
        wpx = 420.0 + (n_updates % 5) * 40.0
        r.update_scene("out", scene(angle, wpx),
                       Resolution(1280, 720), PixelFormat.PLANAR_YUV420)
        n_updates += 1
        burst_end = time.monotonic() + 3.0
        while time.monotonic() < burst_end:
            pts += 1 / 60.0
            out = r.render(FrameSet(pts=pts, frames=frames))
            n_frames += 1
    # drain compiles before closing
    r.close()
    return {"round": idx, "frames": n_frames, "updates": n_updates}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--seconds", type=float, default=12.0)
    args = ap.parse_args()

    failures = 0
    for i in range(args.rounds):
        t0 = time.monotonic()
        try:
            info = run_round(i, args.seconds)
            print(
                f"round {i + 1}/{args.rounds}: CLEAN "
                f"({info['frames']} frames, {info['updates']} structure "
                f"updates, {time.monotonic() - t0:.1f}s)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 - report and count
            failures += 1
            print(f"round {i + 1}/{args.rounds}: FAILED: {e!r}", flush=True)
    print(f"soak result: {args.rounds - failures}/{args.rounds} clean")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
