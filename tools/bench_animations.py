#!/usr/bin/env python
"""Device-time bench for ANIMATED geometry through the production renderer
(the planner-selected traced fast paths: slide / spin / zoom / roto-zoom).

For each animation type: build the scene, start a transition, render a
burst of frames at increasing pts under jax.profiler, and report the p50
per-frame device time of the compiled frame program plus the retrace count
(must be 0 after the transition's first frame — parameter animation never
recompiles).

Prints one JSON line per animation.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile

os.environ.setdefault("SMELTER_XLA_CACHE_DIR", "/tmp/smelter_xla_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def _device_module_durs(events):
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
    }
    tids = {
        (e["pid"], e["tid"]) for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("args", {}).get("name") == "XLA Modules"
        and e["pid"] in device_pids
    }
    if not tids:  # CPU fallback
        tids = {
            (e["pid"], e["tid"]) for e in events
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and e.get("args", {}).get("name") == "XLA Modules"
        }
    return sorted(
        e["dur"] / 1000.0 for e in events
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in tids
        and str(e.get("name", "")).startswith("jit_traced(")
    )


def bench_tiles_relayout() -> None:
    """Tiles grid re-layout: adding a child animates every tile at once."""
    import jax

    from harness import make_test_input
    from smelter_tpu.core.types import FrameSet, PixelFormat, Resolution, RGBAColor
    from smelter_tpu.render.renderer import Renderer
    from smelter_tpu.scene import components as comp
    from smelter_tpu.scene.components import Transition

    OUT = Resolution(1920, 1080)
    IN = Resolution(960, 540)
    n0, n1 = 8, 9

    def scene(n, transition=None):
        return comp.Tiles(
            id="grid", background_color=RGBAColor(12, 12, 12, 255),
            transition=transition,
            children=[comp.InputStream(input_id=f"in_{i}") for i in range(n)],
        )

    r = Renderer()
    try:
        for i in range(n1):
            r.register_input(f"in_{i}")

        def frames(n, pts=0.0):
            return {f"in_{i}": make_test_input(i, IN, pts) for i in range(n)}

        r.update_scene("out", scene(n0), OUT, PixelFormat.RGBA)
        r.render(FrameSet(pts=0.0, frames=frames(n0)))
        r.update_scene("out", scene(n1, Transition(duration=4.0)), OUT,
                       PixelFormat.RGBA)
        for pts in (0.2, 0.4):
            r.render(FrameSet(pts=pts, frames=frames(n1, pts)))
        tracedir = tempfile.mkdtemp(prefix="anim_bench_")
        try:
            with jax.profiler.trace(tracedir):
                for i in range(20):
                    pts = 0.5 + i * 0.15
                    r.render(FrameSet(pts=pts, frames=frames(n1, pts)))
            files = glob.glob(
                os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True
            )
            events = json.loads(gzip.open(files[0]).read())["traceEvents"]
            durs = _device_module_durs(events)
        finally:
            shutil.rmtree(tracedir, ignore_errors=True)
        print(json.dumps({
            "animation": f"tiles_relayout_{n0}to{n1}",
            "device_p50_ms": round(durs[len(durs) // 2], 3) if durs else None,
            "frames": len(durs),
        }), flush=True)
    finally:
        r.close()


def main() -> None:
    import jax

    from harness import make_test_input
    from smelter_tpu.core.types import FrameSet, PixelFormat, Resolution, RGBAColor
    from smelter_tpu.render.renderer import Renderer
    from smelter_tpu.scene import components as comp
    from smelter_tpu.scene.components import AbsolutePosition, Transition

    OUT = Resolution(1920, 1080)
    IN = Resolution(960, 540)

    def abs_pos(**kw):
        return AbsolutePosition(**kw)

    def child(pos):
        return comp.View(
            id="box", position=pos,
            background_color=RGBAColor(0, 0, 0, 255),
            children=[comp.InputStream(input_id="cam")],
        )

    ANIMATIONS = {
        "slide_position": (
            abs_pos(width=900.0, height=500.0, top=100.0, left=0.0),
            abs_pos(width=900.0, height=500.0, top=100.0, left=1000.0),
        ),
        "spin_rotation": (
            abs_pos(width=900.0, height=500.0, top=200.0, left=400.0,
                    rotation_degrees=0.0),
            abs_pos(width=900.0, height=500.0, top=200.0, left=400.0,
                    rotation_degrees=80.0),
        ),
        "zoom_size": (
            abs_pos(width=400.0, height=225.0, top=300.0, left=600.0),
            abs_pos(width=1600.0, height=900.0, top=90.0, left=160.0),
        ),
        "rotozoom_combo": (
            abs_pos(width=400.0, height=225.0, top=300.0, left=600.0,
                    rotation_degrees=0.0),
            abs_pos(width=1400.0, height=800.0, top=140.0, left=260.0,
                    rotation_degrees=60.0),
        ),
    }

    bench_tiles_relayout()
    for name, (pos0, pos1) in ANIMATIONS.items():
        r = Renderer()
        try:
            r.register_input("cam")

            def scene(pos, transition=None):
                c = child(pos)
                if transition is not None:
                    c = comp.View(
                        id="box", position=pos,
                        background_color=RGBAColor(0, 0, 0, 255),
                        transition=transition,
                        children=[comp.InputStream(input_id="cam")],
                    )
                return comp.View(background_color=RGBAColor(10, 10, 30, 255),
                                 children=[c])

            frame = make_test_input(0, IN)
            r.update_scene("out", scene(pos0), OUT, PixelFormat.RGBA)
            r.render(FrameSet(pts=0.0, frames={"cam": frame}))
            r.update_scene(
                "out", scene(pos1, Transition(duration=4.0)), OUT,
                PixelFormat.RGBA,
            )
            # first mid-transition frame compiles the traced program
            r.render(FrameSet(pts=0.2, frames={"cam": make_test_input(0, IN, 0.2)}))
            prog = r._programs["out"]
            compiles_before = len(prog._jit_cache)

            tracedir = tempfile.mkdtemp(prefix="anim_bench_")
            try:
                with jax.profiler.trace(tracedir):
                    for i in range(30):
                        pts = 0.3 + i * 0.1  # stays inside the 4 s transition
                        r.render(FrameSet(
                            pts=pts, frames={"cam": make_test_input(0, IN, pts)}
                        ))
                files = glob.glob(
                    os.path.join(tracedir, "**", "*.trace.json.gz"),
                    recursive=True,
                )
                events = json.loads(gzip.open(files[0]).read())["traceEvents"]
                durs = _device_module_durs(events)
            finally:
                shutil.rmtree(tracedir, ignore_errors=True)

            retraces = len(prog._jit_cache) - compiles_before
            print(json.dumps({
                "animation": name,
                "device_p50_ms": round(durs[len(durs) // 2], 3) if durs else None,
                "device_p95_ms": round(durs[max(0, int(len(durs) * 0.95) - 1)], 3)
                if durs else None,
                "frames": len(durs),
                "retraces_during_animation": retraces,
            }), flush=True)
        finally:
            r.close()


if __name__ == "__main__":
    main()
