#!/usr/bin/env python
"""General-scene compose benchmark: device time per frame for canonical
non-grid scenes (the paths BENCHMARKS.md's "general scene" table tracks).

For each scene: build a Renderer, compile the frame program, render ITERS
frames under a jax.profiler trace, and report per-invocation device time
read off the "XLA Modules" track (wall-independent — the dev tunnel's RTT
never enters). With --ops, also aggregate the "XLA Ops" track to show the
top device ops per scene (where the milliseconds actually go).

Usage:  python tools/bench_scenes.py [--scene NAME] [--ops] [--iters N]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import statistics
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SMELTER_XLA_CACHE_DIR", "/tmp/smelter_xla_cache")
from smelter_tpu.config import apply_compile_cache

apply_compile_cache()

import numpy as np


def _trace_events(tracedir):
    files = glob.glob(os.path.join(tracedir, "**", "*.trace.json.gz"), recursive=True)
    if not files:
        return []
    return json.loads(gzip.open(files[0]).read())["traceEvents"]


def _device_track_tids(events, track_name):
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e.get("args", {}).get("name", "")
    }
    tids = {
        (e["pid"], e["tid"])
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "thread_name"
        and e.get("args", {}).get("name") == track_name
        and e["pid"] in device_pids
    }
    if not tids:  # CPU fallback
        tids = {
            (e["pid"], e["tid"])
            for e in events
            if e.get("ph") == "M"
            and e.get("name") == "thread_name"
            and e.get("args", {}).get("name") == track_name
        }
    return tids


def bench_scene(name, make_scene, n_inputs, out_res, in_res, iters, want_ops):
    import jax

    from smelter_tpu.core.types import Frame, FrameSet, PixelFormat, Resolution
    from smelter_tpu.ops.color_convert import rgba_to_planar_yuv420
    from smelter_tpu.render.renderer import Renderer

    rng = np.random.RandomState(7)

    def yuv_frame(seed, pts):
        w, h = in_res
        rgba = rng.randint(0, 255, (h, w, 4), np.uint8)
        rgba[..., 3] = 255
        y, u, v = [
            np.asarray(p)
            for p in rgba_to_planar_yuv420(rgba.astype(np.float32) / 255.0)
        ]
        return Frame(
            data=(y, u, v), format=PixelFormat.PLANAR_YUV420,
            resolution=Resolution(w, h), pts=pts,
        )

    r = Renderer()
    for i in range(n_inputs):
        r.register_input(f"cam_{i}")
    r.update_scene(
        "out", make_scene(), Resolution(*out_res), PixelFormat.PLANAR_YUV420
    )
    frames0 = {f"cam_{i}": yuv_frame(i, 0.0) for i in range(n_inputs)}
    frames1 = {f"cam_{i}": yuv_frame(i + 16, 0.0) for i in range(n_inputs)}

    # compile (synchronous first frame) + settle
    for k in range(3):
        out = r.render(FrameSet(pts=k / 60.0, frames=frames0))
    jax.block_until_ready(out.frames["out"].data)

    tracedir = tempfile.mkdtemp(prefix=f"smelter_scene_{name}_")
    try:
        with jax.profiler.trace(tracedir):
            for k in range(iters):
                out = r.render(
                    FrameSet(pts=(k + 3) / 60.0,
                             frames=(frames0, frames1)[k % 2])
                )
            jax.block_until_ready(out.frames["out"].data)
        events = _trace_events(tracedir)
        module_tids = _device_track_tids(events, "XLA Modules")
        durs = sorted(
            e["dur"] / 1000.0
            for e in events
            if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in module_tids
            and str(e.get("name", "")).startswith("jit_")
        )
        ops = None
        if want_ops:
            op_tids = _device_track_tids(events, "XLA Ops")
            agg = defaultdict(float)
            for e in events:
                if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
                    agg[str(e.get("name", ""))[:70]] += e["dur"] / 1000.0
            ops = sorted(agg.items(), key=lambda kv: -kv[1])[:12]
            ops = [(n, round(t / max(len(durs), 1), 3)) for n, t in ops]
    finally:
        import shutil

        shutil.rmtree(tracedir, ignore_errors=True)
    r.close()
    if not durs:
        return {"scene": name, "error": "no module events in trace"}
    res = {
        "scene": name,
        "device_p50_ms": round(statistics.median(durs), 3),
        "device_p95_ms": round(durs[max(0, int(len(durs) * 0.95) - 1)], 3),
        "frames": len(durs),
    }
    if ops:
        res["top_ops_ms_per_frame"] = ops
    return res


def scene_defs():
    from smelter_tpu.core.types import RGBAColor
    from smelter_tpu.scene import components as comp
    from smelter_tpu.scene.layout_types import BorderRadius, BoxShadow

    def two_tiles():
        return comp.View(
            background_color=RGBAColor(10, 10, 10),
            children=[
                comp.Rescaler(child=comp.InputStream(input_id="cam_0")),
                comp.Rescaler(child=comp.InputStream(input_id="cam_1")),
            ],
        )

    def rounded():
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.Rescaler(
                    child=comp.InputStream(input_id=f"cam_{i}"),
                    border_radius=BorderRadius(24, 24, 24, 24),
                )
                for i in range(4)
            ],
        )

    def shadow():
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.Rescaler(
                    child=comp.InputStream(input_id=f"cam_{i}"),
                    border_radius=BorderRadius(24, 24, 24, 24),
                    box_shadow=[
                        BoxShadow(offset_x=8, offset_y=8, blur_radius=16,
                                  color=RGBAColor(0, 0, 0, 200))
                    ],
                )
                for i in range(4)
            ],
        )

    def rotation30():
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.Rescaler(
                    child=comp.InputStream(input_id="cam_0"),
                    position=comp.AbsolutePosition(
                        width=700.0, height=400.0, top=300.0, left=500.0,
                        rotation_degrees=30.0,
                    ),
                ),
            ],
        )

    def rotation30_masked():
        # rotated view WITH an opaque background: the child is clipped by a
        # parent mask — pins the masked-rotation fast path (was a 128 ms
        # full-canvas-sample cliff before the region-local mask support)
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.View(
                    position=comp.AbsolutePosition(
                        width=700.0, height=400.0, top=300.0, left=500.0,
                        rotation_degrees=30.0,
                    ),
                    background_color=RGBAColor(0, 0, 0, 255),
                    children=[comp.InputStream(input_id="cam_0")],
                ),
            ],
        )

    def mixed4():
        return comp.View(
            background_color=RGBAColor(20, 20, 40),
            children=[
                comp.Rescaler(
                    child=comp.InputStream(input_id="cam_0"),
                    position=comp.AbsolutePosition(
                        width=900.0, height=510.0, top=60.0, left=60.0
                    ),
                ),
                comp.Rescaler(
                    child=comp.InputStream(input_id="cam_1"),
                    position=comp.AbsolutePosition(
                        width=600.0, height=339.0, top=120.0, left=1080.0
                    ),
                    border_radius=BorderRadius(18, 18, 18, 18),
                    box_shadow=[
                        BoxShadow(offset_x=6, offset_y=6, blur_radius=12,
                                  color=RGBAColor(0, 0, 0, 200))
                    ],
                ),
                comp.Rescaler(
                    child=comp.InputStream(input_id="cam_2"),
                    position=comp.AbsolutePosition(
                        width=720.0, height=405.0, top=600.0, left=180.0
                    ),
                    border_width=4.0, border_color=RGBAColor(255, 255, 255),
                ),
                comp.Rescaler(
                    child=comp.InputStream(input_id="cam_3"),
                    position=comp.AbsolutePosition(
                        width=640.0, height=360.0, top=640.0, left=1040.0,
                        rotation_degrees=12.0,
                    ),
                ),
            ],
        )

    return {
        "two_tiles": (two_tiles, 2),
        "rounded": (rounded, 4),
        "shadow": (shadow, 4),
        "rotation30": (rotation30, 1),
        "rotation30_masked": (rotation30_masked, 1),
        "mixed4": (mixed4, 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None, help="one scene (default: all)")
    ap.add_argument("--ops", action="store_true", help="top XLA ops per scene")
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--out", default="1920x1080")
    ap.add_argument("--inres", default="960x540")
    args = ap.parse_args()

    out_res = tuple(int(x) for x in args.out.split("x"))
    in_res = tuple(int(x) for x in args.inres.split("x"))

    defs = scene_defs()
    names = [args.scene] if args.scene else list(defs)
    for name in names:
        make, n_inputs = defs[name]
        res = bench_scene(
            name, make, n_inputs, out_res, in_res, args.iters, args.ops
        )
        print(json.dumps(res))


if __name__ == "__main__":
    main()
