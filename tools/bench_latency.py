#!/usr/bin/env python
"""End-to-end pipeline latency (glass-to-glass minus codecs).

Live-mode pipeline (real wall-clock queue ticks, no AOT): a RawDataInput
pushes frames carrying an identifying marker at their scheduled rate; a
RawDataOutputSink receives the composed frames; latency for each output
frame is receive-time minus the push-time of the newest input frame whose
marker made it into that output. This measures the full sync-engine +
render path: input buffering, queue tick scheduling, TPU/CPU compose
dispatch, and thread handoffs — the latency budget smelter quotes as
"low-latency composition" (reference queue.rs:69-118 PTS model).

Prints one JSON line with p50/p95/p99 latency.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# live-path latency is a host-scheduling property; default CPU so the
# number reflects the machine, not the dev tunnel RTT (on a real TPU-VM
# set SMELTER_BENCH_DEVICE=tpu)
if os.environ.get("SMELTER_BENCH_DEVICE", "cpu") == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--buffer-ms", type=float, default=100.0,
                    help="queue input buffer (reference default 100 ms)")
    args = ap.parse_args()

    from smelter_tpu.core.types import Frame, Framerate, PixelFormat, Resolution, RGBAColor
    from smelter_tpu.pipeline import Pipeline, PipelineOptions, RegisterInputOptions
    from smelter_tpu.pipeline.input import RawDataInput
    from smelter_tpu.pipeline.output import (
        EndCondition,
        OutputVideoOptions,
        RawDataOutputSink,
        VideoEncoderOptions,
    )
    from smelter_tpu.scene import components as comp
    from smelter_tpu.utils.channels import Closed

    W, H, FPS = args.width, args.height, args.fps

    pipe = Pipeline(PipelineOptions(output_framerate=Framerate(FPS)))
    src = RawDataInput(has_video=True, has_audio=False)
    pipe.register_input(
        "cam", src,
        RegisterInputOptions(required=False, offset=None,
                             buffer_duration=args.buffer_ms / 1000.0),
    )
    sink = RawDataOutputSink()
    pipe.register_output(
        "out", sink,
        video=OutputVideoOptions(
            resolution=Resolution(W, H),
            encoder=VideoEncoderOptions(codec="raw"),
            initial_root=comp.View(
                background_color=RGBAColor(16, 16, 16, 255),
                children=[comp.Rescaler(child=comp.InputStream(input_id="cam"))],
            ),
            end_condition=EndCondition(),
        ),
    )
    pipe.start()

    push_times = {}
    push_lock = threading.Lock()
    stop = threading.Event()

    base_y = np.full((H, W), 100, np.uint8)
    base_u = np.full((H // 2, W // 2), 128, np.uint8)
    base_v = np.full((H // 2, W // 2), 128, np.uint8)

    def marker_of(counter: int) -> int:
        return 20 + (counter % 200)

    def producer() -> None:
        counter = 0
        t0 = time.monotonic()
        while not stop.is_set():
            target = t0 + counter / FPS
            delay = target - time.monotonic()
            if delay > 0:
                time.sleep(delay)
            y = base_y.copy()
            y[:32, :32] = marker_of(counter)  # identifying block
            with push_lock:
                push_times[marker_of(counter)] = time.monotonic()
            try:
                src.video.send(Frame(
                    data=(y, base_u, base_v),
                    format=PixelFormat.PLANAR_YUV420,
                    resolution=Resolution(W, H), pts=counter / FPS,
                ))
            except Closed:
                return
            counter += 1

    prod = threading.Thread(target=producer, daemon=True)
    prod.start()

    latencies = []
    deadline = time.monotonic() + args.seconds + 2.0
    warmup_until = time.monotonic() + 2.0
    while time.monotonic() < deadline:
        try:
            frame = sink.video.recv(timeout=1.0)
        except (Closed, TimeoutError):
            continue
        now = time.monotonic()
        y = np.asarray(frame.data[0] if isinstance(frame.data, tuple)
                       else frame.data[..., 0])
        # the Rescaler maps the 32x32 marker into the output top-left; the
        # YUV->RGBA->YUV roundtrip can shift gray levels by ~1-2 codes
        med = int(round(float(np.median(y[:16, :16]))))
        with push_lock:
            t_push = None
            for cand in (med, med - 1, med + 1, med - 2, med + 2):
                t_push = push_times.get(cand)
                if t_push is not None:
                    break
        if t_push is None or now < warmup_until:
            continue
        latencies.append(now - t_push)
    stop.set()
    pipe.close()

    if not latencies:
        print(json.dumps({"metric": "pipeline_latency_ms", "error": "no samples"}))
        return
    lat_ms = sorted(x * 1000.0 for x in latencies)
    print(json.dumps({
        "metric": "pipeline_latency_ms",
        "value": round(statistics.median(lat_ms), 1),
        "unit": "ms (p50)",
        "p50_ms": round(statistics.median(lat_ms), 1),
        "p95_ms": round(lat_ms[int(len(lat_ms) * 0.95) - 1], 1),
        "p99_ms": round(lat_ms[int(len(lat_ms) * 0.99) - 1], 1),
        "samples": len(lat_ms),
        "fps": FPS,
        "resolution": f"{W}x{H}",
        "buffer_ms": args.buffer_ms,
    }))


if __name__ == "__main__":
    main()
