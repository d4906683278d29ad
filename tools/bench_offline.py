#!/usr/bin/env python
"""Offline (ahead-of-time) MP4→MP4 throughput: how much faster than
real time the full pipeline runs when nothing is clocked.

N synthetic source MP4s (moving-gradient video + sine audio) → Tiles
compose + audio mix → one H264/AAC MP4, with `ahead_of_time_processing`
(the queue ticks as fast as the slowest stage; reference
SMELTER_OFFLINE_PROCESSING_ENABLE semantics, queue.rs:96-118). Reports
media-seconds processed per wall-second ("x realtime"). Host codecs
dominate on small hosts — the same number scales with cores; the TPU
compose is ~2 ms/frame of the budget.

Usage: python tools/bench_offline.py [--inputs 4] [--seconds 10]
                                     [--in 854x480] [--out 1280x720]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("SMELTER_BENCH_DEVICE", "cpu") == "cpu":
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np


def make_source(path: str, w: int, h: int, fps: int, dur_s: float,
                seed: int) -> None:
    from smelter_tpu.io.codec import AudioEncoder, Codec, Muxer, VideoEncoder

    venc = VideoEncoder(Codec.H264, w, h, fps)
    aenc = AudioEncoder(Codec.AAC, 48000, 2)
    yy, xx = np.mgrid[0:h, 0:w]
    u = np.full((h // 2, w // 2), 96 + 24 * (seed % 3), np.uint8)
    v = np.full((h // 2, w // 2), 96 + 40 * (seed % 2), np.uint8)
    vpkts = []
    for i in range(int(dur_s * fps)):
        y = ((xx + yy + seed * 37 + i * 4) % 220 + 16).astype(np.uint8)
        venc.send(y, u, v, i / fps)
        while True:
            p = venc.receive()
            if p in (None, "eof"):
                break
            vpkts.append(p)
    venc.send_eof()
    while True:
        p = venc.receive()
        if p in (None, "eof"):
            break
        vpkts.append(p)
    t = np.arange(int(dur_s * 48000)) / 48000.0
    sine = (0.3 * np.sin(2 * np.pi * (220.0 * (seed + 1)) * t)).astype(np.float32)
    pcm = np.stack([sine, sine], axis=1)
    apkts = []
    aenc.send(pcm, 0.0)
    aenc.send_eof()
    while True:
        p = aenc.receive()
        if p in (None, "eof"):
            break
        apkts.append(p)
    mux = Muxer(path)
    vs = mux.add_video(Codec.H264, w, h, fps, 1, venc.extradata())
    as_ = mux.add_audio(Codec.AAC, 48000, 2, aenc.extradata())
    mux.write_header()
    for p in vpkts:
        mux.write(vs, p.data, p.pts_s, p.dts_s, p.is_keyframe)
    for p in apkts:
        mux.write(as_, p.data, p.pts_s, p.dts_s, p.is_keyframe)
    mux.close()
    venc.close()
    aenc.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--fps", type=int, default=30)
    ap.add_argument("--in", dest="in_res", default="854x480")
    ap.add_argument("--out", dest="out_res", default="1280x720")
    args = ap.parse_args()

    from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
    from smelter_tpu.core.types import Framerate, Resolution, RGBAColor
    from smelter_tpu.pipeline import (
        AudioEncoderOptions,
        EndCondition,
        Mp4Input,
        Mp4InputOptions,
        Mp4OutputSink,
        OutputAudioOptions,
        OutputVideoOptions,
        Pipeline,
        PipelineOptions,
        RegisterInputOptions,
        VideoEncoderOptions,
    )
    from smelter_tpu.scene import components as comp

    iw, ih = (int(x) for x in args.in_res.split("x"))
    ow, oh = (int(x) for x in args.out_res.split("x"))

    tmp = tempfile.mkdtemp(prefix="smelter_offline_bench_")
    srcs = []
    t0 = time.perf_counter()
    for i in range(args.inputs):
        p = os.path.join(tmp, f"src_{i}.mp4")
        make_source(p, iw, ih, args.fps, args.seconds, i)
        srcs.append(p)
    gen_s = time.perf_counter() - t0

    pipeline = Pipeline(PipelineOptions(
        output_framerate=Framerate(args.fps),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    ids = [f"in_{i}" for i in range(args.inputs)]
    in_opts = RegisterInputOptions(required=True, offset=0.0)
    for iid, path in zip(ids, srcs):
        pipeline.register_input(iid, Mp4Input(Mp4InputOptions(path=path)), in_opts)
    scene = comp.Tiles(
        background_color=RGBAColor(16, 16, 16),
        children=[comp.InputStream(input_id=iid) for iid in ids],
    )
    out_path = os.path.join(tmp, "out.mp4")
    pipeline.register_output(
        "out",
        Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(ow, oh),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=scene,
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(
                inputs=[AudioMixerInputConfig(iid, volume=1.0) for iid in ids]
            ),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    from smelter_tpu.utils import tracing

    tracing.reset()  # per-stage spans: decode / queue / render / fetch / encode
    t0 = time.perf_counter()
    pipeline.start()
    pipeline.wait_for_outputs_done(timeout=3600)
    wall_s = time.perf_counter() - t0
    spans = tracing.report()
    pipeline.close()
    out_size = os.path.getsize(out_path) if os.path.exists(out_path) else 0
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    if not out_size:
        print(json.dumps({"metric": "offline_x_realtime", "error": "no output"}))
        return
    print(json.dumps({
        "metric": "offline_x_realtime",
        "value": round(args.seconds / wall_s, 2),
        "unit": "x realtime",
        "media_s": args.seconds,
        "wall_s": round(wall_s, 2),
        "inputs": args.inputs,
        "in_res": args.in_res,
        "out_res": args.out_res,
        "fps": args.fps,
        "out_bytes": out_size,
        "source_gen_s": round(gen_s, 2),
        # per-stage attribution (wall-clock inside each span; stages overlap
        # across threads, so totals can exceed wall_s on multicore hosts)
        "spans": {
            k: spans[k]
            for k in sorted(spans)
            if k.startswith(("codec.", "queue.", "render.", "audio."))
        },
    }))


if __name__ == "__main__":
    main()
