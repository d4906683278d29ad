"""Input pause/resume/seek tests (reference `update_input.rs` +
`mp4/mp4_input.rs:39-70` queue multi-track swap)."""

import time

import numpy as np
import pytest

from smelter_tpu.core.types import Framerate, Resolution
from smelter_tpu.io.codec import Codec, Muxer, VideoEncoder
from smelter_tpu.pipeline import (
    EndCondition,
    Mp4Input,
    Mp4InputOptions,
    OutputVideoOptions,
    Pipeline,
    PipelineOptions,
    RawDataOutputSink,
    RegisterInputOptions,
    VideoEncoderOptions,
)
from smelter_tpu.scene import components as comp
from smelter_tpu.utils.channels import Closed

FPS = 30
DUR_S = 8.0
W, H = 160, 120


def _luma_at(t_s: float) -> int:
    """Source luma encodes time: frame i has Y = 20 + (i % 180)."""
    return 20 + (int(round(t_s * FPS)) % 180)


def _make_timed_mp4(path: str) -> None:
    enc = VideoEncoder(Codec.H264, W, H, FPS, opts="g=30,qp=0")
    u = np.full((H // 2, W // 2), 128, np.uint8)
    v = np.full((H // 2, W // 2), 128, np.uint8)
    pkts = []
    for i in range(int(DUR_S * FPS)):
        y = np.full((H, W), 20 + (i % 180), np.uint8)
        enc.send(y, u, v, i / FPS)
        while True:
            p = enc.receive()
            if p is None or p == "eof":
                break
            pkts.append(p)
    enc.send_eof()
    while True:
        p = enc.receive()
        if p is None or p == "eof":
            break
        pkts.append(p)
    mux = Muxer(path)
    vs = mux.add_video(Codec.H264, W, H, FPS, 1, enc.extradata())
    mux.write_header()
    for p in pkts:
        mux.write(vs, p.data, p.pts_s, p.dts_s, p.is_keyframe)
    mux.close()


def test_pause_resume_seek(tmp_path):
    src = str(tmp_path / "timed.mp4")
    _make_timed_mp4(src)

    # real-time pipeline: pause/seek are live-control features
    pipeline = Pipeline(PipelineOptions(output_framerate=Framerate(FPS)))
    pipeline.register_input(
        "clip",
        Mp4Input(Mp4InputOptions(path=src, loop=True)),
        RegisterInputOptions(required=True, offset=0.0),
    )
    sink = RawDataOutputSink(video_capacity=600)
    pipeline.register_output(
        "out",
        sink,
        video=OutputVideoOptions(
            resolution=Resolution(W, H),
            encoder=VideoEncoderOptions(codec="raw"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="clip")),
            end_condition=EndCondition(),
        ),
    )
    pipeline.start()

    def collect(duration_s: float):
        """Drain raw output frames for ~duration, returning mean luma list."""
        out = []
        deadline = time.time() + duration_s
        while time.time() < deadline:
            try:
                frame = sink.video.recv(timeout=0.5)
            except (Closed, TimeoutError):
                continue
            y = np.asarray(frame.data[0])
            out.append(float(y.mean()))
        return out

    # phase 1: play ~1s — luma should advance
    lumas = collect(1.2)
    assert len(lumas) >= 15, len(lumas)
    assert max(lumas) - min(lumas) > 10, "content should be advancing"

    # phase 2: pause — luma freezes
    pipeline.update_input("clip", pause=True)
    time.sleep(0.3)
    collect(0.3)  # flush frames rendered around the pause point
    paused = collect(0.8)
    assert len(paused) >= 10
    assert max(paused) - min(paused) <= 2.0, f"paused but moving: {paused[:5]}.."

    # pause emitted the wire event (event.rs VideoInputStreamPaused)
    kinds = [e.kind for e in pipeline.events.history()]
    assert "VIDEO_INPUT_PAUSED" in kinds

    # phase 3: resume — advances again
    pipeline.update_input("clip", pause=False)
    collect(0.4)
    resumed = collect(0.8)
    assert max(resumed) - min(resumed) > 5, "should advance after resume"

    # resume re-arms PLAYING: a second VIDEO_INPUT_PLAYING fires once
    # frames flow again (video_input.rs resume comment)
    kinds = [e.kind for e in pipeline.events.history()]
    assert kinds.count("VIDEO_INPUT_PLAYING") >= 2, kinds

    # phase 4: seek to 5.0s — luma jumps into the [5s, 6s) band
    # (Y = 20 + (frame % 180): at 5.0s → 170, rising to 199 by 6.0s)
    pipeline.update_input("clip", seek=5.0)
    collect(0.5)  # flush pre-seek frames
    after = collect(0.8)
    assert after, "no frames after seek"
    assert any(165 <= l <= 204 for l in after), after[:20]

    pipeline.close()


def test_update_input_http(tmp_path):
    """/api/input/:id/update wire: pause + seek + validation."""
    import httpx

    from smelter_tpu.config import Config, LoggerConfig
    from tests.test_server import ServerThread

    src = str(tmp_path / "timed.mp4")
    _make_timed_mp4(src)
    cfg = Config(output_framerate=Framerate(FPS), logger=LoggerConfig(level="warning"))
    s = ServerThread(cfg)
    try:
        with httpx.Client(base_url=s.base, timeout=30) as c:
            r = c.post(
                "/api/input/clip/register",
                json={"type": "mp4", "path": src, "loop": True},
            )
            assert r.status_code == 200, r.text
            assert c.post("/api/start", json={}).status_code == 200
            assert c.post("/api/input/clip/update", json={"pause": True}).status_code == 200
            assert c.post("/api/input/clip/update", json={"pause": False}).status_code == 200
            assert c.post("/api/input/clip/update", json={"seek_ms": 1000}).status_code == 200
            r = c.post("/api/input/nope/update", json={"pause": True})
            assert r.status_code == 404
            r = c.post("/api/input/clip/update", json={"bogus": 1})
            assert r.status_code == 400
    finally:
        s.state.pipeline.close()
        s.stop()


def test_mp4_register_time_seek(tmp_path):
    """Wire `seek_ms` on mp4 register (schema Mp4Input.seek_ms): playback
    starts at the seek point, not the file start."""
    import numpy as np

    from smelter_tpu.api import schema as api
    from smelter_tpu.api.convert import mp4_input
    from smelter_tpu.io.codec import Codec, Muxer, VideoEncoder
    from smelter_tpu.pipeline.input import InputCtx
    from smelter_tpu.utils.channels import Channel

    # 2s clip whose luma encodes the frame index (brightness ramp)
    path = str(tmp_path / "ramp.mp4")
    enc = VideoEncoder(Codec.H264, 128, 96, 30, opts="g=15")
    u = np.full((48, 64), 128, np.uint8)
    pkts = []
    for i in range(60):
        y = np.full((96, 128), 20 + i * 3, np.uint8)
        enc.send(y, u, u, i / 30.0)
        while True:
            p = enc.receive()
            if p in (None, "eof"):
                break
            pkts.append(p)
    enc.send_eof()
    while True:
        p = enc.receive()
        if p in (None, "eof"):
            break
        pkts.append(p)
    mux = Muxer(path)
    vs = mux.add_video(Codec.H264, 128, 96, 30, 1, enc.extradata())
    mux.write_header()
    for p in pkts:
        mux.write(vs, p.data, p.pts_s, p.dts_s, p.is_keyframe)
    mux.close()
    enc.close()

    spec = api.Mp4Input(type="mp4", path=path, seek_ms=1000.0)
    source, _opts = mp4_input(spec)
    vch = Channel(64)
    ctx = InputCtx(input_id="m", video_channel=vch, audio_channel=None)
    source.start(ctx)
    try:
        first = vch.recv(timeout=20)
        # seek lands on the nearest keyframe at/before 1s, then decodes
        # forward; the first delivered frame must be well into the ramp
        luma = float(np.asarray(first.data[0]).mean())
        assert luma > 20 + 15 * 3 - 2, luma  # at least the 1s-GOP keyframe (frame >= 15)
    finally:
        source.stop()
        source.join(timeout=10)
