"""Wire-level feature tests: scheduled scene updates with transitions,
shader components over HTTP, raw in-process input, overflow/align fidelity."""

import time

import httpx
import numpy as np
import pytest

from smelter_tpu.core.types import (
    AudioSamples,
    Frame,
    FrameSet,
    Framerate,
    PixelFormat,
    Resolution,
    RGBAColor,
)
from smelter_tpu.render.renderer import Renderer
from smelter_tpu.scene import components as comp

from tests.harness import frame_to_rgb_u8, make_test_input
from tests.test_pipeline import _make_source_mp4


def _decode_video(path):
    from smelter_tpu.io.codec import Demuxer, VideoDecoder

    d = Demuxer(path)
    vinfo = next(s for s in d.streams() if s.media_type == "video")
    dec = VideoDecoder(vinfo.codec, vinfo.extradata)
    frames = []
    while True:
        pkt = d.read()
        if pkt is None:
            break
        if pkt.stream_index != vinfo.index:
            continue
        dec.send(pkt.data, pkt.pts_s or 0.0)
        while True:
            f = dec.receive()
            if f in (None, "eof"):
                break
            frames.append(f)
    dec.send_eof()
    while True:
        f = dec.receive()
        if f in (None, "eof"):
            break
        frames.append(f)
    d.close()
    return frames


def test_scene_update_with_transition_over_http(tmp_path):
    """update_output with a transition + schedule_time_ms through the API:
    the box must end wide, passing through intermediate widths."""
    from smelter_tpu.config import Config, LoggerConfig
    from tests.test_server import ServerThread

    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "out.mp4")
    cfg = Config(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
        run_late_scheduled_events=True,
        logger=LoggerConfig(level="warning"),
    )
    s = ServerThread(cfg)

    def scene(width):
        return {
            "root": {
                "type": "view",
                "background_color": "#000000FF",
                "children": [
                    {
                        "type": "view",
                        "id": "box",
                        "width": width,
                        "height": 240.0,
                        "background_color": "#FFFFFFFF",
                        "transition": {"duration_ms": 1000.0},
                    }
                ],
            }
        }

    try:
        with httpx.Client(base_url=s.base, timeout=120) as c:
            assert c.post(
                "/api/input/a/register",
                json={"type": "mp4", "path": src, "required": True, "offset_ms": 0},
            ).status_code == 200
            assert c.post(
                "/api/output/out/register",
                json={
                    "type": "mp4",
                    "path": out_path,
                    "video": {
                        "resolution": {"width": 320, "height": 240},
                        "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                        "initial": scene(40.0),
                        "send_eos_when": {"all_inputs": True},
                    },
                },
            ).status_code == 200
            # schedule the transition start at t=0.5s
            assert c.post(
                "/api/output/out/update",
                json={"video": scene(280.0), "schedule_time_ms": 500.0},
            ).status_code == 200
            assert c.post("/api/start", json={}).status_code == 200
            deadline = time.time() + 120
            while time.time() < deadline:
                kinds = {(e.kind, e.entity_id)
                         for e in s.state.pipeline.events.history()}
                if ("OUTPUT_DONE", "out") in kinds:
                    break
                time.sleep(0.2)
            else:
                pytest.fail("no OUTPUT_DONE")
    finally:
        s.state.pipeline.close()
        s.stop()

    frames = _decode_video(out_path)
    assert len(frames) >= 55

    def white_width(f):
        y = f[0]
        return int((y[120, :] > 180).sum())

    w_start = white_width(frames[5])       # ~0.17s: before the update
    w_mid = white_width(frames[30])        # ~1.0s: mid transition
    w_end = white_width(frames[-5])        # ~1.8s: settled
    assert w_start <= 60, w_start
    assert 60 < w_mid < 280, w_mid
    assert w_end >= 260, w_end


def test_shader_via_http(tmp_path):
    """Register a JAX shader over HTTP and use it in a scene."""
    from smelter_tpu.config import Config, LoggerConfig
    from tests.test_server import ServerThread

    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "out.mp4")
    cfg = Config(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
        logger=LoggerConfig(level="warning"),
    )
    s = ServerThread(cfg)
    try:
        with httpx.Client(base_url=s.base, timeout=120) as c:
            source = (
                "def main(inputs, params, resolution, time):\n"
                "    tex = inputs[0]\n"
                "    rgb = tex[..., :3][..., ::-1]  # swap R<->B\n"
                "    return jnp.concatenate([rgb, tex[..., 3:4]], axis=-1)\n"
            )
            assert c.post(
                "/api/shader/swap/register", json={"source": source}
            ).status_code == 200
            # sandboxing: host-escape sources are rejected with 400 at
            # registration (validation.rs register-time semantics)
            evil = c.post(
                "/api/shader/evil/register",
                json={
                    "source": "def main(i, p, r, t):\n"
                    "    return __import__('os').system('true')\n"
                },
            )
            assert evil.status_code == 400, evil.text
            badshape = c.post(
                "/api/shader/badshape/register",
                json={
                    "source": "def main(inputs, params, resolution, time):\n"
                    "    return jnp.zeros((10, 10, 4), jnp.float32)\n"
                },
            )
            assert badshape.status_code == 400, badshape.text
            assert c.post(
                "/api/input/a/register",
                json={"type": "mp4", "path": src, "required": True, "offset_ms": 0},
            ).status_code == 200
            assert c.post(
                "/api/output/out/register",
                json={
                    "type": "mp4",
                    "path": out_path,
                    "video": {
                        "resolution": {"width": 320, "height": 240},
                        "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                        "initial": {
                            "root": {
                                "type": "shader",
                                "shader_id": "swap",
                                "resolution": {"width": 320, "height": 240},
                                "children": [
                                    {"type": "input_stream", "input_id": "a"}
                                ],
                            }
                        },
                        "send_eos_when": {"all_inputs": True},
                    },
                },
            ).status_code == 200
            assert c.post("/api/start", json={}).status_code == 200
            deadline = time.time() + 120
            while time.time() < deadline:
                kinds = {(e.kind, e.entity_id)
                         for e in s.state.pipeline.events.history()}
                if ("OUTPUT_DONE", "out") in kinds:
                    break
                time.sleep(0.2)
            else:
                pytest.fail("no OUTPUT_DONE")
    finally:
        s.state.pipeline.close()
        s.stop()

    frames = _decode_video(out_path)
    # red input swapped to blue → U plane high, V plane low
    mid = frames[len(frames) // 2]
    assert float(mid[1].mean()) > 170, float(mid[1].mean())  # U (blue)
    assert float(mid[2].mean()) < 140, float(mid[2].mean())  # V


def test_raw_data_input_end_to_end():
    """In-process push input (reference channel/raw_data_input.rs)."""
    from smelter_tpu.pipeline import (
        EndCondition,
        OutputVideoOptions,
        Pipeline,
        PipelineOptions,
        RawDataInput,
        RawDataOutputSink,
        RegisterInputOptions,
        VideoEncoderOptions,
    )
    from smelter_tpu.utils.channels import Closed

    p = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    raw = RawDataInput(has_video=True, has_audio=False)
    p.register_input("push", raw, RegisterInputOptions(required=True, offset=0.0))
    sink = RawDataOutputSink(video_capacity=120)
    p.register_output(
        "out", sink,
        video=OutputVideoOptions(
            resolution=Resolution(160, 90),
            encoder=VideoEncoderOptions(codec="raw"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="push")),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    p.start()

    # push 30 frames with increasing luma, then EOS (close)
    for i in range(30):
        y = np.full((90, 160), 20 + i * 7, np.uint8)
        u = np.full((45, 80), 128, np.uint8)
        v = np.full((45, 80), 128, np.uint8)
        raw.video.send(Frame(data=(y, u, v), format=PixelFormat.PLANAR_YUV420,
                             resolution=Resolution(160, 90), pts=i / 30))
    raw.video.close()

    got = []
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            got.append(sink.video.recv(timeout=0.5))
        except Closed:
            break
        except TimeoutError:
            if sink.done.is_set():
                break
    p.close()
    assert len(got) >= 28, len(got)
    lumas = [float(np.asarray(f.data[0]).mean()) for f in got]
    assert lumas[-1] - lumas[0] > 150


def test_overflow_modes_render_fidelity():
    """View overflow visible/hidden (reference scene/view_component)."""
    r = Renderer()
    child = comp.View(
        position=comp.StaticPosition(width=400.0, height=60.0),
        background_color=RGBAColor(255, 0, 0),
    )
    for overflow, expect_clip in [("hidden", True), ("visible", False)]:
        # root fills the output; the clipping view is a positioned child
        r.update_scene(
            "out",
            comp.View(
                background_color=RGBAColor(0, 0, 0),
                children=[
                    comp.View(
                        overflow=overflow,
                        position=comp.AbsolutePosition(
                            width=200.0, height=100.0, top=40.0, left=60.0
                        ),
                        children=[child],
                    )
                ],
            ),
            Resolution(320, 180),
            PixelFormat.RGBA,
        )
        out = r.render(FrameSet(pts=0.0)).frames["out"]
        rgb = frame_to_rgb_u8(out)
        inside = rgb[70, 150, 0]
        outside = rgb[70, 290, 0]  # x=290 > view right edge (60+200)
        assert inside > 200
        if expect_clip:
            assert outside < 60, f"overflow=hidden leaked: {outside}"
        else:
            assert outside > 200, f"overflow=visible clipped: {outside}"


def test_unregister_input_during_live_run(tmp_path):
    """Unregistering an input mid-run counts as EOS for end conditions and
    the pipeline keeps running (reference unregistering.rs)."""
    from smelter_tpu.config import Config, LoggerConfig
    from tests.test_server import ServerThread

    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "out.mp4")
    cfg = Config(output_framerate=Framerate(30), logger=LoggerConfig(level="warning"))
    s = ServerThread(cfg)
    try:
        with httpx.Client(base_url=s.base, timeout=60) as c:
            assert c.post(
                "/api/input/a/register",
                json={"type": "mp4", "path": src, "loop": True},
            ).status_code == 200
            assert c.post(
                "/api/output/out/register",
                json={
                    "type": "mp4",
                    "path": out_path,
                    "video": {
                        "resolution": {"width": 160, "height": 120},
                        "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                        "initial": {
                            "root": {
                                "type": "rescaler",
                                "child": {"type": "input_stream", "input_id": "a"},
                            }
                        },
                        "send_eos_when": {"any_input": True},
                    },
                },
            ).status_code == 200
            assert c.post("/api/start", json={}).status_code == 200
            time.sleep(1.5)
            # unregister while live: scene still references the input →
            # renderer falls back, end condition fires via unregister-as-EOS
            r = c.post("/api/input/a/unregister", json={})
            assert r.status_code == 200, r.text
            deadline = time.time() + 60
            while time.time() < deadline:
                kinds = {(e.kind, e.entity_id)
                         for e in s.state.pipeline.events.history()}
                if ("OUTPUT_DONE", "out") in kinds:
                    break
                time.sleep(0.2)
            else:
                pytest.fail("unregister did not finish the output")
    finally:
        s.state.pipeline.close()
        s.stop()
    frames = _decode_video(out_path)
    assert len(frames) >= 20


def test_aac_rtp_input_register_requires_config(tmp_path):
    """AAC over RTP needs audio_specific_config in the register request."""
    from smelter_tpu.config import Config, LoggerConfig
    from tests.test_server import ServerThread

    cfg = Config(output_framerate=Framerate(30), logger=LoggerConfig(level="warning"))
    s = ServerThread(cfg)
    try:
        with httpx.Client(base_url=s.base, timeout=30) as c:
            r = c.post(
                "/api/input/x/register",
                json={"type": "rtp_stream", "port": 0,
                      "audio": {"decoder": "aac"}},
            )
            assert r.status_code == 400
            assert "audio_specific_config" in r.json()["message"]
            # with a config it registers and returns the port
            from smelter_tpu.io.codec import AudioEncoder, Codec

            asc = AudioEncoder(Codec.AAC, 48000, 2).extradata().hex()
            r = c.post(
                "/api/input/x/register",
                json={"type": "rtp_stream", "port": 0,
                      "audio": {"decoder": "aac",
                                "audio_specific_config": asc}},
            )
            assert r.status_code == 200, r.text
            assert r.json()["port"] > 0
    finally:
        s.state.pipeline.close()
        s.stop()


def test_whip_output_encoder_preferences_shape():
    """Reference OutputWhipVideoOptions uses `encoder_preferences` (list,
    first supported wins; vulkan_h264 resolves to software h264, `any` to
    defaults) instead of `encoder` — both shapes must convert."""
    import pydantic

    from smelter_tpu.api import convert
    from smelter_tpu.api import schema as api

    adapter = pydantic.TypeAdapter(api.RegisterOutput)
    spec = adapter.validate_python({
        "type": "whip_client",
        "endpoint_url": "https://example.com/whip",
        "video": {
            "resolution": {"width": 640, "height": 360},
            "encoder_preferences": [
                {"type": "vulkan_h264", "keyframe_interval_ms": 1000},
                {"type": "ffmpeg_vp9"},
                {"type": "any"},
            ],
            "initial": {"root": {"type": "view"}},
        },
        "audio": {
            "encoder_preferences": [
                {"type": "opus", "forward_error_correction": True},
                {"type": "any"},
            ],
            "initial": {"inputs": []},
        },
    })
    video = convert.whip_output_video_options(spec.video, "webrtc")
    # vulkan_h264 resolves to the software h264 encoder with its params
    assert video.encoder.codec == "h264"
    assert video.encoder.keyframe_interval_s == 1.0
    audio = convert.whip_output_audio_options(spec.audio)
    assert audio.encoder.codec == "opus"
    assert "fec=1" in audio.encoder.ffmpeg_options

    # neither encoder nor preferences -> clear error
    bad = adapter.validate_python({
        "type": "whip_client",
        "endpoint_url": "https://example.com/whip",
        "video": {
            "resolution": {"width": 640, "height": 360},
            "initial": {"root": {"type": "view"}},
        },
    })
    import pytest as _pytest
    with _pytest.raises(convert.ConversionError):
        convert.whip_output_video_options(bad.video, "webrtc")
