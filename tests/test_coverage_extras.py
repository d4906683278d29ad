"""Coverage extras: program-cache bound, offline config, audio-only output,
NV12 input, multi-output pipelines."""

import time

import numpy as np
import pytest

from smelter_tpu.core.types import (
    Frame,
    FrameSet,
    Framerate,
    PixelFormat,
    Resolution,
    RGBAColor,
)
from smelter_tpu.render.renderer import Renderer
from smelter_tpu.scene import components as comp

from tests.harness import frame_to_rgb_u8


def test_program_cache_is_bounded():
    from smelter_tpu.render.program import OutputProgram

    r = Renderer()
    # distinct geometries → distinct fast programs; cache must stay bounded
    for i in range(OutputProgram.MAX_CACHED_PROGRAMS + 8):
        r.update_scene(
            "out",
            comp.View(
                background_color=RGBAColor(0, 0, 0),
                children=[
                    comp.View(
                        position=comp.StaticPosition(width=10.0 + i, height=20.0),
                        background_color=RGBAColor(255, 255, 255),
                    )
                ],
            ),
            Resolution(128, 72),
            PixelFormat.RGBA,
        )
        r.render(FrameSet(pts=float(i)))
        prog = r._programs["out"]
        assert len(prog._jit_cache) <= OutputProgram.MAX_CACHED_PROGRAMS


def test_offline_processing_env(monkeypatch):
    from smelter_tpu.config import read_config

    monkeypatch.setenv("SMELTER_OFFLINE_PROCESSING_ENABLE", "true")
    cfg = read_config()
    assert cfg.ahead_of_time_processing
    assert cfg.never_drop_output_frames
    assert cfg.run_late_scheduled_events

    monkeypatch.setenv("SMELTER_OFFLINE_PROCESSING_ENABLE", "false")
    monkeypatch.setenv("SMELTER_AHEAD_OF_TIME_PROCESSING_ENABLE", "1")
    cfg = read_config()
    assert cfg.ahead_of_time_processing
    assert not cfg.never_drop_output_frames


def test_audio_only_output(tmp_path):
    """Output with audio only (no video key) through the API."""
    import httpx

    from smelter_tpu.config import Config, LoggerConfig
    from tests.test_pipeline import _make_source_mp4
    from tests.test_server import ServerThread

    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "audio_only.mp4")
    cfg = Config(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
        logger=LoggerConfig(level="warning"),
    )
    s = ServerThread(cfg)
    try:
        with httpx.Client(base_url=s.base, timeout=60) as c:
            assert c.post(
                "/api/input/a/register",
                json={"type": "mp4", "path": src, "required": True, "offset_ms": 0},
            ).status_code == 200
            r = c.post(
                "/api/output/out/register",
                json={
                    "type": "mp4",
                    "path": out_path,
                    "audio": {
                        "encoder": {"type": "aac"},
                        "initial": {"inputs": [{"input_id": "a"}]},
                        "send_eos_when": {"all_inputs": True},
                    },
                },
            )
            assert r.status_code == 200, r.text
            assert c.post("/api/start", json={}).status_code == 200
            deadline = time.time() + 90
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

    from smelter_tpu.io.codec import AudioDecoder, Demuxer

    d = Demuxer(out_path)
    infos = [x for x in d.streams()]
    assert len(infos) == 1 and infos[0].media_type == "audio"
    dec = AudioDecoder(infos[0].codec, 48000, 2, extradata=infos[0].extradata,
                       in_sample_rate=infos[0].sample_rate,
                       in_channels=infos[0].channels)
    total = 0
    while True:
        pkt = d.read()
        if pkt is None:
            break
        dec.send(pkt.data, pkt.pts_s or 0.0)
        while True:
            out = dec.receive()
            if out in (None, "eof"):
                break
            total += out[0].shape[0]
    assert total > 60000  # ~2s at 48k


def test_nv12_input_renders():
    r = Renderer()
    r.register_input("cam")
    r.update_scene(
        "out",
        comp.Rescaler(child=comp.InputStream(input_id="cam")),
        Resolution(160, 90),
        PixelFormat.RGBA,
    )
    h, w = 90, 160
    # red in NV12 limited range: Y=63, U=102, V=240
    y = np.full((h, w), 63, np.uint8)
    uv = np.zeros((h // 2, w // 2, 2), np.uint8)
    uv[..., 0] = 102
    uv[..., 1] = 240
    f = Frame(data=(y, uv), format=PixelFormat.NV12,
              resolution=Resolution(w, h), pts=0.0)
    out = r.render(FrameSet(pts=0.0, frames={"cam": f})).frames["out"]
    rgb = frame_to_rgb_u8(out)
    assert rgb[45, 80, 0] > 180 and rgb[45, 80, 1] < 80


def test_two_outputs_different_scenes(tmp_path):
    """One pipeline, two outputs with different scenes from the same input."""
    from smelter_tpu.pipeline import (
        EndCondition,
        Mp4Input,
        Mp4InputOptions,
        Mp4OutputSink,
        OutputVideoOptions,
        Pipeline,
        PipelineOptions,
        RegisterInputOptions,
        VideoEncoderOptions,
    )
    from tests.test_pipeline import _make_source_mp4
    from tests.test_api_features import _decode_video

    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)
    out1 = str(tmp_path / "full.mp4")
    out2 = str(tmp_path / "boxed.mp4")
    p = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    p.register_input("a", Mp4Input(Mp4InputOptions(path=src)),
                     RegisterInputOptions(required=True, offset=0.0))
    p.register_output("full", Mp4OutputSink(out1),
        video=OutputVideoOptions(
            resolution=Resolution(160, 120),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="a")),
            end_condition=EndCondition(all_inputs=True)))
    p.register_output("boxed", Mp4OutputSink(out2),
        video=OutputVideoOptions(
            resolution=Resolution(160, 120),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.View(
                background_color=RGBAColor(0, 0, 255),
                children=[comp.Rescaler(
                    child=comp.InputStream(input_id="a"),
                    position=comp.AbsolutePosition(
                        width=80.0, height=60.0, top=30.0, left=40.0),
                )],
            ),
            end_condition=EndCondition(all_inputs=True)))
    p.start()
    p.wait_for_outputs_done(timeout=240)
    p.close()

    f1 = _decode_video(out1)
    f2 = _decode_video(out2)
    assert len(f1) >= 55 and len(f2) >= 55
    # full: red everywhere (V high); boxed: blue border region (U high)
    assert float(f1[30][2].mean()) > 180
    y, u, v, _, _ = f2[30]
    assert float(u[5, 5]) > 180        # corner is blue background
    assert float(v[30, 40]) > 180      # center box is red content


def test_config_tail_env_vars(monkeypatch):
    """Env parity tail (reference config.rs:170-351): RTMPS cert paths,
    WebRTC UDP strategy, NAT IPs, per-sink logger levels, FFmpeg level."""
    from smelter_tpu.config import read_config

    monkeypatch.setenv("SMELTER_RTMP_TLS_CERT_FILE", "/tmp/c.pem")
    monkeypatch.setenv("SMELTER_RTMP_TLS_KEY_FILE", "/tmp/k.pem")
    monkeypatch.setenv("SMELTER_WEBRTC_UDP_PORT_RANGE", "40000:40100")
    monkeypatch.setenv("SMELTER_WEBRTC_1_TO_1_NAT_IPS", "203.0.113.5, 198.51.100.7")
    monkeypatch.setenv("SMELTER_STDIO_LOGGER_LEVEL", "debug")
    monkeypatch.setenv("SMELTER_FILE_LOGGER_LEVEL", "error")
    cfg = read_config()
    assert cfg.rtmp_tls_cert_file == "/tmp/c.pem"
    assert cfg.rtmp_tls_key_file == "/tmp/k.pem"
    assert cfg.webrtc_udp_port_range == (40000, 40100)
    assert cfg.webrtc_udp_mux_port is None
    assert cfg.webrtc_nat_1to1_ips == ("203.0.113.5", "198.51.100.7")
    assert cfg.logger.stdio_level == "debug"
    assert cfg.logger.file_level == "error"

    # mux wins over range when both are set (config.rs:305-315)
    monkeypatch.setenv("SMELTER_WEBRTC_UDP_MUX_PORT", "41000")
    cfg = read_config()
    assert cfg.webrtc_udp_mux_port == 41000
    assert cfg.webrtc_udp_port_range is None

    # invalid values warn and fall back (config.rs inspect_err semantics)
    monkeypatch.setenv("SMELTER_WEBRTC_UDP_MUX_PORT", "not-a-port")
    monkeypatch.setenv("SMELTER_WEBRTC_UDP_PORT_RANGE", "9:1")
    cfg = read_config()
    assert cfg.webrtc_udp_mux_port is None
    assert cfg.webrtc_udp_port_range is None


def test_ffmpeg_logger_level_mapping(monkeypatch):
    from smelter_tpu.io.codec import _ffmpeg_log_level

    assert _ffmpeg_log_level() == 24  # default warn (config.rs:189-194)
    monkeypatch.setenv("SMELTER_FFMPEG_LOGGER_LEVEL", "debug")
    assert _ffmpeg_log_level() == 48
    monkeypatch.setenv("SMELTER_FFMPEG_LOGGER_LEVEL", "ERROR")
    assert _ffmpeg_log_level() == 16
    monkeypatch.setenv("SMELTER_FFMPEG_LOGGER_LEVEL", "bogus")
    assert _ffmpeg_log_level() == 24
