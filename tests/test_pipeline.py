"""End-to-end pipeline tests: MP4 in → compose + mix → MP4 out.

The TPU-build analogue of the reference pipeline tests
(`integration-tests/src/pipeline_tests/video_audio.rs`): drive a full
in-process Pipeline offline (ahead-of-time processing), then demux/decode the
output and check frame count, composition layout, and audio spectrum (FFT),
like `compare_video_dumps`/`compare_audio_dumps`.
"""

import os
import tempfile

import numpy as np
import pytest

from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
from smelter_tpu.core.types import Framerate, Resolution, RGBAColor
from smelter_tpu.io.codec import (
    AudioDecoder,
    AudioEncoder,
    Codec,
    Demuxer,
    Muxer,
    VideoDecoder,
    VideoEncoder,
)
from smelter_tpu.pipeline import (
    EndCondition,
    RegisterInputOptions,
    Mp4Input,
    Mp4InputOptions,
    Mp4OutputSink,
    OutputAudioOptions,
    OutputVideoOptions,
    Pipeline,
    PipelineOptions,
    AudioEncoderOptions,
    VideoEncoderOptions,
)
from smelter_tpu.pipeline.output import EndConditionState
from smelter_tpu.scene import components as comp

FPS = 30
DUR_S = 2.0
W, H = 320, 240


def _make_source_mp4(path: str, color: str, tone_hz: float) -> None:
    """2s clip: solid color video + sine tone audio."""
    venc = VideoEncoder(Codec.H264, W, H, FPS)
    aenc = AudioEncoder(Codec.AAC, 48000, 2)
    yuv = {
        # BT.709 limited-range approximations
        "red": (63, 102, 240),
        "blue": (32, 240, 118),
    }[color]
    y = np.full((H, W), yuv[0], np.uint8)
    u = np.full((H // 2, W // 2), yuv[1], np.uint8)
    v = np.full((H // 2, W // 2), yuv[2], np.uint8)

    vpkts = []
    for i in range(int(DUR_S * FPS)):
        venc.send(y, u, v, i / FPS)
        while True:
            p = venc.receive()
            if p is None or p == "eof":
                break
            vpkts.append(p)
    venc.send_eof()
    while True:
        p = venc.receive()
        if p is None or p == "eof":
            break
        vpkts.append(p)

    t = np.arange(int(DUR_S * 48000)) / 48000.0
    sine = (0.4 * np.sin(2 * np.pi * tone_hz * t)).astype(np.float32)
    pcm = np.stack([sine, sine], axis=1)
    apkts = []
    aenc.send(pcm, 0.0)
    aenc.send_eof()
    while True:
        p = aenc.receive()
        if p is None or p == "eof":
            break
        apkts.append(p)

    mux = Muxer(path)
    vs = mux.add_video(Codec.H264, W, H, FPS, 1, venc.extradata())
    as_ = mux.add_audio(Codec.AAC, 48000, 2, aenc.extradata())
    mux.write_header()
    for p in vpkts:
        mux.write(vs, p.data, p.pts_s, p.dts_s, p.is_keyframe)
    for p in apkts:
        mux.write(as_, p.data, p.pts_s, p.dts_s, p.is_keyframe)
    mux.close()
    venc.close()
    aenc.close()


def _decode_output(path: str):
    d = Demuxer(path)
    infos = {s.media_type: s for s in d.streams()}
    vdec = VideoDecoder(infos["video"].codec, infos["video"].extradata)
    adec = AudioDecoder(
        infos["audio"].codec, 48000, 2,
        extradata=infos["audio"].extradata,
        in_sample_rate=infos["audio"].sample_rate,
        in_channels=infos["audio"].channels,
    )
    frames, pcm = [], []
    while True:
        pkt = d.read()
        if pkt is None:
            break
        if pkt.stream_index == infos["video"].index:
            vdec.send(pkt.data, pkt.pts_s or 0.0)
            while True:
                f = vdec.receive()
                if f is None or f == "eof":
                    break
                frames.append(f)
        else:
            adec.send(pkt.data, pkt.pts_s or 0.0)
            while True:
                s = adec.receive()
                if s is None or s == "eof":
                    break
                pcm.append(s[0])
    vdec.send_eof()
    while True:
        f = vdec.receive()
        if f is None or f == "eof":
            break
        frames.append(f)
    adec.send_eof()
    while True:
        s = adec.receive()
        if s is None or s == "eof":
            break
        pcm.append(s[0])
    d.close()
    audio = np.concatenate(pcm) if pcm else np.zeros((0, 2), np.float32)
    return frames, audio, infos


def test_pipeline_mp4_to_mp4_compose_and_mix(tmp_path):
    src_a = str(tmp_path / "a.mp4")
    src_b = str(tmp_path / "b.mp4")
    out_path = str(tmp_path / "out.mp4")
    _make_source_mp4(src_a, "red", 440.0)
    _make_source_mp4(src_b, "blue", 880.0)

    pipeline = Pipeline(
        PipelineOptions(
            output_framerate=Framerate(FPS),
            ahead_of_time_processing=True,
            never_drop_output_frames=True,
        )
    )
    scene = comp.View(
        background_color=RGBAColor(0, 0, 0, 255),
        direction="row",
        children=[
            comp.Rescaler(child=comp.InputStream(input_id="in_a")),
            comp.Rescaler(child=comp.InputStream(input_id="in_b")),
        ],
    )
    # offline mode: required inputs at offset 0 → deterministic frame count
    # (reference offline-processing semantics, queue.rs:96-118)
    in_opts = RegisterInputOptions(required=True, offset=0.0)
    pipeline.register_input("in_a", Mp4Input(Mp4InputOptions(path=src_a)), in_opts)
    pipeline.register_input("in_b", Mp4Input(Mp4InputOptions(path=src_b)), in_opts)
    pipeline.register_output(
        "out",
        Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(640, 240),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=scene,
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(
                inputs=[
                    AudioMixerInputConfig("in_a", volume=1.0),
                    AudioMixerInputConfig("in_b", volume=1.0),
                ]
            ),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    pipeline.start()
    pipeline.wait_for_outputs_done(timeout=540)
    pipeline.close()

    frames, audio, infos = _decode_output(out_path)
    # --- video checks ---
    n_expected = int(DUR_S * FPS)
    assert abs(len(frames) - n_expected) <= 1, len(frames)
    assert infos["video"].width == 640 and infos["video"].height == 240
    y, u, v, _, _ = frames[len(frames) // 2]
    # left half red-ish (V high), right half blue-ish (U high) in YUV
    left_v = float(v[:, : v.shape[1] // 2].mean())
    right_v = float(v[:, v.shape[1] // 2 :].mean())
    left_u = float(u[:, : u.shape[1] // 2].mean())
    right_u = float(u[:, u.shape[1] // 2 :].mean())
    assert left_v > 200 and right_v < 150, (left_v, right_v)
    assert right_u > 200 and left_u < 150, (left_u, right_u)

    # --- audio checks: FFT peaks at both tones ---
    assert audio.shape[0] > 48000 * 1.5
    mono = audio.mean(axis=1)
    seg = mono[24000:72000]
    spectrum = np.abs(np.fft.rfft(seg))
    freqs = np.fft.rfftfreq(len(seg), 1 / 48000)

    def power_near(f0, width=15.0):
        mask = (freqs > f0 - width) & (f0 + width > freqs)
        return float(spectrum[mask].max())

    noise = float(np.median(spectrum))
    assert power_near(440) > 50 * noise
    assert power_near(880) > 50 * noise

    # events emitted
    kinds = {(e.kind, e.entity_id) for e in pipeline.events.history()}
    assert ("OUTPUT_DONE", "out") in kinds


def test_end_condition_state():
    s = EndConditionState(EndCondition(all_inputs=True), {"a", "b"})
    assert not s.on_input_eos("a")
    assert s.on_input_eos("b")
    assert s.ended
    assert not s.on_input_eos("b")  # only transitions once

    s2 = EndConditionState(EndCondition(any_of=("x", "y")), set())
    assert not s2.on_input_eos("z")
    assert s2.on_input_eos("x")

    s3 = EndConditionState(EndCondition(all_of=("x", "y")), set())
    assert not s3.on_input_eos("x")
    assert s3.on_input_eos("y")

    s4 = EndConditionState(EndCondition(any_input=True), set())
    assert s4.on_input_eos("whatever")

    # default: never ends
    s5 = EndConditionState(EndCondition(), {"a"})
    assert not s5.on_input_eos("a")

    # input registered after output creation counts toward all_inputs
    s6 = EndConditionState(EndCondition(all_inputs=True), {"a"})
    s6.on_input_registered("b")
    assert not s6.on_input_eos("a")
    assert s6.on_input_eos("b")


def test_keyframe_interval_option_sets_gop():
    """`keyframe_interval_ms` (wire: FfmpegH264Encoder.keyframe_interval_ms,
    reference ffmpeg_h264.rs gop mapping) controls keyframe cadence."""
    import time

    from smelter_tpu.core.types import Frame, PixelFormat
    from smelter_tpu.pipeline.input import RawDataInput
    from smelter_tpu.pipeline.output import EncodedDataOutputSink
    from smelter_tpu.utils.channels import Closed

    pipeline = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    src = RawDataInput(has_video=True, has_audio=False)
    pipeline.register_input(
        "cam", src, RegisterInputOptions(required=True, offset=0.0)
    )
    sink = EncodedDataOutputSink()
    pipeline.register_output(
        "out", sink,
        video=OutputVideoOptions(
            resolution=Resolution(128, 96),
            encoder=VideoEncoderOptions(
                codec="h264", preset="ultrafast",
                keyframe_interval_s=0.5,   # 15 frames at 30 fps
            ),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="cam")),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    pipeline.start()
    rng = np.random.RandomState(0)
    u = np.full((48, 64), 128, np.uint8)
    for i in range(60):
        y = rng.randint(0, 255, (96, 128), dtype=np.uint8)
        src.video.send(Frame(
            data=(y, u, u), format=PixelFormat.PLANAR_YUV420,
            resolution=Resolution(128, 96), pts=i / 30.0,
        ))
    src.video.close()
    keyframe_at = []
    n = 0
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            pkt = sink.video.recv(timeout=2.0)
        except (Closed, TimeoutError):
            break
        if pkt.is_keyframe:
            keyframe_at.append(n)
        n += 1
    pipeline.close()
    assert n >= 50, n
    assert len(keyframe_at) >= 3, keyframe_at
    gaps = [b - a for a, b in zip(keyframe_at, keyframe_at[1:])]
    assert all(g == 15 for g in gaps), (keyframe_at, gaps)


def test_encoder_pixel_format_yuv444_and_422():
    """`pixel_format` on the video encoder (wire FfmpegH264Encoder.
    pixel_format): the renderer emits 4:4:4 and the encoder opens the
    matching x264 profile (High 4:4:4 = 244, High 4:2:2 = 122)."""
    import time

    from smelter_tpu.core.types import Frame, PixelFormat
    from smelter_tpu.pipeline.input import RawDataInput
    from smelter_tpu.pipeline.output import EncodedDataOutputSink
    from smelter_tpu.utils.channels import Closed

    def sps_profile(extradata):
        i = extradata.find(b"\x00\x00\x01")
        while i >= 0:
            j = i + 3
            if j < len(extradata) and (extradata[j] & 0x1F) == 7:
                return extradata[j + 1]
            i = extradata.find(b"\x00\x00\x01", i + 3)
        return None

    for fmt, want_profile in (("yuv444p", 244), ("yuv422p", 122)):
        pipeline = Pipeline(PipelineOptions(
            output_framerate=Framerate(30),
            ahead_of_time_processing=True,
            never_drop_output_frames=True,
        ))
        src = RawDataInput(has_video=True, has_audio=False)
        pipeline.register_input(
            "cam", src, RegisterInputOptions(required=True, offset=0.0))
        sink = EncodedDataOutputSink()
        pipeline.register_output(
            "out", sink,
            video=OutputVideoOptions(
                resolution=Resolution(128, 96),
                encoder=VideoEncoderOptions(
                    codec="h264", preset="ultrafast", pixel_format=fmt),
                initial_root=comp.Rescaler(
                    child=comp.InputStream(input_id="cam")),
                end_condition=EndCondition(all_inputs=True),
            ),
        )
        pipeline.start()
        u = np.full((48, 64), 128, np.uint8)
        for i in range(10):
            y = np.full((96, 128), 60 + i * 10, np.uint8)
            src.video.send(Frame(
                data=(y, u, u), format=PixelFormat.PLANAR_YUV420,
                resolution=Resolution(128, 96), pts=i / 30.0))
        src.video.close()
        n = 0
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                sink.video.recv(timeout=2.0)
                n += 1
            except (Closed, TimeoutError):
                break
        pipeline.close()
        assert n >= 8, (fmt, n)
        assert sps_profile(sink.video_extradata) == want_profile, fmt


def test_output_error_event(tmp_path):
    """A dead encoder/sink chain surfaces as OUTPUT_ERROR (event.rs
    OutputError severity=Critical) instead of a silent thread death: an MP4
    sink pointed at a nonexistent directory fails in setup_video."""
    import time

    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)
    pipeline = Pipeline(PipelineOptions(
        output_framerate=Framerate(FPS),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    try:
        pipeline.register_input(
            "in_a", Mp4Input(Mp4InputOptions(path=src)),
            RegisterInputOptions(required=True, offset=0.0),
        )
        pipeline.register_output(
            "out",
            Mp4OutputSink(str(tmp_path / "no_such_dir" / "deep" / "out.mp4")),
            video=OutputVideoOptions(
                resolution=Resolution(160, 120),
                encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
                initial_root=comp.Rescaler(
                    child=comp.InputStream(input_id="in_a")
                ),
                end_condition=EndCondition(all_inputs=True),
            ),
        )
        pipeline.start()
        deadline = time.time() + 30
        err = None
        while time.time() < deadline:
            err = next(
                (e for e in pipeline.events.history()
                 if e.kind == "OUTPUT_ERROR"), None,
            )
            if err is not None:
                break
            time.sleep(0.1)
        assert err is not None, "OUTPUT_ERROR never emitted"
        assert err.entity_id == "out"
        # wire properties mirror event.rs:63-68: severity, err, stack
        assert err.properties["severity"] == "critical"
        assert "video chain" in err.properties["err"]
        assert "Traceback" in err.properties["stack"]
    finally:
        pipeline.close()
