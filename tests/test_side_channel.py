"""Side-channel tests: publish decoded frames/PCM over unix sockets, consume
with the SDK readers (reference `queue/side_channel/` + python SDK)."""

import os
import threading
import time

import numpy as np
import pytest

from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
from smelter_tpu.core.types import Framerate, Resolution
from smelter_tpu.pipeline import (
    EndCondition,
    Mp4Input,
    Mp4InputOptions,
    Mp4OutputSink,
    OutputAudioOptions,
    OutputVideoOptions,
    Pipeline,
    PipelineOptions,
    RegisterInputOptions,
    AudioEncoderOptions,
    VideoEncoderOptions,
)
from smelter_tpu.scene import components as comp
from smelter_tpu.sdk import (
    AudioSideChannelReader,
    VideoSideChannelReader,
    discover_side_channels,
)

from tests.test_pipeline import _make_source_mp4


def test_serialize_roundtrip():
    from smelter_tpu.pipeline.side_channel import (
        serialize_audio_batch,
        serialize_rgba_frame,
    )
    import struct

    rgba = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    msg = serialize_rgba_frame(3, 2, 1.5, rgba.tobytes())
    w, h, pts = struct.unpack("!IIQ", msg[:16])
    assert (w, h) == (3, 2)
    assert pts == 1_500_000_000
    assert msg[16:] == rgba.tobytes()

    samples = np.array([[0.1, -0.1], [0.2, -0.2]], dtype=np.float64)
    msg = serialize_audio_batch(0.25, 48000, samples)
    pts, rate, ch, count = struct.unpack("!QIBI", msg[:17])
    assert pts == 250_000_000 and rate == 48000 and ch == 2 and count == 2
    out = np.frombuffer(msg[17:], dtype=">f8").reshape(2, 2)
    np.testing.assert_allclose(out, samples)


def test_side_channel_pipeline(tmp_path):
    """MP4 input with side channel: SDK receives RGBA frames + PCM while the
    pipeline composes."""
    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)
    sc_dir = str(tmp_path / "sockets")
    out_path = str(tmp_path / "out.mp4")

    pipeline = Pipeline(
        PipelineOptions(
            output_framerate=Framerate(30),
            ahead_of_time_processing=True,
            never_drop_output_frames=True,
        )
    )
    pipeline.register_input(
        "cam",
        Mp4Input(Mp4InputOptions(path=src)),
        RegisterInputOptions(
            required=True,
            offset=0.0,
            side_channel_video=True,
            side_channel_audio=True,
            side_channel_dir=sc_dir,
        ),
    )

    found = discover_side_channels(sc_dir)
    assert "cam" in found and "video" in found["cam"] and "audio" in found["cam"]

    frames = []
    batches = []

    def video_consumer():
        r = VideoSideChannelReader(found["cam"]["video"], timeout=30)
        for f in r:
            frames.append(f)
        r.close()

    def audio_consumer():
        r = AudioSideChannelReader(found["cam"]["audio"], timeout=30)
        for b in r:
            batches.append(b)
        r.close()

    vt = threading.Thread(target=video_consumer, daemon=True)
    at = threading.Thread(target=audio_consumer, daemon=True)
    vt.start()
    at.start()
    time.sleep(0.2)  # let consumers connect before frames flow

    pipeline.register_output(
        "out",
        Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="cam")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(inputs=[AudioMixerInputConfig("cam")]),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    pipeline.start()
    pipeline.wait_for_outputs_done(timeout=240)
    pipeline.close()
    vt.join(timeout=10)
    at.join(timeout=10)

    # frames received and red (decoded content, RGBA)
    assert len(frames) >= 30, len(frames)
    f = frames[len(frames) // 2]
    assert f.rgba.shape == (240, 320, 4)
    assert float(f.rgba[..., 0].mean()) > 150  # red channel dominant
    assert float(f.rgba[..., 2].mean()) < 80
    # pts increases
    assert frames[-1].pts_s > frames[0].pts_s

    # audio received with the sine
    assert batches, "no audio batches"
    total = np.concatenate([b.samples for b in batches])
    assert total.shape[0] > 40000
    assert batches[0].sample_rate == 48000


def test_rtp_input_side_channel_socket_created(tmp_path):
    """Wire `side_channel` on an RTP input register (new glue parity with
    mp4): the video side-channel unix socket appears under the configured
    dir."""
    import os
    import time

    from smelter_tpu.api import schema as api
    from smelter_tpu.io.rtp import register_rtp_input
    from smelter_tpu.core.types import Framerate
    from smelter_tpu.pipeline import Pipeline, PipelineOptions

    pipe = Pipeline(PipelineOptions(output_framerate=Framerate(30)))
    pipe.options.side_channel_dir = str(tmp_path)
    spec = api.RtpInput.model_validate({
        "type": "rtp_stream", "port": 0,
        "video": {"decoder": "ffmpeg_h264"},
        "side_channel": {"video": True},
    })
    try:
        register_rtp_input(pipe, "cam", spec)
        deadline = time.time() + 10
        sock = None
        while time.time() < deadline and sock is None:
            for d in (str(tmp_path), "/tmp"):
                cand = [os.path.join(root, f)
                        for root, _, files in os.walk(d)
                        for f in files if f == "video_cam.sock"]
                if cand:
                    sock = cand[0]
                    break
            time.sleep(0.1)
        assert sock is not None, "video_cam.sock never appeared"
    finally:
        pipe.close()
