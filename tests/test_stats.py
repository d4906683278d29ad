"""Per-protocol /stats reports (reference `stats/{input,output}_reports.rs`):
bitrate windows, RTP jitter-buffer packet counters, and the end-to-end
report shape for an mp4→mp4 pipeline."""

import time

import numpy as np

from smelter_tpu.core.types import Framerate, Resolution
from smelter_tpu.io.rtp import RtpPacket, JitterBuffer
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
from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
from smelter_tpu.pipeline.stats import (
    BitrateWindow,
    RtpTrackStats,
    TrackStats,
    collect_stats,
)
from smelter_tpu.scene import components as comp

from tests.test_pipeline import _make_source_mp4


def test_bitrate_window_reports_both_windows():
    w = BitrateWindow()
    for _ in range(10):
        w.add(1000)
    rep = w.report()
    assert rep["bitrate_1_second"] == 80_000
    assert rep["bitrate_1_minute"] == 80_000 // 60


def test_rtp_track_stats_counts_losses_via_jitter_buffer():
    t = [0.0]
    stats = RtpTrackStats()
    jb = JitterBuffer(window_s=0.05, clock=lambda: t[0], stats=stats)

    def pkt(seq):
        return RtpPacket(
            payload_type=96, sequence_number=seq, timestamp=seq * 3000,
            ssrc=1, payload=b"x" * 100,
        )

    assert jb.push(pkt(1)) != []
    assert jb.push(pkt(2)) != []
    jb.push(pkt(4))          # gap: 3 missing, held back
    t[0] += 0.2              # window expires
    released = jb.push(pkt(5))
    assert [p.sequence_number for p in released] == [4, 5]
    rep = stats.report()
    assert rep["packets_received"] == 4
    assert rep["packets_lost"] == 1
    assert rep["bitrate_1_minute"] > 0
    win = rep["last_10_seconds"]
    assert win["packets_received"] == 4
    # field-level parity with RtpJitterBufferSlidingWindowStatsReport
    # (stats/input/rtp.rs:140-176): effective buffer sampled on write AND
    # on pop, input buffer size sampled on pop
    for name in ("effective_buffer_on_write", "effective_buffer_on_pop",
                 "input_buffer"):
        for stat in ("avg", "max", "min"):
            assert f"{name}_{stat}_seconds" in win, win
    # all 4 packets were released (popped): pop-side samples exist and the
    # input buffer size equals the 50 ms window
    assert win["input_buffer_max_seconds"] == 0.05
    # write-side margin is bounded by pts-anchor + window
    assert 0.0 <= win["effective_buffer_on_write_max_seconds"] <= 0.5


def test_pipeline_stats_reports_mp4_protocols(tmp_path):
    src = str(tmp_path / "src.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "out.mp4")
    p = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    p.register_input(
        "src", Mp4Input(Mp4InputOptions(path=src)),
        RegisterInputOptions(required=True, offset=0.0),
    )
    p.register_output(
        "out", Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="src")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(
                inputs=[AudioMixerInputConfig("src")]
            ),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    p.start()
    deadline = time.time() + 120
    while time.time() < deadline:
        kinds = {(e.kind, e.entity_id) for e in p.events.history()}
        if ("OUTPUT_DONE", "out") in kinds:
            break
        time.sleep(0.2)
    report = collect_stats(p)
    p.close()

    in_stats = report["inputs"]["src"]["stats"]
    assert in_stats["type"] == "mp4"
    assert in_stats["video"]["bitrate_1_minute"] > 0
    assert in_stats["audio"]["bitrate_1_minute"] > 0
    out_stats = report["outputs"]["out"]["stats"]
    assert out_stats["type"] == "mp4"
    assert out_stats["video"]["bitrate_1_minute"] > 0
    assert out_stats["audio"]["bitrate_1_minute"] > 0


def test_queue_buffer_report_in_stats():
    """/stats carries per-input queue occupancy (the reference's
    EffectiveBuffer report analogue)."""
    from smelter_tpu.queue.sync_queue import Queue, QueueInputOptions, QueueOptions
    from smelter_tpu.core.types import AudioSamples, Frame, Framerate, PixelFormat, Resolution
    import numpy as np

    q = Queue(QueueOptions(output_framerate=Framerate(30)))
    qi = q.add_input("a", QueueInputOptions(), has_video=True, has_audio=True)
    vch = qi.current.video.channel
    y = np.zeros((8, 8), np.uint8)
    u = v = np.zeros((4, 4), np.uint8)
    # the track channel is capacity-1: pump each frame into the receiver
    # buffer the way the tick loop does (no consumer thread in this test)
    for i in range(3):
        vch.send(Frame(data=(y, u, v), format=PixelFormat.PLANAR_YUV420,
                       resolution=Resolution(8, 8), pts=i / 30.0))
        qi.current.video._try_enqueue()
    rep = q.buffer_report()
    assert "a" in rep
    assert rep["a"].get("video_buffer_s", 0) >= 2 / 30.0 - 1e-6, rep
    q.close()
