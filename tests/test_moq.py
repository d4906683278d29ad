"""MoQ protocol family (reference smelter-core/src/pipeline/moq/):
catalog/container units, timestamp-aligner semantics, session-level
publish/subscribe over real QUIC, and full pipeline loopback
(our client output -> our server input) for CMAF and legacy containers.
"""

import threading
import time

import numpy as np
import pytest

from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
from smelter_tpu.core.types import Framerate, Resolution
from smelter_tpu.io.moq import catalog as catalog_mod
from smelter_tpu.io.moq import wire
from smelter_tpu.io.moq.aligner import (
    AV_SKEW_MAX,
    EpochShared,
    TimestampAligner,
)
from smelter_tpu.io.moq.container import (
    ContainerReader,
    ContainerWriter,
    build_init_segment,
    parse_init_segment,
)
from smelter_tpu.io.moq.output import BroadcastPublisher
from smelter_tpu.io.moq.server import MoqServer, MoqServerState
from smelter_tpu.io.moq.session import MoqSession
from smelter_tpu.io.quic import QuicClient
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
)
from smelter_tpu.pipeline.output import AudioEncoderOptions, VideoEncoderOptions
from smelter_tpu.scene import components as comp


# ---------------------------------------------------------------------------
# units
# ---------------------------------------------------------------------------


def test_catalog_roundtrip():
    cat = catalog_mod.Catalog()
    init = build_init_segment(True, "h264", 90000,
                              b"\x01B\xe0\x1f\xff\xe1\x00\x01a\x01\x00\x01b",
                              320, 240)
    cat.video["video0"] = catalog_mod.TrackEntry(
        name="video0", codec="h264", container="cmaf",
        description=b"\x01B\xe0\x1f", init_segment=init, timescale=90000,
        width=320, height=240,
    )
    cat.audio["audio0"] = catalog_mod.TrackEntry(
        name="audio0", codec="opus", container="legacy",
        sample_rate=48000, channels=2,
    )
    back = catalog_mod.Catalog.from_bytes(cat.to_bytes())
    v = back.first_video()
    a = back.first_audio()
    assert v.codec == "h264" and v.container == "cmaf"
    assert v.init_segment == init and v.description == b"\x01B\xe0\x1f"
    assert v.width == 320 and v.height == 240
    assert a.codec == "opus" and a.sample_rate == 48000


def test_container_cmaf_roundtrip():
    w = ContainerWriter("cmaf", 90000)
    r = ContainerReader("cmaf", 90000)
    packed = w.pack(1_000_000, b"sample-data", True)
    ts, payload = r.unpack(1_000_000, packed)
    assert payload == b"sample-data"
    assert abs(ts - 1_000_000) <= 12  # timescale rounding


def test_container_legacy_roundtrip():
    w = ContainerWriter("legacy")
    r = ContainerReader("legacy")
    packed = w.pack(123_456, b"xyz", False)
    ts, payload = r.unpack(0, packed)
    assert ts == 123_456 and payload == b"xyz"


def test_init_segment_extracts_description():
    avcc = b"\x01B\xe0\x1f\xff\xe1\x00\x02\x11\x22\x01\x00\x02\x33\x44"
    init = build_init_segment(True, "h264", 90000, avcc, 640, 360)
    ts, desc, fourcc = parse_init_segment(init)
    assert (ts, fourcc) == (90000, "avc1")
    assert desc == avcc


def test_control_message_roundtrip():
    parser = wire.ControlParser()
    data = (wire.setup("room/cam1", "tok") + wire.announce("bcast")
            + wire.subscribe(3, "video0") + wire.subscribe_ok(3))
    # feed byte-by-byte to exercise incremental parsing
    msgs = []
    for i in range(len(data)):
        msgs.extend(parser.feed(data[i : i + 1]))
    assert [m.mtype for m in msgs] == [
        wire.MSG_SETUP, wire.MSG_ANNOUNCE, wire.MSG_SUBSCRIBE,
        wire.MSG_SUBSCRIBE_OK,
    ]
    r = wire.Reader(msgs[0].body)
    assert r.u8() == wire.VERSION
    assert r.string() == "room/cam1" and r.string() == "tok"


# ---------------------------------------------------------------------------
# timestamp aligner (reference timestamp_aligner.rs semantics)
# ---------------------------------------------------------------------------


class _FakeClock:
    def __init__(self):
        self.t = 100.0

    def __call__(self):
        return self.t


def test_aligner_anchor_mode_preserves_av_offset():
    clock = _FakeClock()
    shared = EpochShared(clock=clock)
    v = TimestampAligner(shared, "video", False)
    a = TimestampAligner(shared, "audio", False)
    # video first frame at raw 1000.0: held (mode unresolved until the
    # counterpart's first frame is seen — timestamp_aligner.rs:386-394)
    assert v.on_chunk(True, 1000.0, b"v0") == []
    clock.t += 0.005
    # audio 20 ms later in raw time: small skew -> anchor mode; audio locks
    # immediately at the shared anchor offset (the video frame's)
    out_a = a.on_chunk(True, 1000.02, b"a0")
    assert len(out_a) == 1 and abs(out_a[0].pts - 0.02) < 0.01
    # video's next frame adopts the decided mode and flushes the held one
    clock.t += 1 / 30
    out_v = v.on_chunk(False, 1000.0 + 1 / 30, b"v1")
    assert [c.data for c in out_v] == [b"v0", b"v1"]
    assert abs(out_v[0].pts - 0.0) < 1e-9
    assert abs(out_v[1].pts - 1 / 30) < 1e-9


def test_aligner_live_edge_on_large_skew():
    clock = _FakeClock()
    shared = EpochShared(clock=clock)
    v = TimestampAligner(shared, "video", False)
    a = TimestampAligner(shared, "audio", False)
    assert v.on_chunk(True, 50.0, b"v0") == []   # held: mode unresolved
    clock.t += 0.001
    # audio epoch differs by >> AV_SKEW_MAX -> live edge for the stream
    a.on_chunk(True, 5000.0, b"a0")
    assert shared.mode() == "live_edge"
    # steady arrival: raw and wall-clock advance together, so the running
    # max of (raw - elapsed) plateaus after PLATEAU_FRAMES and locks
    outs = []
    for i in range(1, 7):
        clock.t += 1 / 30
        outs.extend(v.on_chunk(False, 50.0 + i / 30.0, b"v"))
    assert outs, "live-edge never locked during plateau"
    # locked: output monotonic from the held batch
    pts = [c.pts for c in outs]
    assert pts == sorted(pts)


def test_aligner_single_track_locks_immediately():
    clock = _FakeClock()
    shared = EpochShared(clock=clock)
    v = TimestampAligner(shared, "video", True)
    out = v.on_chunk(True, 777.0, b"v0")
    assert len(out) == 1 and out[0].pts == 0.0


def test_aligner_discontinuity_resets():
    clock = _FakeClock()
    shared = EpochShared(clock=clock)
    v = TimestampAligner(shared, "video", True)
    v.on_chunk(True, 10.0, b"v0")
    clock.t += 1 / 30
    v.on_chunk(False, 10.033, b"v1")
    # keyframe with a 100 s raw jump: epoch discontinuity -> re-warm
    clock.t += 1 / 30
    out = v.on_chunk(True, 110.0, b"v2")
    assert not v.is_locked() or out == []  # re-warming
    # flush (EOS path) force-locks and drains
    drained = v.flush() if not v.is_locked() else []
    assert drained or out


def test_aligner_eos_flush_renders_sub_warmup_clip():
    clock = _FakeClock()
    shared = EpochShared(clock=clock)
    v = TimestampAligner(shared, "video", False)  # two-track, audio never comes
    held = v.on_chunk(True, 0.0, b"v0")
    assert held == []
    out = v.flush()
    assert len(out) == 1 and out[0].data == b"v0"


# ---------------------------------------------------------------------------
# session level over real QUIC
# ---------------------------------------------------------------------------


def test_moq_session_publish_subscribe_loopback():
    state = MoqServerState()

    class FakeInput:
        options = type("O", (), {"auth_token": "tok"})()

        def __init__(self):
            self.session = None
            self.got = threading.Event()

        def attach_session(self, session):
            self.session = session
            self.got.set()
            return True

    sink = FakeInput()
    state.register("cam1", sink)
    server = MoqServer(0, state, cert_dir="/tmp/smelter_moq_test")
    try:
        # wrong token rejected
        c_bad = QuicClient("127.0.0.1", server.port, [wire.ALPN])
        h_bad = c_bad.connect(timeout=15)
        s_bad = MoqSession(h_bad, is_quic_client=True)
        s_bad.start_client("cam1", "wrong")
        with pytest.raises((ConnectionError, TimeoutError)):
            s_bad.wait_setup(timeout=8)
        c_bad.close()

        # correct token: announce + publish a track; subscribe from server side
        client = QuicClient("127.0.0.1", server.port, [wire.ALPN])
        h = client.connect(timeout=15)
        session = MoqSession(h, is_quic_client=True)
        publisher = BroadcastPublisher(session, "bcast")
        session.start_client("cam1", "tok")
        session.wait_setup(timeout=8)

        cat = catalog_mod.Catalog()
        cat.video["video0"] = catalog_mod.TrackEntry(
            name="video0", codec="h264", container="loc", width=64, height=64,
        )
        publisher.set_catalog(cat)

        assert sink.got.wait(10), "server session never attached"
        srv_session = sink.session
        assert srv_session.next_announce(timeout=10) == "bcast"

        cat_track = srv_session.subscribe_track(catalog_mod.CATALOG_TRACK)
        first = cat_track.read(timeout=10)
        got_cat = catalog_mod.Catalog.from_bytes(first.payload)
        assert got_cat.first_video().codec == "h264"

        video = srv_session.subscribe_track("video0")
        prod = publisher.producer("video0")
        deadline = time.time() + 5
        while prod is None and time.time() < deadline:
            time.sleep(0.05)
            prod = publisher.producer("video0")
        assert prod is not None
        # two groups of two frames
        for g in range(2):
            prod.write(g * 1000, True, b"kf%d" % g, new_group=True)
            prod.write(g * 1000 + 33, False, b"df%d" % g, new_group=False)
        prod.finish_group()
        got = []
        deadline = time.time() + 10
        while len(got) < 4 and time.time() < deadline:
            tf = video.read(timeout=1)
            if tf is not None:
                got.append(tf)
        payloads = sorted(t.payload for t in got)
        assert payloads == [b"df0", b"df1", b"kf0", b"kf1"]
        keyframes = {t.payload: t.keyframe for t in got}
        assert keyframes[b"kf0"] and not keyframes[b"df1"]
        client.close()
    finally:
        server.close()


# ---------------------------------------------------------------------------
# full pipeline loopback (reference-style: like the RTMP loopback test)
# ---------------------------------------------------------------------------


def _wait_done(pipe: Pipeline, output_id: str, timeout: float) -> bool:
    deadline = time.time() + timeout
    while time.time() < deadline:
        kinds = {(e.kind, e.entity_id) for e in pipe.events.history()}
        if ("OUTPUT_DONE", output_id) in kinds:
            return True
        time.sleep(0.2)
    return False


@pytest.mark.parametrize("container", ["cmaf", "legacy"])
def test_moq_pipeline_loopback(tmp_path, container):
    """MP4 -> MoqClientOutput == QUIC ==> MoqServer -> MoqServerInput ->
    compose -> MP4; A/V round-trips in-process (VERDICT round-1 item 3)."""
    from smelter_tpu.io.moq.input import MoqServerInput, MoqServerInputOptions
    from smelter_tpu.io.moq.output import MoqClientOutput
    from tests.test_pipeline import _decode_output, _make_source_mp4

    src = str(tmp_path / "src.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "out.mp4")

    # receiving side: MoQ server + input
    rx = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    state = MoqServerState()
    source = MoqServerInput(MoqServerInputOptions(auth_token="s3cret"))
    rx.register_input("in", source, RegisterInputOptions(required=True, offset=0.0))
    state.register("in", source)
    moq_server = MoqServer(0, state, cert_dir=str(tmp_path / "certs"))
    rx.register_output(
        "out", Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="in")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(
                inputs=[AudioMixerInputConfig("in")]
            ),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    rx.start()

    # sending side: MP4 -> MoQ publish
    tx = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    tx.register_input(
        "a", Mp4Input(Mp4InputOptions(path=src)),
        RegisterInputOptions(required=True, offset=0.0),
    )
    sink = MoqClientOutput(
        f"moql://127.0.0.1:{moq_server.port}/in?token=s3cret",
        "bcast", container=container,
    )
    tx.register_output(
        "moq", sink,
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="a")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(
                inputs=[AudioMixerInputConfig("a")]
            ),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    tx.start()
    try:
        assert _wait_done(tx, "moq", 180), "tx OUTPUT_DONE not observed"
        assert _wait_done(rx, "out", 180), "rx OUTPUT_DONE not observed"
    finally:
        tx.close()
        rx.close()
        moq_server.close()

    frames, audio, _infos = _decode_output(out_path)
    assert len(frames) >= 40, len(frames)
    assert audio.shape[0] > 40000
    # red content -> high V plane
    assert float(np.mean([float(f[2].mean()) for f in frames])) > 170
    # the 440 Hz tone survives: FFT peak near 440
    mono = audio.mean(axis=1)
    mono = mono[24000:72000] if mono.shape[0] > 72000 else mono
    spec = np.abs(np.fft.rfft(mono * np.hanning(len(mono))))
    freqs = np.fft.rfftfreq(len(mono), 1.0 / 48000)
    peak = freqs[int(np.argmax(spec))]
    assert abs(peak - 440.0) < 15.0, peak


def test_moq_datagram_track_loopback():
    """Datagram track mode (beyond-reference low-latency path): sub-MTU
    objects ride unreliable QUIC DATAGRAMs — no stream HoL blocking —
    and oversized payloads signal stream fallback."""
    state = MoqServerState()

    class FakeInput:
        options = type("O", (), {"auth_token": ""})()

        def __init__(self):
            self.session = None
            self.got = threading.Event()

        def attach_session(self, session):
            self.session = session
            self.got.set()
            return True

    sink = FakeInput()
    state.register("dgcam", sink)
    server = MoqServer(0, state, cert_dir="/tmp/smelter_moq_test")
    try:
        client = QuicClient("127.0.0.1", server.port, [wire.ALPN])
        h = client.connect(timeout=15)
        session = MoqSession(h, is_quic_client=True)
        publisher = BroadcastPublisher(session, "bcast")
        session.start_client("dgcam", "")
        session.wait_setup(timeout=8)

        cat = catalog_mod.Catalog()
        cat.audio["audio0"] = catalog_mod.TrackEntry(
            name="audio0", codec="opus", container="loc",
        )
        publisher.set_catalog(cat)
        assert sink.got.wait(10)
        srv_session = sink.session
        assert srv_session.next_announce(timeout=10) == "bcast"

        audio = srv_session.subscribe_track("audio0")
        prod = publisher.producer("audio0")
        deadline = time.time() + 5
        while prod is None and time.time() < deadline:
            time.sleep(0.05)
            prod = publisher.producer("audio0")
        assert prod is not None

        # oversized -> caller must fall back to streams
        assert not prod.write_datagram(0, False, b"x" * 4000)
        # sub-MTU objects ride datagrams
        sent = []
        for i in range(20):
            payload = b"opus-%03d" % i
            assert prod.write_datagram(i * 20000, i == 0, payload,
                                       new_group=(i % 10 == 0))
            sent.append(payload)
            time.sleep(0.005)
        got = []
        deadline = time.time() + 10
        while len(got) < 20 and time.time() < deadline:
            tf = audio.read(timeout=1)
            if tf is not None:
                got.append(tf)
        # datagrams are unreliable even on loopback; expect most, in any order
        assert len(got) >= 15, len(got)
        assert {t.payload for t in got} <= set(sent)
        first = min(got, key=lambda t: t.timestamp_us)
        assert first.keyframe or first.timestamp_us > 0
        client.close()
    finally:
        server.close()


def test_container_av1_init_segment_roundtrip():
    """AV1 CMAF (beyond reference): av01 sample entry with av1C configOBUs
    survives the init-segment build/parse roundtrip."""
    from smelter_tpu.io.moq.container import build_init_segment, parse_init_segment

    seq_hdr = bytes([0x0A, 0x03, 0x01, 0x02, 0x03])  # sequence header OBU
    init = build_init_segment(True, "av1", 90000, seq_hdr, 640, 360)
    timescale, desc, fourcc = parse_init_segment(init)
    assert timescale == 90000
    assert fourcc == "av01"
    assert desc == seq_hdr
