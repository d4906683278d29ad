"""RTP tests: packet codec, jitter buffer, payload/depayload roundtrips, and
full pipeline loopback over TCP (reference `rtp/` + pipeline_tests pattern:
PacketSender pushes RTP, OutputReceiver collects output RTP)."""

import socket
import struct
import threading
import time

import numpy as np
import pytest

from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
from smelter_tpu.core.types import Framerate, Resolution, RGBAColor
from smelter_tpu.io.codec import AudioEncoder, Codec, VideoDecoder, VideoEncoder
from smelter_tpu.io.rtp import (
    AccessUnit,
    H264Depayloader,
    H264Payloader,
    JitterBuffer,
    OpusDepayloader,
    OpusPayloader,
    RtpInputOptions,
    RtpInputSource,
    RtpOutputOptions,
    RtpOutputSink,
    RtpPacket,
    TimestampUnroller,
    _split_annexb,
)
from smelter_tpu.pipeline import (
    EndCondition,
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

from tests.test_pipeline import _decode_output


def test_rtp_packet_roundtrip():
    pkt = RtpPacket(
        payload_type=96, sequence_number=1234, timestamp=567890,
        ssrc=0xDEADBEEF, payload=b"hello", marker=True,
    )
    parsed = RtpPacket.parse(pkt.serialize())
    assert parsed is not None
    assert parsed.payload_type == 96
    assert parsed.sequence_number == 1234
    assert parsed.timestamp == 567890
    assert parsed.ssrc == 0xDEADBEEF
    assert parsed.payload == b"hello"
    assert parsed.marker


def test_rtp_packet_with_csrc_and_padding():
    # CC=2, two CSRCs, padding of 3
    hdr = struct.pack("!BBHII", 0x80 | 0x20 | 2, 96, 1, 1000, 42)
    csrcs = struct.pack("!II", 7, 8)
    payload = b"abcdef" + b"\x00\x00\x03"
    parsed = RtpPacket.parse(hdr + csrcs + payload)
    assert parsed is not None
    assert parsed.payload == b"abcdef"


def test_jitter_buffer_reorders():
    fake_now = [0.0]
    jb = JitterBuffer(window_s=0.05, clock=lambda: fake_now[0])

    def pkt(seq):
        return RtpPacket(96, seq, seq * 100, 1, bytes([seq]), marker=False)

    assert [p.sequence_number for p in jb.push(pkt(10))] == [10]
    assert jb.push(pkt(12)) == []            # gap: wait for 11
    out = jb.push(pkt(11))
    assert [p.sequence_number for p in out] == [11, 12]


def test_jitter_buffer_skips_after_window():
    fake_now = [0.0]
    jb = JitterBuffer(window_s=0.05, clock=lambda: fake_now[0])

    def pkt(seq):
        return RtpPacket(96, seq, 0, 1, b"x")

    jb.push(pkt(1))
    assert jb.push(pkt(3)) == []             # waiting for 2
    fake_now[0] = 0.1                        # window expired
    out = jb.push(pkt(4))
    assert [p.sequence_number for p in out] == [3, 4]
    # late 2 is dropped
    assert jb.push(pkt(2)) == []


def test_jitter_buffer_seq_rollover():
    jb = JitterBuffer(window_s=0.05)

    def pkt(seq):
        return RtpPacket(96, seq & 0xFFFF, 0, 1, b"x")

    out = []
    for seq in [65533, 65534, 65535, 0, 1, 2]:
        out += jb.push(pkt(seq))
    assert [p.sequence_number for p in out] == [65533, 65534, 65535, 0, 1, 2]


def test_timestamp_unroller():
    u = TimestampUnroller()
    near_max = (1 << 32) - 1000
    assert u.unroll(near_max) == near_max
    assert u.unroll(500) == (1 << 32) + 500


def _encode_test_frames(n=30, w=128, h=96, gop=10):
    enc = VideoEncoder(Codec.H264, w, h, 30, opts=f"global_header=0,g={gop}")
    y = np.zeros((h, w), np.uint8)
    u = np.full((h // 2, w // 2), 128, np.uint8)
    v = np.full((h // 2, w // 2), 128, np.uint8)
    pkts = []
    for i in range(n):
        y[:] = 30 + (i * 6) % 200
        enc.send(y, u, v, i / 30)
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
    return pkts


def test_h264_payload_depayload_roundtrip():
    pkts = _encode_test_frames()
    payloader = H264Payloader(ssrc=1, mtu=400)
    depayloader = H264Depayloader()
    aus = []
    for p in pkts:
        for rtp_pkt in payloader.payload(p.data, p.pts_s or 0.0):
            assert len(rtp_pkt.payload) <= 400
            aus += depayloader.push(rtp_pkt)
    assert len(aus) == len(pkts)
    # decode the depayloaded AnnexB AUs
    dec = VideoDecoder(Codec.H264)
    n = 0
    for au in aus:
        dec.send(au.data, au.pts_s)
        while True:
            f = dec.receive()
            if f is None or f == "eof":
                break
            n += 1
    dec.send_eof()
    while True:
        f = dec.receive()
        if f is None or f == "eof":
            break
        n += 1
    assert n == len(pkts)
    # keyframe AUs flagged
    assert aus[0].is_keyframe


def test_opus_payload_depayload_roundtrip():
    enc = AudioEncoder(Codec.OPUS, 48000, 2)
    t = np.arange(48000) / 48000.0
    pcm = np.stack([np.sin(2 * np.pi * 440 * t)] * 2, axis=1).astype(np.float32)
    enc.send(pcm, 0.0)
    enc.send_eof()
    pkts = []
    while True:
        p = enc.receive()
        if p is None or p == "eof":
            break
        pkts.append(p)
    payloader = OpusPayloader(ssrc=2)
    depayloader = OpusDepayloader()
    aus = []
    for p in pkts:
        for rtp_pkt in payloader.payload(p.data, p.pts_s or 0.0):
            aus += depayloader.push(rtp_pkt)
    assert len(aus) == len(pkts)
    assert abs(aus[-1].pts_s - (pkts[-1].pts_s or 0.0)) < 0.010  # opus preskip


def _tcp_send_rtp(port: int, packets, pace_s: float = 0.0):
    """PacketSender: stream framed RTP over TCP then close (EOS)."""
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    try:
        for pkt in packets:
            data = pkt.serialize()
            s.sendall(struct.pack("!H", len(data)) + data)
            if pace_s:
                time.sleep(pace_s)
    finally:
        s.close()


def test_rtp_input_pipeline_to_mp4(tmp_path):
    """RTP (TCP) h264+opus in → compose → MP4 out."""
    out_path = str(tmp_path / "out.mp4")

    pipeline = Pipeline(
        PipelineOptions(
            output_framerate=Framerate(30),
            ahead_of_time_processing=True,
            never_drop_output_frames=True,
        )
    )
    source = RtpInputSource(
        RtpInputOptions(transport="tcp_server", video_codec="h264", audio_codec="opus")
    )
    pipeline.register_input(
        "cam", source, RegisterInputOptions(required=True, offset=0.0)
    )
    pipeline.register_output(
        "out",
        Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(128, 96),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="cam")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(
                inputs=[AudioMixerInputConfig("cam")]
            ),
            end_condition=EndCondition(all_inputs=True),
        ),
    )

    # build the RTP stream: 1s video + 1s audio
    vpkts = _encode_test_frames(n=30)
    payloader = H264Payloader(ssrc=1, mtu=1200)
    rtp_stream = []
    for p in vpkts:
        rtp_stream += payloader.payload(p.data, p.pts_s or 0.0)
    aenc = AudioEncoder(Codec.OPUS, 48000, 2)
    t = np.arange(48000) / 48000.0
    pcm = np.stack([np.sin(2 * np.pi * 330 * t)] * 2, axis=1).astype(np.float32)
    aenc.send(pcm, 0.0)
    aenc.send_eof()
    apayloader = OpusPayloader(ssrc=2)
    while True:
        p = aenc.receive()
        if p is None or p == "eof":
            break
        rtp_stream += apayloader.payload(p.data, p.pts_s or 0.0)

    pipeline.start()
    sender = threading.Thread(
        target=_tcp_send_rtp, args=(source.port, rtp_stream), daemon=True
    )
    sender.start()
    pipeline.wait_for_outputs_done(timeout=240)
    pipeline.close()

    frames, audio, infos = _decode_output(out_path)
    assert len(frames) >= 25, len(frames)
    assert audio.shape[0] > 30000
    # gradient brightness should appear in output luma
    ys = [float(f[0].mean()) for f in frames]
    assert max(ys) - min(ys) > 50


def test_rtp_output_loopback(tmp_path):
    """MP4 in → RTP out (TCP server); client depayloads and decodes."""
    from tests.test_pipeline import _make_source_mp4
    from smelter_tpu.pipeline import Mp4Input, Mp4InputOptions

    src = str(tmp_path / "a.mp4")
    _make_source_mp4(src, "red", 440.0)

    pipeline = Pipeline(
        PipelineOptions(
            output_framerate=Framerate(30),
            ahead_of_time_processing=True,
            never_drop_output_frames=True,
        )
    )
    pipeline.register_input(
        "a", Mp4Input(Mp4InputOptions(path=src)),
        RegisterInputOptions(required=True, offset=0.0),
    )
    sink = RtpOutputSink(RtpOutputOptions(transport="tcp_server"))
    pipeline.register_output(
        "out",
        sink,
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(
                codec="h264", preset="ultrafast", ffmpeg_options="global_header=0"
            ),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="a")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="opus", sample_rate=48000),
            initial_mixer_config=AudioMixerConfig(inputs=[AudioMixerInputConfig("a")]),
            end_condition=EndCondition(all_inputs=True),
        ),
    )

    received = []

    def receiver():
        s = socket.create_connection(("127.0.0.1", sink.port), timeout=10)
        s.settimeout(1.0)
        buf = b""
        try:
            while True:
                try:
                    chunk = s.recv(65536)
                except socket.timeout:
                    continue
                if not chunk:
                    break
                buf += chunk
                while len(buf) >= 2:
                    size = struct.unpack("!H", buf[:2])[0]
                    if len(buf) < 2 + size:
                        break
                    pkt = RtpPacket.parse(buf[2 : 2 + size])
                    if pkt:
                        received.append(pkt)
                    buf = buf[2 + size :]
        finally:
            s.close()

    rt = threading.Thread(target=receiver, daemon=True)
    rt.start()
    pipeline.start()
    pipeline.wait_for_outputs_done(timeout=240)
    time.sleep(0.5)
    pipeline.close()
    rt.join(timeout=10)

    video_pkts = [p for p in received if p.payload_type == 96]
    audio_pkts = [p for p in received if p.payload_type == 111]
    assert len(video_pkts) >= 50
    assert len(audio_pkts) >= 80  # ~2s of 20ms opus frames

    dep = H264Depayloader()
    aus = []
    for p in video_pkts:
        aus += dep.push(p)
    assert len(aus) >= 55
    dec = VideoDecoder(Codec.H264)
    n = 0
    v_mean = []
    for au in aus:
        dec.send(au.data, au.pts_s)
        while True:
            f = dec.receive()
            if f is None or f == "eof":
                break
            v_mean.append(float(f[2].mean()))
            n += 1
    assert n >= 55
    # red content → V plane high
    assert np.mean(v_mean) > 180


def test_vp9_payload_depayload_roundtrip():
    from smelter_tpu.io.rtp import Vp9Depayloader, Vp9Payloader

    enc = VideoEncoder(Codec.VP9, 128, 96, 30)
    y = np.full((96, 128), 80, np.uint8)
    u = np.full((48, 64), 128, np.uint8)
    v = u.copy()
    pkts = []
    for i in range(10):
        y[:] = 40 + i * 15
        enc.send(y, u, v, i / 30)
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

    payloader = Vp9Payloader(ssrc=3, mtu=500)
    dep = Vp9Depayloader()
    aus = []
    for p in pkts:
        for rp in payloader.payload(p.data, p.pts_s or 0.0, keyframe=p.is_keyframe):
            aus += dep.push(rp)
    assert len(aus) == len(pkts)
    assert aus[0].is_keyframe

    dec = VideoDecoder(Codec.VP9)
    n = 0
    for au in aus:
        dec.send(au.data, au.pts_s)
        while True:
            f = dec.receive()
            if f in (None, "eof"):
                break
            n += 1
    dec.send_eof()
    while True:
        f = dec.receive()
        if f in (None, "eof"):
            break
        n += 1
    assert n == len(pkts)


def test_aac_payload_depayload_roundtrip():
    from smelter_tpu.io.codec import AudioDecoder
    from smelter_tpu.io.rtp import AacDepayloader, AacPayloader

    enc = AudioEncoder(Codec.AAC, 48000, 2)
    t = np.arange(48000) / 48000.0
    pcm = np.stack([np.sin(2 * np.pi * 440 * t)] * 2, axis=1).astype(np.float32)
    enc.send(pcm, 0.0)
    enc.send_eof()
    pkts = []
    while True:
        p = enc.receive()
        if p in (None, "eof"):
            break
        pkts.append(p)

    payloader = AacPayloader(ssrc=4, payload_type=97, clock_rate=48000)
    dep = AacDepayloader(clock_rate=48000)
    aus = []
    for p in pkts:
        for rp in payloader.payload(p.data, p.pts_s or 0.0):
            aus += dep.push(rp)
    assert len(aus) == len(pkts)

    dec = AudioDecoder(Codec.AAC, 48000, 2, extradata=enc.extradata())
    total = 0
    for au in aus:
        dec.send(au.data, au.pts_s)
        while True:
            s = dec.receive()
            if s in (None, "eof"):
                break
            total += s[0].shape[0]
    assert total > 40000


def test_adaptive_jitter_buffer_tracks_jitter():
    fake_now = [0.0]
    jb = JitterBuffer(adaptive=True, clock=lambda: fake_now[0],
                      min_window_s=0.005, max_window_s=0.5)

    def pkt(seq, ts):
        return RtpPacket(96, seq, ts, 1, b"x")

    # perfectly paced 30 fps arrivals → jitter ~0 → window shrinks to min
    for i in range(40):
        fake_now[0] = i / 30.0
        jb.push(pkt(i, int(i * 3000)))
    assert jb.window == pytest.approx(0.005, abs=1e-6)

    # bursty arrivals (±25 ms) → window grows
    import random

    rng = random.Random(7)
    for i in range(40, 120):
        fake_now[0] = i / 30.0 + rng.uniform(0, 0.05)
        jb.push(pkt(i, int(i * 3000)))
    assert jb.window > 0.02, jb.window
    assert jb.window <= 0.5


def test_av1_obu_split_and_size_fields():
    """OBU helpers: low-overhead stream split, size-field strip/re-add."""
    from smelter_tpu.io.rtp import (
        _leb128_encode,
        _leb128_read,
        _obu_add_size,
        _obu_strip_size,
        split_obus,
    )

    for n in (0, 1, 127, 128, 300, 2**20):
        enc = _leb128_encode(n)
        val, pos = _leb128_read(enc, 0)
        assert val == n and pos == len(enc)

    def obu(otype, payload, ext=False):
        hdr = bytes([(otype << 3) | (0x04 if ext else 0) | 0x02])
        if ext:
            hdr += b"\x08"
        from smelter_tpu.io.rtp import _leb128_encode as le
        return hdr + le(len(payload)) + payload

    td = obu(2, b"")                    # temporal delimiter
    seq = obu(1, b"\x01\x02\x03")       # sequence header
    frame = obu(6, bytes(range(200)), ext=True)
    stream = td + seq + frame
    parts = split_obus(stream)
    assert parts == [td, seq, frame]
    for p in parts:
        stripped = _obu_strip_size(p)
        assert not (stripped[0] & 0x02)
        assert _obu_add_size(stripped) == p


def test_av1_payload_depayload_roundtrip():
    """Real AV1: encode -> av1-rtp-spec packets (with fragmentation) ->
    depayload -> decode. Beyond-reference (smelter RTP stops at VP9)."""
    from smelter_tpu.io.rtp import Av1Depayloader, Av1Payloader

    enc = VideoEncoder(Codec.AV1, 128, 96, 30)
    rng = np.random.RandomState(0)
    u = np.full((48, 64), 128, np.uint8)
    v = u.copy()
    pkts = []
    for i in range(8):
        # noise keeps frames large enough to force fragmentation at mtu=300
        y = rng.randint(0, 255, (96, 128), dtype=np.uint8)
        enc.send(y, u, v, i / 30)
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
    assert pkts, "AV1 encoder produced nothing"

    payloader = Av1Payloader(ssrc=9, mtu=300)
    dep = Av1Depayloader()
    aus = []
    n_rtp = 0
    for p in pkts:
        for rp in payloader.payload(p.data, p.pts_s or 0.0, keyframe=p.is_keyframe):
            assert len(rp.payload) <= 300
            n_rtp += 1
            aus += dep.push(rp)
    assert len(aus) == len(pkts)
    assert n_rtp > len(pkts), "mtu=300 should have fragmented"
    assert aus[0].is_keyframe

    dec = VideoDecoder(Codec.AV1)
    n = 0
    for au in aus:
        dec.send(au.data, au.pts_s)
        while True:
            f = dec.receive()
            if f in (None, "eof"):
                break
            n += 1
    dec.send_eof()
    while True:
        f = dec.receive()
        if f in (None, "eof"):
            break
        n += 1
    assert n == len(pkts)


def test_rtp_input_survives_garbage_datagrams():
    """RTP rides unauthenticated UDP: random noise, truncated packets, and
    valid RTP headers with garbage codec payloads sprayed at the input port
    must not kill the receive thread — a valid stream decodes afterwards."""
    import random as _random
    import socket as _socket

    from smelter_tpu.pipeline.input import InputCtx
    from smelter_tpu.utils.channels import Channel

    source = RtpInputSource(
        RtpInputOptions(transport="udp", video_codec="h264")
    )
    vch = Channel(256)
    ctx = InputCtx(input_id="fz", video_channel=vch, audio_channel=None)
    source.start(ctx)
    try:
        rng = _random.Random(5)
        atk = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        dest = ("127.0.0.1", source.port)
        for i in range(300):
            kind = i % 3
            if kind == 0:   # pure noise
                atk.sendto(bytes(rng.randrange(256)
                                 for _ in range(rng.randrange(1, 64))), dest)
            elif kind == 1:  # valid RTP header (pt 96 = h264), garbage payload
                pkt = RtpPacket(
                    payload_type=96, sequence_number=rng.randrange(65536),
                    timestamp=rng.randrange(2**32), ssrc=7,
                    payload=bytes(rng.randrange(256)
                                  for _ in range(rng.randrange(0, 48))),
                    marker=bool(rng.randrange(2)),
                )
                atk.sendto(pkt.serialize(), dest)
            else:            # truncated RTP header
                atk.sendto(b"\x80\x60" + bytes(rng.randrange(256)
                           for _ in range(rng.randrange(0, 10))), dest)
        # now a real stream must still decode end-to-end (the jitter
        # buffer's RFC 3550-style resync gives up to ~10 packets to the
        # late-streak detector when garbage inflated its rollover state,
        # so send comfortably more than that)
        vpkts = _encode_test_frames(n=30)
        payloader = H264Payloader(ssrc=1, mtu=1200)
        time.sleep(0.3)
        for p in vpkts:
            for rp in payloader.payload(p.data, p.pts_s or 0.0):
                atk.sendto(rp.serialize(), dest)
            time.sleep(0.005)
        atk.close()
        got = 0
        deadline = time.time() + 30
        while time.time() < deadline and got < 15:
            try:
                vch.recv(timeout=1)
                got += 1
            except TimeoutError:
                continue
        assert got >= 15, f"only {got} frames decoded after garbage spray"
    finally:
        source.stop()


def test_rtp_input_av_sync_from_sender_reports():
    """End-to-end A/V alignment through a live RTP input: video starts
    0.5 s after audio in sender time; without SRs both tracks rebase to
    local zero (skew collapsed), with SRs the video frames shift +0.5 s
    relative to audio (rtcp_sync.rs semantics, snap path since 0.5 > 0.3)."""
    import socket as _socket

    from smelter_tpu.io import rtcp as rtcp_mod
    from smelter_tpu.pipeline.input import InputCtx
    from smelter_tpu.utils.channels import Channel

    source = RtpInputSource(RtpInputOptions(
        transport="udp", video_codec="h264", audio_codec="opus",
    ))
    vch = Channel(256)
    ach = Channel(512)
    ctx = InputCtx(input_id="av", video_channel=vch, audio_channel=ach)
    source.start(ctx)
    try:
        sock = _socket.socket(_socket.AF_INET, _socket.SOCK_DGRAM)
        dest = ("127.0.0.1", source.port)
        t0_ntp = (3_900_000_000, 0)

        # SRs first so the correction applies from the first AU:
        # audio rtp_ts 0 at NTP t0; video rtp_ts 0 at NTP t0 + 0.5s
        sock.sendto(rtcp_mod.build_sender_report(rtcp_mod.SenderReport(
            2, t0_ntp[0], 0, 0, 0, 0)), dest)
        sock.sendto(rtcp_mod.build_sender_report(rtcp_mod.SenderReport(
            1, t0_ntp[0], 1 << 31, 0, 0, 0)), dest)
        time.sleep(0.2)

        # audio: 10 opus-ish packets from rtp_ts 0 (20 ms apart)
        apay = OpusPayloader(ssrc=2)
        for i in range(10):
            for rp in apay.payload(b"\x01\x02\x03", i * 0.020):
                sock.sendto(rp.serialize(), dest)
        # video: encoded frames whose rtp timestamps START at ts 0 too
        vpkts = _encode_test_frames(n=6)
        vpay = H264Payloader(ssrc=1, mtu=1200)
        for p in vpkts:
            for rp in vpay.payload(p.data, p.pts_s or 0.0):
                sock.sendto(rp.serialize(), dest)
            time.sleep(0.005)
        sock.close()

        frames, samples = [], []
        deadline = time.time() + 20
        while time.time() < deadline and (len(frames) < 4 or len(samples) < 6):
            try:
                frames.append(vch.recv(timeout=0.5))
            except TimeoutError:
                pass
            try:
                samples.append(ach.recv(timeout=0.5))
            except TimeoutError:
                pass
        assert len(frames) >= 4 and len(samples) >= 6, (len(frames), len(samples))
        # first audio pts ~0 (its SR maps its first ts to the base NTP);
        # first video pts ~0.5 (started half a second later in NTP terms)
        assert samples[0].start_pts == pytest.approx(0.0, abs=0.02)
        assert frames[0].pts == pytest.approx(0.5, abs=0.02), frames[0].pts
    finally:
        source.stop()


def test_rtp_push_input_before_start(tmp_path):
    """Packets delivered BEFORE /start must be buffered and composed from
    pts 0 when the input has an explicit offset (reference
    push_input_before_start_tcp: the pre-start dump plays back fully)."""
    out_path = str(tmp_path / "out.mp4")

    pipeline = Pipeline(
        PipelineOptions(
            output_framerate=Framerate(30),
            ahead_of_time_processing=True,
            never_drop_output_frames=True,
        )
    )
    source = RtpInputSource(
        RtpInputOptions(transport="tcp_server", video_codec="h264")
    )
    pipeline.register_input(
        "cam", source, RegisterInputOptions(required=True, offset=0.0)
    )
    pipeline.register_output(
        "out",
        Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(128, 96),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="cam")),
            end_condition=EndCondition(all_inputs=True),
        ),
    )

    vpkts = _encode_test_frames(n=30)
    payloader = H264Payloader(ssrc=1, mtu=1200)
    rtp_stream = []
    for p in vpkts:
        rtp_stream += payloader.payload(p.data, p.pts_s or 0.0)

    # push the ENTIRE stream before start, then give the decode thread a
    # moment to buffer it
    _tcp_send_rtp(source.port, rtp_stream)
    time.sleep(1.0)
    pipeline.start()
    pipeline.wait_for_outputs_done(timeout=240)
    pipeline.close()

    from smelter_tpu.io.codec import Demuxer, VideoDecoder

    d = Demuxer(out_path)
    info = {s.media_type: s for s in d.streams()}["video"]
    vdec = VideoDecoder(info.codec, info.extradata)
    frames = []
    while True:
        pkt = d.read()
        if pkt is None:
            break
        vdec.send(pkt.data, pkt.pts_s or 0.0)
        while True:
            f = vdec.receive()
            if f is None or f == "eof":
                break
            frames.append(f)
    # the full 1 s clip plays from pts 0 — nothing pre-start is dropped
    assert len(frames) >= 25, len(frames)
    ys = [float(f[0].mean()) for f in frames]
    assert max(ys) - min(ys) > 50
