"""RTMP stack tests: AMF0, chunking, and full protocol interop.

The interop test uses libavformat's own RTMP client (via the native Muxer
writing to an rtmp:// URL) publishing into OUR from-scratch RTMP server —
a real third-party handshake/connect/publish exchange, the same way the
reference validates its from-scratch `rtmp` crate against real encoders.
"""

import struct
import threading
import time

import numpy as np
import pytest

from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
from smelter_tpu.core.types import Framerate, Resolution
from smelter_tpu.io.codec import AudioEncoder, Codec, Muxer, VideoEncoder
from smelter_tpu.io.rtmp import amf0
from smelter_tpu.io.rtmp.chunk import ChunkReader, ChunkWriter, RtmpMessage
from smelter_tpu.io.rtmp.h264_utils import (
    annexb_to_avcc,
    avcc_to_annexb,
    build_avcc_record,
    extract_parameter_sets,
    parse_avcc_record,
    split_annexb,
)
from smelter_tpu.io.rtmp.session import (
    RtmpClientOutput,
    RtmpInputOptions,
    RtmpServerInput,
)
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

from tests.test_pipeline import _decode_output, _make_source_mp4


def test_amf0_roundtrip():
    values = [
        1.5,
        True,
        "hello",
        None,
        {"app": "live", "nested": {"x": 2.0}, "flag": False},
        [1.0, "two", None],
    ]
    encoded = amf0.encode_all(*values)
    decoded = amf0.decode_all(encoded)
    assert decoded == [1.5, True, "hello", None,
                       {"app": "live", "nested": {"x": 2.0}, "flag": False},
                       [1.0, "two", None]]


def test_amf0_connect_command():
    payload = amf0.encode_all(
        "connect", 1.0, {"app": "live", "tcUrl": "rtmp://h/live"}
    )
    vals = amf0.decode_all(payload)
    assert vals[0] == "connect" and vals[1] == 1.0
    assert vals[2]["app"] == "live"


def test_chunk_roundtrip_large_payload():
    writer = ChunkWriter(chunk_size=128)
    reader = ChunkReader()
    payload = bytes(range(256)) * 40  # 10240 bytes, many continuation chunks
    msg = RtmpMessage(9, 123456, 1, payload, chunk_stream_id=4)
    out = reader.feed(writer.serialize(msg))
    assert len(out) == 1
    got = out[0]
    assert got.payload == payload
    assert got.timestamp == 123456
    assert got.message_type == 9
    assert got.stream_id == 1


def test_chunk_reader_handles_interleaved_and_partial():
    writer = ChunkWriter(chunk_size=64)
    reader = ChunkReader()
    # negotiate the writer's chunk size first (as the protocol requires)
    stream = writer.serialize(writer.set_chunk_size_message(64))
    m1 = RtmpMessage(9, 10, 1, b"v" * 200, chunk_stream_id=4)
    m2 = RtmpMessage(8, 12, 1, b"a" * 50, chunk_stream_id=5)
    stream += writer.serialize(m1) + writer.serialize(m2)
    got = []
    for i in range(0, len(stream), 7):  # drip-feed in 7-byte pieces
        got += reader.feed(stream[i : i + 7])
    assert [m.message_type for m in got] == [1, 9, 8]
    got = got[1:]
    assert got[0].payload == b"v" * 200
    assert got[1].payload == b"a" * 50


def test_chunk_size_negotiation():
    writer = ChunkWriter(chunk_size=128)
    reader = ChunkReader()
    reader.feed(writer.serialize(writer.set_chunk_size_message(4096)))
    assert reader.chunk_size == 4096
    writer.chunk_size = 4096
    payload = b"x" * 3000
    out = reader.feed(writer.serialize(RtmpMessage(9, 0, 1, payload)))
    assert out and out[-1].payload == payload


def test_annexb_avcc_roundtrip():
    enc = VideoEncoder(Codec.H264, 128, 96, 30, opts="global_header=0")
    y = np.full((96, 128), 90, np.uint8)
    u = np.full((48, 64), 128, np.uint8)
    v = u.copy()
    enc.send(y, u, v, 0.0)
    enc.send_eof()
    pkt = enc.receive()
    assert pkt not in (None, "eof")
    sps, pps = extract_parameter_sets(pkt.data)
    assert sps is not None and pps is not None
    record = build_avcc_record(sps, pps)
    sps_l, pps_l, nsize = parse_avcc_record(record)
    assert sps_l[0] == sps and pps_l[0] == pps and nsize == 4
    avcc = annexb_to_avcc(pkt.data)
    back = avcc_to_annexb(avcc)
    assert split_annexb(back) == split_annexb(pkt.data)


def _wait_done(pipeline, output_id, timeout):
    deadline = time.time() + timeout
    while time.time() < deadline:
        kinds = {(e.kind, e.entity_id) for e in pipeline.events.history()}
        if ("OUTPUT_DONE", output_id) in kinds:
            return True
        time.sleep(0.2)
    return False


def test_ffmpeg_client_publishes_to_our_server(tmp_path):
    """libavformat RTMP client → our RTMP server → compose → MP4."""
    out_path = str(tmp_path / "out.mp4")
    pipeline = Pipeline(
        PipelineOptions(
            output_framerate=Framerate(30),
            ahead_of_time_processing=True,
            never_drop_output_frames=True,
        )
    )
    source = RtmpServerInput(RtmpInputOptions())
    pipeline.register_input(
        "live", source, RegisterInputOptions(required=True, offset=0.0)
    )
    pipeline.register_output(
        "out",
        Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(160, 120),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="live")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(inputs=[AudioMixerInputConfig("live")]),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    pipeline.start()

    def publish():
        # FFmpeg's RTMP client publishing 1s of video+audio
        venc = VideoEncoder(Codec.H264, 160, 120, 30)
        aenc = AudioEncoder(Codec.AAC, 44100, 2)
        mux = Muxer(f"rtmp://127.0.0.1:{source.port}/live/test", format="flv")
        vs = mux.add_video(Codec.H264, 160, 120, 30, 1, venc.extradata())
        y = np.zeros((120, 160), np.uint8)
        u = np.full((60, 80), 128, np.uint8)
        v = np.full((60, 80), 200, np.uint8)
        vpkts = []
        for i in range(30):
            y[:] = 40 + i * 6
            venc.send(y, u, v, i / 30)
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
        t = np.arange(44100) / 44100.0
        pcm = np.stack([np.sin(2 * np.pi * 440 * t)] * 2, axis=1).astype(np.float32)
        aenc.send(pcm, 0.0)
        aenc.send_eof()
        apkts = []
        while True:
            p = aenc.receive()
            if p is None or p == "eof":
                break
            apkts.append(p)
        as_ = mux.add_audio(Codec.AAC, 44100, 2, aenc.extradata())
        mux.write_header()
        for p in vpkts:
            mux.write(vs, p.data, p.pts_s, p.dts_s, p.is_keyframe)
        for p in apkts:
            mux.write(as_, p.data, p.pts_s, p.dts_s, p.is_keyframe)
        mux.close()  # TCP close → EOS

    pub = threading.Thread(target=publish, daemon=True)
    pub.start()
    assert _wait_done(pipeline, "out", 120), "OUTPUT_DONE not observed"
    pipeline.close()
    pub.join(timeout=10)

    frames, audio, infos = _decode_output(out_path)
    assert len(frames) >= 25, len(frames)
    assert audio.shape[0] > 30000
    # gradient brightness + V=200 (pink-ish) content made it through
    ys = [float(f[0].mean()) for f in frames]
    assert max(ys) - min(ys) > 50
    assert float(np.mean([float(f[2].mean()) for f in frames])) > 170


def test_rtmp_loopback_our_client_to_our_server(tmp_path):
    """Our RTMP client output → our RTMP server input (pipeline to pipeline)."""
    src = str(tmp_path / "src.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "out.mp4")

    # receiving pipeline with RTMP server input
    rx = Pipeline(
        PipelineOptions(
            output_framerate=Framerate(30),
            ahead_of_time_processing=True,
            never_drop_output_frames=True,
        )
    )
    server = RtmpServerInput(RtmpInputOptions())
    rx.register_input("in", server, RegisterInputOptions(required=True, offset=0.0))
    rx.register_output(
        "out",
        Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="in")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(inputs=[AudioMixerInputConfig("in")]),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    rx.start()

    # sending pipeline: MP4 → RTMP client publish
    tx = Pipeline(
        PipelineOptions(
            output_framerate=Framerate(30),
            ahead_of_time_processing=True,
            never_drop_output_frames=True,
        )
    )
    tx.register_input(
        "a", Mp4Input(Mp4InputOptions(path=src)),
        RegisterInputOptions(required=True, offset=0.0),
    )
    sink = RtmpClientOutput(f"rtmp://127.0.0.1:{server.port}/live/key")
    tx.register_output(
        "rtmp",
        sink,
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="a")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(inputs=[AudioMixerInputConfig("a")]),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    tx.start()
    assert _wait_done(tx, "rtmp", 120), "tx OUTPUT_DONE not observed"
    assert _wait_done(rx, "out", 120), "rx OUTPUT_DONE not observed"
    tx.close()
    rx.close()

    frames, audio, infos = _decode_output(out_path)
    assert len(frames) >= 50, len(frames)
    assert audio.shape[0] > 60000
    # red content → high V plane
    assert float(np.mean([float(f[2].mean()) for f in frames])) > 180


# ---------------------------------------------------------------------------
# AMF3 + RTMPS
# ---------------------------------------------------------------------------


def test_amf3_roundtrip():
    from smelter_tpu.io.rtmp import amf3

    values = [
        None,
        True,
        False,
        42,
        -7,
        1 << 20,
        3.5,
        "hello",
        "",
        b"\x00\x01\x02",
        [1, 2.5, "x"],
        {"a": 1, "b": [True, None], "nested": {"k": "v"}},
    ]
    data = amf3.encode_all(*values)
    decoded = amf3.decode_all(data)
    assert decoded == values


def test_amf3_string_references_decode():
    from smelter_tpu.io.rtmp import amf3

    # two identical strings: second may arrive by reference from real encoders
    body = amf3.encode("dup")  # inline "dup" -> enters the reference table
    ref = bytes([amf3.STRING]) + bytes([0x00])  # reference #0
    vals = amf3.decode_all(body + ref)
    assert vals == ["dup", "dup"]


def test_amf3_u29_boundaries():
    from smelter_tpu.io.rtmp import amf3

    for v in (0, 127, 128, 16383, 16384, 0x1FFFFF, 0x200000, 0x0FFFFFFF, -1,
              -0x10000000):
        assert amf3.decode_all(amf3.encode(v)) == [v]


def test_amf3_command_message_both_framings():
    from smelter_tpu.io.rtmp import amf3
    from smelter_tpu.io.rtmp.chunk import COMMAND_AMF3
    from smelter_tpu.io.rtmp.session import decode_command_message

    # real-world framing: leading 0x00 format byte, then AMF0 values
    body = b"\x00" + amf0.encode_all("connect", 1.0, {"app": "live",
                                                      "objectEncoding": 3.0})
    msg = RtmpMessage(COMMAND_AMF3, 0, 0, body)
    vals = decode_command_message(msg)
    assert vals[0] == "connect" and vals[2]["objectEncoding"] == 3.0

    # pure AMF3 framing
    body2 = amf3.encode_all("publish", 5, None, "key")
    msg2 = RtmpMessage(COMMAND_AMF3, 0, 0, body2)
    assert decode_command_message(msg2)[0] == "publish"


def test_amf0_avmplus_escape_decodes_amf3():
    from smelter_tpu.io.rtmp import amf3

    data = amf0.encode("before") + bytes([amf0.AVMPLUS]) + amf3.encode(
        {"x": 1}
    ) + amf0.encode(2.0)
    assert amf0.decode_all(data) == ["before", {"x": 1}, 2.0]


def test_rtmps_loopback_tls(tmp_path):
    """RTMPS client output → TLS-wrapped RTMP server input (self-signed)."""
    src = str(tmp_path / "src.mp4")
    _make_source_mp4(src, "blue", 440.0)
    out_path = str(tmp_path / "out.mp4")

    rx = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    server = RtmpServerInput(RtmpInputOptions(tls=True))
    rx.register_input("in", server, RegisterInputOptions(required=True, offset=0.0))
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
            initial_mixer_config=AudioMixerConfig(inputs=[AudioMixerInputConfig("in")]),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    rx.start()

    tx = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    tx.register_input(
        "a", Mp4Input(Mp4InputOptions(path=src)),
        RegisterInputOptions(required=True, offset=0.0),
    )
    sink = RtmpClientOutput(
        f"rtmps://127.0.0.1:{server.port}/live/key", tls_verify=False
    )
    tx.register_output(
        "rtmp", sink,
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="a")),
            end_condition=EndCondition(all_inputs=True),
        ),
        audio=OutputAudioOptions(
            encoder=AudioEncoderOptions(codec="aac"),
            initial_mixer_config=AudioMixerConfig(inputs=[AudioMixerInputConfig("a")]),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    tx.start()
    assert _wait_done(tx, "rtmp", 120), "tx OUTPUT_DONE not observed"
    assert _wait_done(rx, "out", 120), "rx OUTPUT_DONE not observed"
    tx.close()
    rx.close()

    frames, _audio, _infos = _decode_output(out_path)
    assert len(frames) >= 40, len(frames)
    # blue content → high U plane
    assert float(np.mean([float(f[1].mean()) for f in frames])) > 180


def test_rtmp_client_rejects_unknown_scheme():
    with pytest.raises(ValueError):
        RtmpClientOutput("http://example/live/x")


# ---------------------------------------------------------------------------
# enhanced-RTMP (hvc1 FourCC)
# ---------------------------------------------------------------------------


def test_parse_video_tag_enhanced_variants():
    from smelter_tpu.io.rtmp.session import parse_video_tag

    # hvc1 SequenceStart (keyframe, ex-header bit set, packet_type=0)
    tag = parse_video_tag(bytes([0x90]) + b"hvc1" + b"\x01\x02")
    assert tag == ("hevc_header", True, 0, b"\x01\x02")
    # hvc1 CodedFrames with CTS
    tag = parse_video_tag(bytes([0x91]) + b"hvc1" + b"\x00\x00\x21" + b"DATA")
    assert tag == ("hevc_frame", True, 0x21, b"DATA")
    # av01 CodedFramesX (inter frame)
    tag = parse_video_tag(bytes([0xA3]) + b"av01" + b"OBUS")
    assert tag == ("av1_frame", False, 0, b"OBUS")
    # unknown FourCC
    tag = parse_video_tag(bytes([0x90]) + b"xxxx" + b"zz")
    assert tag[0] == "other"


def test_build_hvcc_record_from_x265_extradata():
    from smelter_tpu.io.codec import Codec, VideoEncoder
    from smelter_tpu.io.rtmp.hevc_utils import build_hvcc_record

    enc = VideoEncoder(Codec.H265, 128, 96, 30)
    rec = build_hvcc_record(enc.extradata())
    enc.close()
    assert rec[0] == 1                      # configurationVersion
    assert (rec[21] & 0x03) == 3            # 4-byte NALU lengths
    assert rec[22] == 3                     # VPS + SPS + PPS arrays


def test_enhanced_rtmp_hevc_publish_end_to_end(tmp_path):
    """Raw enhanced-RTMP publisher (hvc1 tags) → our server → decode →
    compose → MP4. Exercises hvcC config + length-prefixed coded frames."""
    import socket

    from smelter_tpu.io.codec import Codec, VideoEncoder
    from smelter_tpu.io.rtmp.chunk import VIDEO as MSG_VIDEO
    from smelter_tpu.io.rtmp.hevc_utils import build_hvcc_record
    from smelter_tpu.io.rtmp.session import (
        RtmpInputOptions,
        RtmpServerInput,
        _client_handshake,
        decode_command_message,
    )
    from smelter_tpu.io.rtmp.chunk import COMMAND_AMF0, COMMAND_AMF3

    out_path = str(tmp_path / "out.mp4")
    rx = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    server = RtmpServerInput(RtmpInputOptions())
    rx.register_input("in", server, RegisterInputOptions(required=True, offset=0.0))
    rx.register_output(
        "out", Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="in")),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    rx.start()

    # --- minimal publisher ---------------------------------------------------
    conn = socket.create_connection(("127.0.0.1", server.port), timeout=10)
    _client_handshake(conn)
    writer = ChunkWriter(chunk_size=4096)
    reader = ChunkReader()
    conn.sendall(writer.serialize(writer.set_chunk_size_message(4096)))

    def send_cmd(payload, stream_id=0):
        conn.sendall(writer.serialize(
            RtmpMessage(20, 0, stream_id, payload, chunk_stream_id=3)))

    def wait_reply(pred):
        deadline = time.time() + 10
        while time.time() < deadline:
            data = conn.recv(65536)
            if not data:
                raise ConnectionError("closed")
            for msg in reader.feed(data):
                if msg.message_type in (COMMAND_AMF0, COMMAND_AMF3):
                    vals = decode_command_message(msg)
                    if pred(vals):
                        return vals
        raise TimeoutError

    send_cmd(amf0.encode_all("connect", 1.0, {"app": "live", "tcUrl": "rtmp://x/live"}))
    wait_reply(lambda v: v and v[0] == "_result")
    send_cmd(amf0.encode_all("createStream", 2.0, None))
    wait_reply(lambda v: v and v[0] == "_result")
    send_cmd(amf0.encode_all("publish", 3.0, None, "key", "live"))
    wait_reply(lambda v: v and v[0] == "onStatus")

    # HEVC content: solid green frames
    W2, H2 = 128, 96
    enc = VideoEncoder(Codec.H265, W2, H2, 30)
    hvcc = build_hvcc_record(enc.extradata())
    conn.sendall(writer.serialize(RtmpMessage(
        MSG_VIDEO, 0, 1, bytes([0x90]) + b"hvc1" + hvcc, chunk_stream_id=4)))
    y = np.full((H2, W2), 145, np.uint8)      # green-ish in YUV
    u = np.full((H2 // 2, W2 // 2), 54, np.uint8)
    v = np.full((H2 // 2, W2 // 2), 34, np.uint8)
    n_frames = 45
    pkts = []
    for i in range(n_frames):
        enc.send(y, u, v, pts_s=i / 30)
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
    enc.close()
    assert len(pkts) == n_frames
    for p in pkts:
        body = annexb_to_avcc(p.data)
        first = bytes([0x91 if p.is_keyframe else 0xA1])
        tag = first + b"hvc1" + b"\x00\x00\x00" + body
        conn.sendall(writer.serialize(RtmpMessage(
            MSG_VIDEO, int((p.pts_s or 0) * 1000), 1, tag, chunk_stream_id=4)))
    send_cmd(amf0.encode_all("deleteStream", 4.0, None, 1.0))
    conn.close()

    assert _wait_done(rx, "out", 120), "rx OUTPUT_DONE not observed"
    rx.close()
    from smelter_tpu.io.codec import Demuxer, VideoDecoder as _VD
    d = Demuxer(out_path)
    vs = [s for s in d.streams() if s.media_type == "video"][0]
    dec = _VD(vs.codec, vs.extradata)
    frames = []
    while True:
        pkt = d.read()
        if pkt is None:
            break
        if pkt.stream_index != vs.index:
            continue
        dec.send(pkt.data, pkt.pts_s or 0.0)
        while True:
            f = dec.receive()
            if f is None or f == "eof":
                break
            frames.append(f)
    dec.send_eof()
    while True:
        f = dec.receive()
        if f is None or f == "eof":
            break
        frames.append(f)
    assert len(frames) >= 30, len(frames)
    # green content → low U, low V
    assert float(np.mean([float(f[1].mean()) for f in frames])) < 80
    assert float(np.mean([float(f[2].mean()) for f in frames])) < 80


def test_ex_video_tag_roundtrips_through_parser():
    from smelter_tpu.io.rtmp.session import (
        build_vpcc_record,
        ex_video_tag,
        extract_av1_sequence_header,
        parse_video_tag,
    )

    # hvc1 CodedFrames with CTS
    tag = ex_video_tag(b"hvc1", b"\x00\x00\x00\x02ab", True, 1, cts_ms=40)
    kind, key, cts, body = parse_video_tag(tag)
    assert (kind, key, cts, body) == ("hevc_frame", True, 40, b"\x00\x00\x00\x02ab")
    # av01 CodedFramesX (no CTS)
    tag = ex_video_tag(b"av01", b"\x12\x00", False, 3)
    kind, key, cts, body = parse_video_tag(tag)
    assert (kind, key, cts, body) == ("av1_frame", False, 0, b"\x12\x00")
    # vp09 SequenceStart carries a vpcC record
    rec = build_vpcc_record()
    tag = ex_video_tag(b"vp09", rec, True, 0)
    kind, key, cts, body = parse_video_tag(tag)
    assert (kind, body) == ("vp9_header", rec)
    # AV1 seq-header OBU extraction: temporal delimiter then seq header
    data = bytes([0x12, 0x00]) + bytes([0x0A, 0x03, 1, 2, 3]) + bytes([0x32, 0x01, 0xFF])
    assert extract_av1_sequence_header(data) == bytes([0x0A, 0x03, 1, 2, 3])


@pytest.mark.parametrize("codec,fourcc_kind", [("h265", "hevc"), ("vp9", "vp9")])
def test_enhanced_rtmp_client_publish_loopback(tmp_path, codec, fourcc_kind):
    """OUR client output publishing enhanced-RTMP (FourCC ExVideo tags,
    reference rtmp/src/flv/) → OUR server input → decode → MP4."""
    from smelter_tpu.pipeline.input import Mp4Input, Mp4InputOptions
    from tests.test_pipeline import _make_source_mp4

    src = str(tmp_path / "src.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "out.mp4")

    rx = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    server = RtmpServerInput(RtmpInputOptions())
    rx.register_input("in", server, RegisterInputOptions(required=True, offset=0.0))
    rx.register_output(
        "out", Mp4OutputSink(out_path),
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(codec="h264", preset="ultrafast"),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="in")),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    rx.start()

    tx = Pipeline(PipelineOptions(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
    ))
    tx.register_input(
        "a", Mp4Input(Mp4InputOptions(path=src)),
        RegisterInputOptions(required=True, offset=0.0),
    )
    sink = RtmpClientOutput(f"rtmp://127.0.0.1:{server.port}/live/key")
    tx.register_output(
        "rtmp", sink,
        video=OutputVideoOptions(
            resolution=Resolution(320, 240),
            encoder=VideoEncoderOptions(codec=codec),
            initial_root=comp.Rescaler(child=comp.InputStream(input_id="a")),
            end_condition=EndCondition(all_inputs=True),
        ),
    )
    tx.start()
    assert _wait_done(tx, "rtmp", 180), "tx OUTPUT_DONE not observed"
    assert _wait_done(rx, "out", 180), "rx OUTPUT_DONE not observed"
    tx.close()
    rx.close()

    from smelter_tpu.io.codec import Demuxer, VideoDecoder

    d = Demuxer(out_path)
    vinfo = next(s for s in d.streams() if s.media_type == "video")
    vdec = VideoDecoder(vinfo.codec, vinfo.extradata)
    frames = []

    def _pump():
        while True:
            f = vdec.receive()
            if f is None or f == "eof":
                return
            frames.append(f)

    while True:
        pkt = d.read()
        if pkt is None:
            break
        if pkt.stream_index == vinfo.index:
            vdec.send(pkt.data, pkt.pts_s or 0.0)
            _pump()
    vdec.send_eof()
    _pump()
    d.close()
    vdec.close()
    assert len(frames) >= 40, len(frames)
    # red content survives the h265/vp9 → h264 transcode: high V plane
    assert float(np.mean([float(f[2].mean()) for f in frames])) > 170


def test_rtmp_input_survives_garbage_connections(tmp_path):
    """A port scanner / wrong-protocol client connecting to a registered
    RTMP input must not kill it — a real publisher afterwards still
    works (the old code closed the input's channels on first handshake
    failure)."""
    import socket as _socket

    from smelter_tpu.io.rtmp import RtmpInputOptions, RtmpServerInput
    from smelter_tpu.pipeline.input import InputCtx
    from smelter_tpu.utils.channels import Channel

    source = RtmpServerInput(RtmpInputOptions(port=0, app="live", stream_key="k"))
    vch = Channel(256)
    ctx = InputCtx(input_id="g", video_channel=vch, audio_channel=None)
    source.start(ctx)
    try:
        port = source.port
        # garbage connections: empty close, noise bytes, truncated handshake
        for payload in (b"", b"GET / HTTP/1.1\r\n\r\n", b"\x03" + b"x" * 100):
            s = _socket.create_connection(("127.0.0.1", port), timeout=5)
            if payload:
                s.sendall(payload)
            s.close()
        time.sleep(0.5)
        # now a real publisher (libavformat's RTMP client) must still work
        venc = VideoEncoder(Codec.H264, 128, 96, 30)
        mux = Muxer(f"rtmp://127.0.0.1:{port}/live/k", format="flv")
        mux.add_video(Codec.H264, 128, 96, 30, 1, venc.extradata())
        mux.write_header()
        y = np.full((96, 128), 90, np.uint8)
        u = np.full((48, 64), 128, np.uint8)
        for i in range(30):
            y[:] = 40 + i * 6
            venc.send(y, u, u, i / 30)
            while True:
                pkt = venc.receive()
                if pkt in (None, "eof"):
                    break
                mux.write(0, pkt.data, pkt.pts_s, pkt.dts_s, pkt.is_keyframe)
        venc.send_eof()
        while True:
            pkt = venc.receive()
            if pkt in (None, "eof"):
                break
            mux.write(0, pkt.data, pkt.pts_s, pkt.dts_s, pkt.is_keyframe)
        mux.close()
        venc.close()
        got = 0
        deadline = time.time() + 30
        while time.time() < deadline and got < 10:
            try:
                vch.recv(timeout=1)
                got += 1
            except TimeoutError:
                continue
            except Exception:
                break
        assert got >= 10, f"only {got} frames after garbage connections"
    finally:
        source.stop()


def test_rtmp_tls_env_files_enable_rtmps(tmp_path, monkeypatch):
    """SMELTER_RTMP_TLS_CERT_FILE/KEY_FILE wire cert paths into RTMPS server
    inputs registered through the API (reference config.rs:335-351)."""
    from smelter_tpu.config import read_config
    from smelter_tpu.io.rtmp.tls import _self_signed_pem

    cert_pem, key_pem = _self_signed_pem()
    cert_file = tmp_path / "cert.pem"
    key_file = tmp_path / "key.pem"
    cert_file.write_bytes(cert_pem)
    key_file.write_bytes(key_pem)
    monkeypatch.setenv("SMELTER_RTMP_TLS_CERT_FILE", str(cert_file))
    monkeypatch.setenv("SMELTER_RTMP_TLS_KEY_FILE", str(key_file))

    import httpx

    from tests.test_server import ServerThread

    cfg = read_config()
    assert cfg.rtmp_tls_cert_file == str(cert_file)
    cfg.logger.level = "warning"
    s = ServerThread(cfg)
    try:
        with httpx.Client(base_url=s.base, timeout=60) as c:
            r = c.post("/api/input/cam/register", json={"type": "rtmp_server"})
            assert r.status_code == 200, r.text
            port = r.json()["port"]
            # the accepted connection must demand TLS: a TLS client handshake
            # succeeds against the configured self-signed cert
            import socket as sk
            import ssl

            raw = sk.create_connection(("127.0.0.1", port), timeout=10)
            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
            ctx.check_hostname = False
            ctx.verify_mode = ssl.CERT_NONE
            tls = ctx.wrap_socket(raw)
            assert tls.version() is not None
            tls.close()
            assert c.post("/api/input/cam/unregister", json={}).status_code == 200
    finally:
        s.stop()
