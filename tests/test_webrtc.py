"""WebRTC tests: DTLS handshake, SRTP protect/unprotect, STUN, SDP, session
loopback, and full WHIP publish → compose → MP4 through the HTTP server
(reference `smelter-core/src/webrtc/` tested via in-process loopback like the
reference's WHIP tests against its own axum server)."""

import os
import socket
import struct
import threading
import time

import numpy as np
import pytest

from smelter_tpu.io.webrtc import sdp as sdp_mod
from smelter_tpu.io.webrtc import stun
from smelter_tpu.io.webrtc.dtls import DtlsEndpoint
from smelter_tpu.io.webrtc.session import WebRtcSession
from smelter_tpu.io.webrtc.srtp import SrtpSession, sessions_from_dtls


def test_dtls_handshake_and_keys():
    srv = DtlsEndpoint(is_server=True)
    cli = DtlsEndpoint(is_server=False)
    assert len(srv.fingerprint().split(":")) == 32
    flight = cli.handshake(b"")
    for _ in range(10):
        if srv.established and cli.established:
            break
        s_out = srv.handshake(flight)
        flight = cli.handshake(s_out)
    assert srv.established and cli.established
    assert srv.export_srtp_keys() == cli.export_srtp_keys()
    srv.close()
    cli.close()


def test_srtp_rtp_roundtrip():
    key, salt = os.urandom(16), os.urandom(14)
    tx = SrtpSession(key, salt)
    rx = SrtpSession(key, salt)
    from smelter_tpu.io.rtp import RtpPacket

    for seq in [0, 1, 2, 65534, 65535, 0, 1]:  # crosses a rollover
        pkt = RtpPacket(96, seq, seq * 3000, 0x1234, os.urandom(200), marker=True)
        wire = tx.protect_rtp(pkt.serialize())
        plain = rx.unprotect_rtp(wire)
        back = RtpPacket.parse(plain)
        assert back.payload == pkt.payload
        assert back.sequence_number == seq

    # tampering is detected
    pkt = RtpPacket(96, 10, 30000, 0x1234, b"x" * 50)
    wire = bytearray(tx.protect_rtp(pkt.serialize()))
    wire[20] ^= 0xFF
    with pytest.raises(ValueError):
        rx.unprotect_rtp(bytes(wire))


def test_srtp_reordered_rollover():
    """A late pre-rollover packet delivered after the 16-bit wrap must not
    regress the ROC high-water mark — with the old bug the next in-order
    packet double-incremented ROC and every later packet failed auth."""
    key, salt = os.urandom(16), os.urandom(14)
    tx = SrtpSession(key, salt)
    rx = SrtpSession(key, salt)
    from smelter_tpu.io.rtp import RtpPacket

    wires = {}
    for seq in [65520, 65530, 10, 20, 30]:  # tx protects in send order
        pkt = RtpPacket(96, seq, seq * 3000, 0x5678, bytes([seq & 0xFF]) * 64)
        wires[seq] = tx.protect_rtp(pkt.serialize())
    for seq in [65520, 10, 65530, 20, 30]:  # network reorders across the wrap
        plain = rx.unprotect_rtp(wires[seq])
        assert RtpPacket.parse(plain).sequence_number == seq


def test_srtcp_roundtrip():
    key, salt = os.urandom(16), os.urandom(14)
    tx = SrtpSession(key, salt)
    rx = SrtpSession(key, salt)
    # minimal RTCP RR packet: V=2, PT=201, length=1, ssrc
    rtcp = bytes([0x80, 201, 0, 1]) + struct.pack("!I", 0xAABBCCDD)
    wire = tx.protect_rtcp(rtcp)
    plain = rx.unprotect_rtcp(wire)
    assert plain == rtcp


def test_stun_binding_roundtrip():
    req = stun.build(
        stun.BINDING_REQUEST,
        attrs=[(stun.ATTR_USERNAME, b"remote:local")],
        password="secretpw",
    )
    assert stun.is_stun(req)
    msg = stun.parse(req)
    assert msg.msg_type == stun.BINDING_REQUEST
    assert msg.attr(stun.ATTR_USERNAME) == b"remote:local"
    assert stun.check_integrity(req, msg, "secretpw")
    assert not stun.check_integrity(req, msg, "wrongpw")

    xor = stun.xor_mapped_address(("192.168.1.7", 50000), msg.transaction_id)
    ip, port = stun.parse_xor_mapped_address(xor, msg.transaction_id)
    assert (ip, port) == ("192.168.1.7", 50000)


def test_sdp_parse_build_roundtrip():
    media = sdp_mod.default_offer_media("h264")
    offer = sdp_mod.build(
        "ufrag1", "pwd1" * 6, "AB:CD", setup="actpass",
        media=media, directions=["sendonly", "sendonly"],
        candidate=("10.0.0.5", 4242),
    )
    parsed = sdp_mod.parse(offer)
    assert parsed.ice_ufrag == "ufrag1"
    assert parsed.fingerprint == "AB:CD"
    assert parsed.candidates == [("10.0.0.5", 4242)]
    assert parsed.find_codec("video", ["h264"]) == (96, "h264")
    assert parsed.find_codec("audio", ["opus"]) == (111, "opus")
    assert parsed.media[1].direction == "sendonly"


def test_session_loopback_media():
    """Two WebRtcSessions (offerer+answerer) on localhost: ICE, DTLS, SRTP,
    then RTP flows both ways."""
    from smelter_tpu.io.rtp import RtpPacket

    answerer = WebRtcSession(is_offerer=False)
    offerer = WebRtcSession(is_offerer=True)

    # emulate the SDP exchange
    offer_desc = sdp_mod.parse(sdp_mod.build(
        offerer.local_ufrag, offerer.local_pwd, offerer.fingerprint(),
        setup="actpass", media=sdp_mod.default_offer_media(),
        directions=["sendrecv", "sendrecv"], candidate=offerer.candidate,
    ))
    answer_desc = sdp_mod.parse(sdp_mod.build(
        answerer.local_ufrag, answerer.local_pwd, answerer.fingerprint(),
        setup="passive", media=sdp_mod.default_offer_media(),
        directions=["sendrecv", "sendrecv"], candidate=answerer.candidate,
        ice_lite=True,
    ))
    answerer.set_remote(offer_desc)
    offerer.set_remote(answer_desc)

    got_a, got_b = [], []
    answerer.on_rtp = got_a.append
    offerer.on_rtp = got_b.append
    answerer.start()
    offerer.start()
    assert offerer.established.wait(timeout=15), "offerer DTLS failed"
    assert answerer.established.wait(timeout=15), "answerer DTLS failed"

    for i in range(20):
        offerer.send_rtp(RtpPacket(96, i, i * 3000, 7, bytes([i]) * 100).serialize())
        answerer.send_rtp(RtpPacket(111, i, i * 960, 9, bytes([i]) * 40).serialize())
    deadline = time.time() + 5
    while time.time() < deadline and (len(got_a) < 20 or len(got_b) < 20):
        time.sleep(0.05)
    offerer.close()
    answerer.close()
    assert len(got_a) >= 18, len(got_a)
    assert len(got_b) >= 18, len(got_b)
    from smelter_tpu.io.rtp import RtpPacket as RP

    p = RP.parse(got_a[0])
    assert p.payload_type == 96 and len(p.payload) == 100


@pytest.mark.parametrize("udp_mux", [False, True], ids=["ephemeral", "mux"])
def test_whip_publish_end_to_end(tmp_path, udp_mux):
    """Full WHIP: our WHIP client publishes into the HTTP server's /whip/:id,
    pipeline composes to MP4. Runs both UDP strategies: ephemeral
    per-session sockets and SMELTER_WEBRTC_UDP_MUX_PORT (all server
    sessions sharing one socket, setting_engine.rs MuxOnSinglePort)."""
    import httpx

    from smelter_tpu.config import Config, LoggerConfig
    from smelter_tpu.core.types import Framerate
    from tests.test_pipeline import _decode_output, _make_source_mp4
    from tests.test_server import ServerThread

    src = str(tmp_path / "src.mp4")
    _make_source_mp4(src, "red", 440.0)
    out_path = str(tmp_path / "out.mp4")

    mux_port = None
    if udp_mux:
        probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        probe.bind(("0.0.0.0", 0))
        mux_port = probe.getsockname()[1]
        probe.close()

    cfg = Config(
        output_framerate=Framerate(30),
        ahead_of_time_processing=True,
        never_drop_output_frames=True,
        logger=LoggerConfig(level="warning"),
        webrtc_udp_mux_port=mux_port,
    )
    s = ServerThread(cfg)
    try:
        with httpx.Client(base_url=s.base, timeout=120) as c:
            r = c.post(
                "/api/input/cam/register",
                json={"type": "whip_server", "required": True, "offset_ms": 0},
            )
            assert r.status_code == 200, r.text
            body = r.json()
            assert body["endpoint_route"] == "/whip/cam"
            token = body["bearer_token"]

            r = c.post(
                "/api/output/out/register",
                json={
                    "type": "mp4",
                    "path": out_path,
                    "video": {
                        "resolution": {"width": 320, "height": 240},
                        "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                        "initial": {
                            "root": {
                                "type": "rescaler",
                                "child": {"type": "input_stream", "input_id": "cam"},
                            }
                        },
                        "send_eos_when": {"any_input": True},
                    },
                    "audio": {
                        "encoder": {"type": "aac"},
                        "initial": {"inputs": [{"input_id": "cam"}]},
                        "send_eos_when": {"any_input": True},
                    },
                },
            )
            assert r.status_code == 200, r.text
            assert c.post("/api/start", json={}).status_code == 200

            # bad token rejected
            r = c.post(f"/whip/cam", content="v=0", headers={
                "Content-Type": "application/sdp",
                "Authorization": "Bearer wrong",
            })
            assert r.status_code == 401

            # our WHIP publisher: encode 2s of video+audio in a 2nd pipeline
            from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
            from smelter_tpu.core.types import Resolution
            from smelter_tpu.io.webrtc.whip import WhipClientOutput
            from smelter_tpu.pipeline import (
                AudioEncoderOptions,
                EndCondition,
                Mp4Input,
                Mp4InputOptions,
                OutputAudioOptions,
                OutputVideoOptions,
                Pipeline,
                PipelineOptions,
                RegisterInputOptions,
                VideoEncoderOptions,
            )
            from smelter_tpu.scene import components as comp

            tx = Pipeline(PipelineOptions(
                output_framerate=Framerate(30),
                ahead_of_time_processing=True,
                never_drop_output_frames=True,
            ))
            tx.register_input(
                "a", Mp4Input(Mp4InputOptions(path=src)),
                RegisterInputOptions(required=True, offset=0.0),
            )
            sink = WhipClientOutput(
                f"{s.base}/whip/cam", bearer_token=token
            )
            tx.register_output(
                "whip", sink,
                video=OutputVideoOptions(
                    resolution=Resolution(320, 240),
                    encoder=VideoEncoderOptions(
                        codec="h264", preset="ultrafast",
                        ffmpeg_options="global_header=0",
                    ),
                    initial_root=comp.Rescaler(child=comp.InputStream(input_id="a")),
                    end_condition=EndCondition(all_inputs=True),
                ),
                audio=OutputAudioOptions(
                    encoder=AudioEncoderOptions(codec="opus", sample_rate=48000),
                    initial_mixer_config=AudioMixerConfig(
                        inputs=[AudioMixerInputConfig("a")]
                    ),
                    end_condition=EndCondition(all_inputs=True),
                ),
            )
            tx.start()

            # wait for the rx pipeline to produce the MP4 (EOS: when the whip
            # publisher finishes, media stops; any_input fires when the
            # session closes the channels)
            deadline = time.time() + 120
            done = False
            while time.time() < deadline:
                kinds = {(e.kind, e.entity_id)
                         for e in s.state.pipeline.events.history()}
                if ("OUTPUT_DONE", "out") in kinds:
                    done = True
                    break
                time.sleep(0.3)
            # receiver-report feedback reached the publisher: the server's
            # receive bridge sends RRs ~1/s and the sender derives RTT from
            # LSR/DLSR (RFC 3550 §6.4.1)
            assert sink.remote_fraction_lost is not None, (
                "no receiver report reached the WHIP publisher"
            )
            tx.close()
            assert done, "OUTPUT_DONE not observed"
    finally:
        s.state.pipeline.close()
        s.stop()

    frames, audio, infos = _decode_output(out_path)
    assert len(frames) >= 30, len(frames)
    assert audio.shape[0] > 30000, audio.shape
    # red content → high V plane
    assert float(np.mean([float(f[2].mean()) for f in frames])) > 170


def test_whep_subscribe_end_to_end(tmp_path):
    """WHEP: a subscriber (our WhepClientInput) pulls the server's output."""
    import httpx

    from smelter_tpu.audio.mixer import AudioMixerConfig, AudioMixerInputConfig
    from smelter_tpu.config import Config, LoggerConfig
    from smelter_tpu.core.types import Framerate, Resolution
    from smelter_tpu.io.webrtc import WhepClientInput
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
    from tests.test_pipeline import _make_source_mp4
    from tests.test_server import ServerThread

    src = str(tmp_path / "src.mp4")
    _make_source_mp4(src, "blue", 440.0)

    cfg = Config(output_framerate=Framerate(30), logger=LoggerConfig(level="warning"))
    s = ServerThread(cfg)
    rx = None
    try:
        with httpx.Client(base_url=s.base, timeout=60) as c:
            r = c.post(
                "/api/input/clip/register",
                json={"type": "mp4", "path": src, "loop": True},
            )
            assert r.status_code == 200, r.text
            r = c.post(
                "/api/output/live/register",
                json={
                    "type": "whep_server",
                    "video": {
                        "resolution": {"width": 320, "height": 240},
                        "encoder": {"type": "ffmpeg_h264", "preset": "ultrafast"},
                        "initial": {
                            "root": {
                                "type": "rescaler",
                                "child": {"type": "input_stream", "input_id": "clip"},
                            }
                        },
                    },
                    "audio": {
                        "encoder": {"type": "opus"},
                        "initial": {"inputs": [{"input_id": "clip"}]},
                    },
                },
            )
            assert r.status_code == 200, r.text
            token = r.json()["bearer_token"]
            assert c.post("/api/start", json={}).status_code == 200

            # subscriber pipeline
            rx = Pipeline(PipelineOptions(output_framerate=Framerate(30)))
            sub = WhepClientInput(f"{s.base}/whep/live", bearer_token=token)
            rx.register_input("remote", sub, RegisterInputOptions())
            sink = RawDataOutputSink(video_capacity=300)
            rx.register_output(
                "raw",
                sink,
                video=OutputVideoOptions(
                    resolution=Resolution(320, 240),
                    encoder=VideoEncoderOptions(codec="raw"),
                    initial_root=comp.Rescaler(
                        child=comp.InputStream(input_id="remote")
                    ),
                    end_condition=EndCondition(),
                ),
            )
            rx.start()
            # the queue renders gray until the WebRTC media lands (input
            # is not required), so wait for the first *blue* frame
            deadline = time.time() + 90
            found = False
            n_frames = 0
            while time.time() < deadline and not found:
                try:
                    frame = sink.video.recv(timeout=0.5)
                except (Closed, TimeoutError):
                    continue
                n_frames += 1
                u_mean = float(np.asarray(frame.data[1]).mean())
                if u_mean > 170:
                    found = True
            assert found, "no blue frame in %d frames" % n_frames
    finally:
        if rx is not None:
            rx.close()
        s.state.pipeline.close()
        s.stop()


def test_rtcp_nack_build_parse_roundtrip():
    from smelter_tpu.io import rtcp

    seqs = [100, 101, 105, 116, 117, 300]
    data = rtcp.build_nack(0x11, 0x22, seqs)
    items = rtcp.parse_compound(data)
    assert len(items) == 1
    nack = items[0]
    assert isinstance(nack, rtcp.Nack)
    assert (nack.sender_ssrc, nack.media_ssrc) == (0x11, 0x22)
    assert sorted(nack.lost_seqs) == seqs
    # seq-wrap packing: 65535 and 3 are 4 apart mod 2^16 → one FCI pair
    data = rtcp.build_nack(1, 2, [65535, 3])
    nack = rtcp.parse_compound(data)[0]
    assert sorted(nack.lost_seqs) == [3, 65535]


def test_jitter_buffer_nack_candidates():
    from smelter_tpu.io.rtp import JitterBuffer, RtpPacket

    jb = JitterBuffer(window_s=10.0)  # big window: gaps stay pending
    jb.push(RtpPacket(96, 10, 0, 1, b"a"))
    jb.push(RtpPacket(96, 14, 0, 1, b"b"))  # 11,12,13 missing
    assert jb.nack_candidates() == [11, 12, 13]
    # retry budget: each seq reported at most MAX_NACK_RETRIES times
    for _ in range(JitterBuffer.MAX_NACK_RETRIES - 1):
        assert jb.nack_candidates() == [11, 12, 13]
    assert jb.nack_candidates() == []
    # a filled gap stops being a candidate
    jb2 = JitterBuffer(window_s=10.0)
    jb2.push(RtpPacket(96, 1, 0, 1, b"a"))
    jb2.push(RtpPacket(96, 3, 0, 1, b"b"))
    assert jb2.nack_candidates() == [2]
    jb2.push(RtpPacket(96, 2, 0, 1, b"c"))
    assert jb2.nack_candidates() == []


def test_trickle_ice_fragment_parsing():
    frag = (
        "a=ice-ufrag:abcd\r\n"
        "a=ice-pwd:efgh\r\n"
        "m=audio 9 UDP/TLS/RTP/SAVPF 111\r\n"
        "a=mid:0\r\n"
        "a=candidate:1 1 udp 2130706431 192.0.2.10 5000 typ host\r\n"
        "candidate:2 1 udp 1694498815 203.0.113.5 6000 typ srflx\r\n"
        "a=candidate:3 1 tcp 2105458943 192.0.2.10 9 typ host\r\n"  # tcp: skip
        "a=end-of-candidates\r\n"
    )
    assert sdp_mod.parse_candidate_fragment(frag) == [
        ("192.0.2.10", 5000), ("203.0.113.5", 6000),
    ]


def test_session_add_remote_candidates_dedup():
    s = WebRtcSession(is_offerer=True)
    s.remote_candidates = [("10.0.0.1", 1000)]
    s.add_remote_candidates([("10.0.0.1", 1000), ("10.0.0.2", 2000)])
    assert s.remote_candidates == [("10.0.0.1", 1000), ("10.0.0.2", 2000)]
    s.close()


def test_vp9_negotiation_and_loss_recovery_loopback():
    """VP9 offer negotiates (reference negotiated_codecs.rs breadth) and a
    dropped media packet is recovered via Generic NACK retransmission: the
    receiver's jitter buffer NACKs the gap, the sender's retransmit cache
    answers, and the access unit still decodes in order."""
    import numpy as np

    from smelter_tpu.io.rtp import RtpPacket
    from smelter_tpu.io.webrtc.whip import (
        NegotiatedMedia,
        _RtpReceiverBridge,
        _RtpSenderBridge,
        negotiate,
    )
    from smelter_tpu.pipeline.input import InputCtx
    from smelter_tpu.utils.channels import Channel

    # --- negotiation: VP9-only offer picks vp9
    offer = sdp_mod.parse(sdp_mod.build(
        "uf", "pw", "AA:BB", setup="actpass",
        media=sdp_mod.default_offer_media("vp9"),
        directions=["sendrecv", "sendrecv"], candidate=("127.0.0.1", 9),
    ))
    neg = negotiate(offer)
    assert neg.video_codec == "vp9" and neg.video_pt == 98

    # --- transport pair
    answerer = WebRtcSession(is_offerer=False)
    offerer = WebRtcSession(is_offerer=True)
    offer_desc = sdp_mod.parse(sdp_mod.build(
        offerer.local_ufrag, offerer.local_pwd, offerer.fingerprint(),
        setup="actpass", media=sdp_mod.default_offer_media("vp9"),
        directions=["sendrecv", "sendrecv"], candidate=offerer.candidate,
    ))
    answer_desc = sdp_mod.parse(sdp_mod.build(
        answerer.local_ufrag, answerer.local_pwd, answerer.fingerprint(),
        setup="passive", media=sdp_mod.default_offer_media("vp9"),
        directions=["sendrecv", "sendrecv"], candidate=answerer.candidate,
        ice_lite=True,
    ))
    answerer.set_remote(offer_desc)
    offerer.set_remote(answer_desc)

    # receiver side: bridge with a VP9 depayloader + decode thread
    vch = Channel(64)
    ctx = InputCtx(input_id="v", video_channel=vch, audio_channel=None)
    bridge = _RtpReceiverBridge(answerer, ctx, neg)

    # sender side: VP9 payloader + NACK retransmit cache
    sender = _RtpSenderBridge()
    sender.video_codec = "vp9"
    sender.attach(offerer, 98, 111)

    answerer.start()
    offerer.start()
    assert offerer.established.wait(timeout=15)
    assert answerer.established.wait(timeout=15)

    # encode a few real VP9 frames
    from smelter_tpu.io.codec import Codec, VideoEncoder

    enc = VideoEncoder(Codec.VP9, 128, 96, 30)
    y = np.full((96, 128), 120, np.uint8)
    u = np.full((48, 64), 128, np.uint8)
    v = np.full((48, 64), 128, np.uint8)
    pkts = []
    for i in range(10):
        enc.send(y, u, v, i / 30.0)
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
    assert len(pkts) >= 8

    # send through the bridge, dropping one mid-stream RTP packet at the
    # transport (monkeypatch send_rtp once) to force a NACK round trip
    real_send = offerer.send_rtp
    dropped = {"n": 0}

    def lossy_send(data):
        pkt = RtpPacket.parse(data)
        if pkt is not None and pkt.sequence_number == 5 and dropped["n"] == 0:
            dropped["n"] = 1
            return  # drop exactly once; the retransmit must heal it
        real_send(data)

    offerer.send_rtp = lossy_send

    class _Pkt:
        def __init__(self, p):
            self.data, self.pts_s, self.is_keyframe = p.data, p.pts_s, p.is_keyframe

    for p in pkts:
        sender.write_video_packet(_Pkt(p))
        time.sleep(0.01)

    # collect decoded frames; NACK recovery should deliver all 10
    frames = []
    deadline = time.time() + 20
    while time.time() < deadline and len(frames) < 10:
        try:
            frames.append(vch.recv(timeout=1))
        except TimeoutError:
            continue
        except Exception:
            break
    bridge.close()
    sender.detach()
    answerer.close()
    offerer.close()
    assert dropped["n"] == 1, "the loss injection never triggered"
    assert len(frames) >= 9, len(frames)


def test_stun_srflx_gathering(monkeypatch):
    """Server-reflexive candidate discovery against a local STUN responder
    (reference SMELTER_WEBRTC_STUN_SERVERS, config.rs:269-281) and its
    placement in the offer SDP."""
    import socket
    import threading

    from smelter_tpu.io.webrtc import stun

    stun_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    stun_sock.bind(("127.0.0.1", 0))
    stun_port = stun_sock.getsockname()[1]
    mapped = ("203.0.113.7", 61000)

    def responder():
        stun_sock.settimeout(5)
        try:
            data, addr = stun_sock.recvfrom(2048)
        except OSError:
            return
        msg = stun.parse(data)
        resp = stun.build(
            stun.BINDING_RESPONSE, tid=msg.transaction_id,
            attrs=[(stun.ATTR_XOR_MAPPED_ADDRESS,
                    stun.xor_mapped_address(mapped, msg.transaction_id))],
        )
        stun_sock.sendto(resp, addr)

    t = threading.Thread(target=responder, daemon=True)
    t.start()

    s = WebRtcSession(is_offerer=True)
    got = s.gather_srflx([f"stun:127.0.0.1:{stun_port}"], timeout=3.0)
    assert got == mapped
    assert s.srflx == mapped
    sdp = sdp_mod.build(
        s.local_ufrag, s.local_pwd, s.fingerprint(), setup="actpass",
        media=sdp_mod.default_offer_media(), directions=["sendonly", "sendonly"],
        candidate=s.candidate, srflx_candidate=s.srflx,
    )
    assert "typ srflx raddr" in sdp and "203.0.113.7 61000" in sdp
    s.close()
    stun_sock.close()


def test_av1_negotiation_and_loopback():
    """AV1 over WebRTC (beyond-reference): negotiation picks av1 from an
    AV1-only offer, and real encoded AV1 round-trips through the DTLS-SRTP
    transport with the av1-rtp-spec payloaders."""
    import numpy as np

    from smelter_tpu.io.webrtc.whip import (
        _RtpReceiverBridge,
        _RtpSenderBridge,
        negotiate,
    )
    from smelter_tpu.pipeline.input import InputCtx
    from smelter_tpu.utils.channels import Channel

    offer = sdp_mod.parse(sdp_mod.build(
        "uf", "pw", "AA:BB", setup="actpass",
        media=sdp_mod.default_offer_media("av1"),
        directions=["sendrecv", "sendrecv"], candidate=("127.0.0.1", 9),
    ))
    neg = negotiate(offer)
    assert neg.video_codec == "av1" and neg.video_pt == 99

    answerer = WebRtcSession(is_offerer=False)
    offerer = WebRtcSession(is_offerer=True)
    offer_desc = sdp_mod.parse(sdp_mod.build(
        offerer.local_ufrag, offerer.local_pwd, offerer.fingerprint(),
        setup="actpass", media=sdp_mod.default_offer_media("av1"),
        directions=["sendrecv", "sendrecv"], candidate=offerer.candidate,
    ))
    answer_desc = sdp_mod.parse(sdp_mod.build(
        answerer.local_ufrag, answerer.local_pwd, answerer.fingerprint(),
        setup="passive", media=sdp_mod.default_offer_media("av1"),
        directions=["sendrecv", "sendrecv"], candidate=answerer.candidate,
        ice_lite=True,
    ))
    answerer.set_remote(offer_desc)
    offerer.set_remote(answer_desc)

    vch = Channel(64)
    ctx = InputCtx(input_id="v", video_channel=vch, audio_channel=None)
    bridge = _RtpReceiverBridge(answerer, ctx, neg)

    sender = _RtpSenderBridge()
    sender.video_codec = "av1"
    sender.attach(offerer, 99, 111)

    answerer.start()
    offerer.start()
    assert offerer.established.wait(timeout=15)
    assert answerer.established.wait(timeout=15)

    from smelter_tpu.io.codec import Codec, VideoEncoder

    enc = VideoEncoder(Codec.AV1, 128, 96, 30)
    y = np.full((96, 128), 120, np.uint8)
    u = np.full((48, 64), 128, np.uint8)
    v = np.full((48, 64), 128, np.uint8)
    pkts = []
    for i in range(10):
        enc.send(y, u, v, i / 30.0)
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
    assert len(pkts) >= 8

    class _Pkt:
        def __init__(self, p):
            self.data, self.pts_s, self.is_keyframe = p.data, p.pts_s, p.is_keyframe

    for p in pkts:
        sender.write_video_packet(_Pkt(p))
        time.sleep(0.01)

    frames = []
    deadline = time.time() + 20
    while time.time() < deadline and len(frames) < len(pkts):
        try:
            frames.append(vch.recv(timeout=1))
        except TimeoutError:
            continue
        except Exception:
            break
    bridge.close()
    sender.detach()
    answerer.close()
    offerer.close()
    assert len(frames) >= len(pkts) - 1, len(frames)


def test_whep_server_negotiates_registered_codec_only():
    """WHEP output streams whatever the registered encoder produces; the
    answer must pick THAT codec's payload type from the subscriber offer
    (h264-first preference against a vp8 encoder would mislabel packets),
    and reject offers that lack it."""
    from smelter_tpu.io.webrtc.whip import WhepServerOutput

    out = WhepServerOutput(video_codec="vp8")
    offer = sdp_mod.build(
        "uf", "pw", "AA:BB", setup="actpass",
        media=[
            sdp_mod.MediaDescription(
                kind="audio", mid="0", payload_types=[111],
                rtpmap={111: "opus/48000/2"}, fmtp={},
            ),
            sdp_mod.MediaDescription(
                kind="video", mid="1", payload_types=[102, 105],
                rtpmap={102: "H264/90000", 105: "VP8/90000"}, fmtp={},
            ),
        ],
        directions=["recvonly", "recvonly"], candidate=("127.0.0.1", 9),
    )
    answer = out.handle_offer(offer)
    assert "105 VP8/90000" in answer
    assert "H264" not in answer
    assert out.video_pt == 105 and out.video_codec == "vp8"
    if out.session is not None:
        out.session.close()
    out.detach()

    out2 = WhepServerOutput(video_codec="av1")
    h264_only = sdp_mod.build(
        "uf", "pw", "AA:BB", setup="actpass",
        media=[sdp_mod.MediaDescription(
            kind="video", mid="0", payload_types=[96],
            rtpmap={96: "H264/90000"}, fmtp={},
        )],
        directions=["recvonly"], candidate=("127.0.0.1", 9),
    )
    import pytest as _pytest
    with _pytest.raises(ValueError):
        out2.handle_offer(h264_only)


def test_whip_input_decoder_preferences_restrict_negotiation():
    """WHIP input `decoder_preferences` (reference offer_codec_filter.rs):
    the preference list restricts AND orders codec selection; an offer
    without any preferred codec is rejected."""
    from smelter_tpu.io.webrtc.whip import WhipServerInput
    from smelter_tpu.pipeline.input import InputCtx
    from smelter_tpu.utils.channels import Channel

    def offer_with(codecs):
        rtpmap = {}
        pts = []
        base = {"h264": (96, "H264/90000"), "vp8": (97, "VP8/90000"),
                "vp9": (98, "VP9/90000")}
        for c in codecs:
            pt, m = base[c]
            pts.append(pt)
            rtpmap[pt] = m
        return sdp_mod.build(
            "uf", "pw", "AA:BB", setup="actpass",
            media=[sdp_mod.MediaDescription(
                kind="video", mid="0", payload_types=pts,
                rtpmap=rtpmap, fmtp={},
            )],
            directions=["sendonly"], candidate=("127.0.0.1", 9),
        )

    # prefer vp9 over h264: an offer with both must pick vp9
    src = WhipServerInput(video_codecs=["vp9", "h264"])
    src.start(InputCtx(input_id="w", video_channel=Channel(4),
                       audio_channel=None))
    try:
        answer = src.handle_offer(offer_with(["h264", "vp9"]))
        assert "VP9/90000" in answer and "H264" not in answer
        src.disconnect()
        # an offer with only vp8 has no preferred codec -> rejected
        import pytest as _pytest
        with _pytest.raises(ValueError):
            src.handle_offer(offer_with(["vp8"]))
    finally:
        src.stop()


def test_udp_port_range_and_nat_ips():
    """SMELTER_WEBRTC_UDP_PORT_RANGE + SMELTER_WEBRTC_1_TO_1_NAT_IPS
    (reference setting_engine.rs PortRange + nat_1to1_ips): session sockets
    bind inside the range and the advertised host candidate IP is the NAT
    substitute."""
    from smelter_tpu.io.webrtc import session as sess_mod

    sess_mod.configure_udp(
        port_range=(39500, 39510), nat_1to1_ips=("203.0.113.5",)
    )
    s1 = s2 = None
    try:
        s1 = WebRtcSession(is_offerer=True)
        s2 = WebRtcSession(is_offerer=True)
        assert 39500 <= s1.port <= 39510
        assert 39500 <= s2.port <= 39510
        assert s1.port != s2.port
        assert s1.candidate[0] == "203.0.113.5"
    finally:
        for s in (s1, s2):
            if s is not None:
                s.close()
        sess_mod.configure_udp()


def test_udp_mux_media_loopback():
    """SMELTER_WEBRTC_UDP_MUX_PORT (setting_engine.rs MuxOnSinglePort):
    multiple server sessions share ONE UDP socket; packets demux by the
    ICE ufrag in STUN USERNAME, then by source address — full ICE + DTLS +
    SRTP still flows."""
    from smelter_tpu.io.rtp import RtpPacket
    from smelter_tpu.io.webrtc import session as sess_mod

    probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    probe.bind(("0.0.0.0", 0))
    mux_port = probe.getsockname()[1]
    probe.close()

    sess_mod.configure_udp(mux_port=mux_port)
    try:
        answerer = WebRtcSession(is_offerer=False)
        extra = WebRtcSession(is_offerer=False)
        assert answerer.port == extra.port == mux_port
        assert answerer.sock is extra.sock
    finally:
        sess_mod.configure_udp()

    offerer = WebRtcSession(is_offerer=True)  # plain client socket
    try:
        offer_desc = sdp_mod.parse(sdp_mod.build(
            offerer.local_ufrag, offerer.local_pwd, offerer.fingerprint(),
            setup="actpass", media=sdp_mod.default_offer_media(),
            directions=["sendrecv", "sendrecv"], candidate=offerer.candidate,
        ))
        answer_desc = sdp_mod.parse(sdp_mod.build(
            answerer.local_ufrag, answerer.local_pwd, answerer.fingerprint(),
            setup="passive", media=sdp_mod.default_offer_media(),
            directions=["sendrecv", "sendrecv"],
            candidate=("127.0.0.1", answerer.port),
            ice_lite=True,
        ))
        answerer.set_remote(offer_desc)
        offerer.set_remote(answer_desc)

        got = []
        answerer.on_rtp = got.append
        answerer.start()
        offerer.start()
        assert offerer.established.wait(timeout=15), "offerer DTLS failed"
        assert answerer.established.wait(timeout=15), "answerer DTLS failed"
        for i in range(10):
            offerer.send_rtp(
                RtpPacket(96, i, i * 3000, 7, bytes([i]) * 50).serialize()
            )
        deadline = time.time() + 5
        while time.time() < deadline and len(got) < 10:
            time.sleep(0.05)
        assert len(got) >= 8, len(got)
    finally:
        offerer.close()
        extra.close()
        answerer.close()
    # last unregister closed the shared socket
    assert answerer._mux._refs <= 0


def test_srtp_replay_protection():
    """RFC 3711 §3.3.2: a replayed (already-seen) packet index must be
    rejected after auth; unseen reordered indices within the 64-deep window
    still decrypt."""
    key, salt = b"k" * 16, b"s" * 14
    tx = SrtpSession(key, salt)
    rx = SrtpSession(key, salt)
    from smelter_tpu.io.rtp import RtpPacket

    protected = [
        tx.protect_rtp(RtpPacket(96, seq, seq * 3000, 7, b"p" * 40).serialize())
        for seq in range(10)
    ]
    # in-order
    for pkt in protected[:5]:
        rx.unprotect_rtp(pkt)
    # replay of an accepted packet -> rejected
    with pytest.raises(ValueError, match="replay"):
        rx.unprotect_rtp(protected[3])
    # unseen, reordered within the window -> accepted once...
    rx.unprotect_rtp(protected[8])
    rx.unprotect_rtp(protected[6])
    # ...and rejected the second time
    with pytest.raises(ValueError, match="replay"):
        rx.unprotect_rtp(protected[6])


def test_rtcp_receiver_report_roundtrip_and_rtt():
    """RR build/parse roundtrip + the sender-side RTT computation from
    LSR/DLSR (RFC 3550 §6.4.1)."""
    import time as _time

    from smelter_tpu.io import rtcp

    tracker = rtcp.ReceptionTracker(ssrc=0xABC, clock_rate=90000)
    now = _time.time()
    # 8 of 10 packets arrive (2 lost)
    for seq in [0, 1, 2, 3, 5, 6, 8, 9]:
        tracker.on_packet(seq, seq * 3000, now=now + seq * 0.01)
    sr = rtcp.SenderReport(ssrc=0xABC, ntp_sec=0x11112222, ntp_frac=0x33334444,
                           rtp_timestamp=0, packet_count=10, octet_count=1000)
    tracker.on_sender_report(sr, now=now)
    block = tracker.report_block(now=now + 0.5)
    assert block.cumulative_lost == 2
    assert block.fraction_lost == (2 << 8) // 10
    assert block.highest_seq == 9
    assert block.lsr == ((0x11112222 & 0xFFFF) << 16) | (0x33334444 >> 16)
    assert abs(block.dlsr / 65536.0 - 0.5) < 0.01

    rr = rtcp.ReceiverReport(ssrc=1, reports=[block])
    packets = rtcp.parse_compound(rtcp.build_receiver_report(rr))
    assert len(packets) == 1 and isinstance(packets[0], rtcp.ReceiverReport)
    parsed = packets[0].reports[0]
    assert parsed == block

    # RTT: receiver mirrored OUR SR sent 0.1 s ago, held it 0.02 s
    send_time = _time.time() - 0.1
    ntp = send_time + rtcp.NTP_EPOCH_OFFSET
    lsr = ((int(ntp) & 0xFFFF) << 16) | (int((ntp % 1.0) * 65536.0) & 0xFFFF)
    feedback = rtcp.ReportBlock(ssrc=2, fraction_lost=0, cumulative_lost=0,
                                highest_seq=100, jitter=0, lsr=lsr,
                                dlsr=int(0.02 * 65536))
    rtt = rtcp.rtt_from_report(feedback)
    assert rtt is not None and abs(rtt - 0.08) < 0.02, rtt


def test_whip_session_receiver_reports_flow_back():
    """End-to-end over a session loopback: the receive bridge sends RRs and
    the sender bridge derives RTT/remote loss from them."""
    from smelter_tpu.io import rtcp as rtcp_mod
    from smelter_tpu.io.rtp import RtpPacket

    answerer = WebRtcSession(is_offerer=False)
    offerer = WebRtcSession(is_offerer=True)
    offer_desc = sdp_mod.parse(sdp_mod.build(
        offerer.local_ufrag, offerer.local_pwd, offerer.fingerprint(),
        setup="actpass", media=sdp_mod.default_offer_media(),
        directions=["sendrecv", "sendrecv"], candidate=offerer.candidate,
    ))
    answer_desc = sdp_mod.parse(sdp_mod.build(
        answerer.local_ufrag, answerer.local_pwd, answerer.fingerprint(),
        setup="passive", media=sdp_mod.default_offer_media(),
        directions=["sendrecv", "sendrecv"], candidate=answerer.candidate,
        ice_lite=True,
    ))
    answerer.set_remote(offer_desc)
    offerer.set_remote(answer_desc)

    got_rr = []

    def offerer_rtcp(data: bytes) -> None:
        got_rr.extend(
            item for item in rtcp_mod.parse_compound(data)
            if isinstance(item, rtcp_mod.ReceiverReport)
        )

    offerer.on_rtcp = offerer_rtcp

    # answerer side: a receiver bridge over the session
    from smelter_tpu.io.webrtc.whip import NegotiatedMedia, _RtpReceiverBridge
    from smelter_tpu.pipeline.input import InputCtx
    from smelter_tpu.utils.channels import Channel

    neg = NegotiatedMedia(video_pt=96, audio_pt=111, video_codec="h264")
    ctx = InputCtx(input_id="w", video_channel=Channel(64), audio_channel=None)
    bridge = _RtpReceiverBridge(answerer, ctx, neg)

    answerer.start()
    offerer.start()
    assert offerer.established.wait(15)
    assert answerer.established.wait(15)

    # feed >1 s of spaced packets so an RR fires
    deadline = time.time() + 8
    i = 0
    while time.time() < deadline and not got_rr:
        offerer.send_rtp(
            RtpPacket(96, i, i * 3000, 0xfeed, b"x" * 50).serialize()
        )
        i += 1
        time.sleep(0.05)
    bridge.close()
    offerer.close()
    answerer.close()
    assert got_rr, "no receiver report arrived at the sender"
    block = got_rr[0].reports[0]
    assert block.ssrc == 0xfeed
    assert block.highest_seq >= 1


def test_srtp_spoofed_wrap_does_not_poison_roc():
    """RFC 3711 §3.3.2 ordering: a spoofed, unauthenticated packet whose
    sequence looks like a 16-bit wrap must NOT advance the receiver ROC —
    with the pre-auth commit bug, one garbage packet permanently broke
    auth for every subsequent legitimate packet."""
    key, salt = os.urandom(16), os.urandom(14)
    tx = SrtpSession(key, salt)
    rx = SrtpSession(key, salt)
    from smelter_tpu.io.rtp import RtpPacket

    rx.unprotect_rtp(
        tx.protect_rtp(RtpPacket(96, 60000, 1000, 0x42, b"a" * 40).serialize())
    )
    # attacker: wrap-looking seq (5 < 60000, delta > 0x8000) with a bogus tag
    forged = RtpPacket(96, 5, 2000, 0x42, b"evil" * 10).serialize() + b"\x00" * 10
    with pytest.raises(ValueError):
        rx.unprotect_rtp(forged)
    # legitimate stream continues under roc=0 and must still authenticate
    for seq in (60001, 60002):
        plain = rx.unprotect_rtp(
            tx.protect_rtp(RtpPacket(96, seq, 3000, 0x42, b"b" * 40).serialize())
        )
        assert RtpPacket.parse(plain).sequence_number == seq


def test_udp_mux_stun_spoof_cannot_rebind_demux():
    """UdpMux must verify MESSAGE-INTEGRITY before committing the
    addr→session demux mapping: ufrags are public (they appear in SDP), so
    an unauthenticated binding request with a stolen ufrag from a spoofed
    source address must not hijack the session's DTLS/SRTP routing."""
    from smelter_tpu.io.webrtc.session import UdpMux

    class _FakeSession:
        local_ufrag = "lfrg"
        local_pwd = "correct-horse-battery-staple"

    mux = UdpMux(0)
    try:
        sess = _FakeSession()
        mux.register(sess)

        good_addr = ("127.0.0.1", 41000)
        evil_addr = ("203.0.113.7", 6666)
        user = b"lfrg:remotefrag"

        # authenticated binding request routes AND commits the mapping
        good = stun.build(
            stun.BINDING_REQUEST,
            attrs=[(stun.ATTR_USERNAME, user)],
            password=sess.local_pwd,
        )
        assert mux._route_stun(good, good_addr) is sess
        assert mux._by_addr.get(good_addr) is sess

        # spoofed request (right ufrag, wrong password) must not bind
        spoof = stun.build(
            stun.BINDING_REQUEST,
            attrs=[(stun.ATTR_USERNAME, user)],
            password="wrong-password",
        )
        assert mux._route_stun(spoof, evil_addr) is None
        assert evil_addr not in mux._by_addr
        # ...and must not disturb the existing good mapping
        assert mux._by_addr.get(good_addr) is sess
    finally:
        mux.unregister(sess)
