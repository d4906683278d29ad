"""RTCP tests: packet build/parse, NTP sync math, PLI keyframe plumbing."""

import struct
import time

import numpy as np
import pytest

from smelter_tpu.io import rtcp


def test_sender_report_roundtrip():
    sr = rtcp.SenderReport(
        ssrc=0x1234, ntp_sec=3900000000, ntp_frac=1 << 31,
        rtp_timestamp=90000, packet_count=10, octet_count=1000,
    )
    data = rtcp.build_sender_report(sr)
    assert rtcp.is_rtcp(data)
    items = rtcp.parse_compound(data)
    assert len(items) == 1
    back = items[0]
    assert isinstance(back, rtcp.SenderReport)
    assert back.ssrc == 0x1234
    assert abs(back.ntp_unix - (3900000000 - rtcp.NTP_EPOCH_OFFSET + 0.5)) < 1e-6
    assert back.rtp_timestamp == 90000


def test_pli_and_bye_roundtrip():
    data = rtcp.build_pli(1, 2) + rtcp.build_bye([7, 8])
    items = rtcp.parse_compound(data)
    assert isinstance(items[0], rtcp.Pli)
    assert items[0].media_ssrc == 2
    assert isinstance(items[1], rtcp.Bye)
    assert items[1].ssrcs == [7, 8]


def test_sync_state_aligns_streams():
    sync = rtcp.RtcpSyncState()
    sync.register_stream(1, 90000)   # video
    sync.register_stream(2, 48000)   # audio
    # video SR: rtp_ts 90000 at NTP t0; audio SR: rtp_ts 48000 at NTP t0
    t0 = 3900000000
    sync.on_sender_report(rtcp.SenderReport(1, t0, 0, 90000, 0, 0))
    sync.on_sender_report(rtcp.SenderReport(2, t0, 0, 48000, 0, 0))
    # both timestamps correspond to the same wall time -> same pts
    v = sync.pts_for(1, 90000)
    a = sync.pts_for(2, 48000)
    assert v is not None and a is not None
    assert abs(v - a) < 1e-9
    # one video second later
    assert abs(sync.pts_for(1, 180000) - (v + 1.0)) < 1e-9
    # audio stream that started 0.5 s later in NTP terms
    sync2 = rtcp.RtcpSyncState()
    sync2.register_stream(1, 90000)
    sync2.register_stream(2, 48000)
    sync2.on_sender_report(rtcp.SenderReport(1, t0, 0, 0, 0, 0))
    sync2.on_sender_report(rtcp.SenderReport(2, t0, 1 << 31, 0, 0, 0))
    assert abs(sync2.pts_for(2, 0) - sync2.pts_for(1, 0) - 0.5) < 1e-6


def test_rtp_output_pli_triggers_keyframe(tmp_path):
    """UDP RTP output: inbound PLI on the socket triggers a keyframe request
    and SRs appear in the outbound stream."""
    import socket

    from smelter_tpu.io.rtp import RtpOutputOptions, RtpOutputSink

    rx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    rx.bind(("127.0.0.1", 0))
    rx.settimeout(5.0)
    port = rx.getsockname()[1]

    sink = RtpOutputSink(RtpOutputOptions(ip="127.0.0.1", port=port, transport="udp"))
    got_kf = []
    sink.on_keyframe_request = lambda: got_kf.append(1)
    sink.setup_video(None, b"", 30, 1)

    class Pkt:
        def __init__(self, pts):
            self.data = b"\x00\x00\x00\x01\x65" + b"x" * 50
            self.pts_s = pts
            self.dts_s = pts
            self.is_keyframe = True

    saw_sr = False
    for i in range(3):
        sink.write_video_packet(Pkt(i / 30))
    deadline = time.time() + 5
    src_port = None
    while time.time() < deadline:
        try:
            data, addr = rx.recvfrom(2048)
        except socket.timeout:
            break
        src_port = addr[1]
        if rtcp.is_rtcp(data):
            saw_sr = True
            break
    assert saw_sr, "no sender report observed"
    # send PLI back to the sink's socket
    rx.sendto(rtcp.build_pli(9, 0x53544956), ("127.0.0.1", src_port))
    deadline = time.time() + 5
    while time.time() < deadline and not got_kf:
        time.sleep(0.05)
    sink.on_done()
    rx.close()
    assert got_kf, "PLI did not trigger a keyframe request"


def test_track_delta_and_slew_convergence():
    """SR-derived cross-track correction (rtcp_sync.rs semantics): the
    constant per-track delta maps first-packet-rebased pts onto the shared
    NTP timeline; TrackSyncSlew converges at 1% of media-time progress and
    SNAPs past 300 ms."""
    sync = rtcp.RtcpSyncState()
    t0 = 3900000000
    # video SR anchors rtp_ts 90000 at NTP t0; the track's first packet was
    # at rtp_ts 81000 => 0.1 s BEFORE the anchor => delta = -0.1
    sync.on_sender_report(rtcp.SenderReport(1, t0, 0, 90000, 0, 0))
    d = sync.track_delta(1, 81000, 90000)
    assert d == pytest.approx(-0.1)
    # audio stream whose first packet maps 0.1 s after base => delta +0.1
    sync.on_sender_report(rtcp.SenderReport(2, t0, 0, 48000, 0, 0))
    da = sync.track_delta(2, 48000 + 4800, 48000)
    assert da == pytest.approx(0.1)

    # slew: small target converges at 1%/media-second, monotonic
    slew = rtcp.TrackSyncSlew()
    out0 = slew.apply(0.0)
    assert out0 == 0.0
    slew.set_target(0.05)
    outs = [slew.apply(k * 0.02) for k in range(1, 300)]
    # never overshoots, converges to +0.05 (needs 0.05/(0.02*1%) = 250 steps)
    deltas = [o - k * 0.02 for k, o in zip(range(1, 300), outs)]
    assert all(b >= a - 1e-12 for a, b in zip(deltas, deltas[1:]))
    assert deltas[-1] == pytest.approx(0.05, abs=1e-9)
    # per-step slew bounded by 1% of the 20 ms media step
    steps = [b - a for a, b in zip(deltas, deltas[1:])]
    assert max(steps) <= 0.02 * 0.01 + 1e-12

    # snap: target beyond 300 ms applies immediately
    slew2 = rtcp.TrackSyncSlew()
    slew2.apply(0.0)
    slew2.set_target(0.5)
    assert slew2.apply(0.02) == pytest.approx(0.02 + 0.5)


def test_reception_tracker_backward_wrap_straggler():
    """RFC 3550 appendix A.1: a reordered pre-wrap straggler arriving just
    after max_seq wrapped must be counted in the PREVIOUS cycle — the old
    forward-only test jumped max_seq a whole cycle forward, inflating
    expected/cumulative_lost by ~65536 in the next Receiver Report."""
    t = rtcp.ReceptionTracker(ssrc=7, clock_rate=90000)
    now = 1000.0
    for i, seq in enumerate([65530, 65531, 65532, 65533, 65535, 0, 1, 2]):
        t.on_packet(seq, i * 3000, now=now + i * 0.02)
    # late straggler from before the wrap
    t.on_packet(65534, 4 * 3000, now=now + 0.2)
    rb = t.report_block(now=now + 0.25)
    assert rb.cumulative_lost == 0
    # extended highest seq is one cycle + 2, not two cycles
    assert rb.highest_seq == (1 << 16) + 2
