"""HLS input (reference smelter-core/src/pipeline/hls/hls_input.rs):
dedicated FFmpeg demux with protocol whitelist + interrupt callback, live
PTS anchoring, corrupt-packet drop, discontinuity re-anchor."""

import threading
import time

import numpy as np
import pytest

from smelter_tpu.io.codec import Codec, Muxer, Packet, VideoEncoder
from smelter_tpu.pipeline.input import HlsInput, HlsInputOptions, InputCtx
from smelter_tpu.utils.channels import Channel, Closed

W, H, FPS = 160, 120, 30


def _make_hls(playlist_path: str, seconds: float = 2.0) -> None:
    venc = VideoEncoder(Codec.H264, W, H, FPS)
    y = np.full((H, W), 63, np.uint8)
    u = np.full((H // 2, W // 2), 102, np.uint8)
    v = np.full((H // 2, W // 2), 240, np.uint8)
    pkts = []
    for i in range(int(seconds * FPS)):
        venc.send(y, u, v, i / FPS)
        while True:
            p = venc.receive()
            if p is None or p == "eof":
                break
            pkts.append(p)
    venc.send_eof()
    while True:
        p = venc.receive()
        if p is None or p == "eof":
            break
        pkts.append(p)
    mux = Muxer(playlist_path, format="hls",
                opts="hls_time=1,hls_list_size=0,hls_flags=independent_segments")
    vs = mux.add_video(Codec.H264, W, H, FPS, 1, venc.extradata())
    mux.write_header()
    for p in pkts:
        mux.write(vs, p.data, p.pts_s, p.dts_s, p.is_keyframe)
    mux.close()
    venc.close()


def test_hls_input_decodes_local_playlist(tmp_path):
    playlist = str(tmp_path / "vod.m3u8")
    _make_hls(playlist)

    src = HlsInput(HlsInputOptions(url=playlist))
    assert src.has_video and not src.has_audio
    assert src._live is False  # VOD playlist advertises a duration

    vch = Channel(256)
    src.start(InputCtx(input_id="hls", video_channel=vch, audio_channel=None))
    frames = []
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            frames.append(vch.recv(timeout=5))
        except Closed:
            break
        except TimeoutError:
            continue
    src.stop()
    src.join(timeout=10)
    assert len(frames) >= int(2.0 * FPS) - 2, len(frames)
    pts = [f.pts for f in frames]
    assert pts == sorted(pts)
    assert pts[0] < 0.5  # anchored near zero


def _pkt(pts, key=True, corrupt=False, idx=0):
    return Packet(stream_index=idx, data=b"x", pts_s=pts, dts_s=pts,
                  is_keyframe=key, is_corrupt=corrupt)


def _filter_only_input(tmp_path):
    """HlsInput without opening a real network URL: instantiate against a
    tiny local playlist, then drive _filter_packet directly."""
    playlist = str(tmp_path / "f.m3u8")
    _make_hls(playlist, seconds=0.5)
    return HlsInput(HlsInputOptions(url=playlist))


def test_hls_filter_drops_corrupt_until_keyframe(tmp_path):
    src = _filter_only_input(tmp_path)
    assert src._filter_packet(_pkt(0.0)) is not None
    assert src._filter_packet(_pkt(0.033, key=False, corrupt=True)) is None
    # non-keyframes dropped until the next keyframe
    assert src._filter_packet(_pkt(0.066, key=False)) is None
    assert src._filter_packet(_pkt(0.1, key=True)) is not None


def test_hls_filter_live_anchor_and_discontinuity(tmp_path):
    src = _filter_only_input(tmp_path)
    src._live = True
    first = src._filter_packet(_pkt(1000.0))
    assert first is not None and abs(first.pts_s) < 1e-9  # anchored to zero
    nxt = src._filter_packet(_pkt(1000.0 + 1 / 30, key=False))
    assert abs(nxt.pts_s - 1 / 30) < 1e-9
    # #EXT-X-DISCONTINUITY: raw PTS jumps by 50s; output stays continuous
    jump = src._filter_packet(_pkt(1050.0, key=True))
    assert jump is not None
    assert nxt.pts_s < jump.pts_s < nxt.pts_s + 0.2, jump.pts_s


def test_hls_interrupt_unblocks_stop(tmp_path):
    playlist = str(tmp_path / "i.m3u8")
    _make_hls(playlist, seconds=0.5)
    src = HlsInput(HlsInputOptions(url=playlist))
    # interrupt is armed (options path): stop() must request demux abort
    src.stop()  # before start: no crash, interrupts the probe demuxer
