"""Native codec service tests: encode→mux→demux→decode roundtrips.

Exercises the C++ smelter_io library (native/smelter_io/) the way the
reference exercises its FFmpeg codecs in pipeline tests
(`integration-tests/src/pipeline_tests/`).
"""

import os
import tempfile

import numpy as np
import pytest

from smelter_tpu.io.codec import (
    AudioDecoder,
    AudioEncoder,
    Codec,
    Demuxer,
    Muxer,
    VideoDecoder,
    VideoEncoder,
    caps,
)

W, H = 320, 240
FPS = 30


def _gradient_frame(i: int):
    y = np.full((H, W), min(16 + i * 5, 235), dtype=np.uint8)
    u = np.full((H // 2, W // 2), 100, dtype=np.uint8)
    v = np.full((H // 2, W // 2), 150, dtype=np.uint8)
    return y, u, v


def _drain(obj):
    out = []
    while True:
        p = obj.receive()
        if p is None or p == "eof":
            return out, p == "eof"
        out.append(p)


def test_caps_all_present():
    c = caps()
    assert all(c.values()), c


@pytest.mark.parametrize("codec", [Codec.H264, Codec.VP8, Codec.VP9])
def test_video_encode_decode_roundtrip(codec):
    enc = VideoEncoder(codec, W, H, FPS)
    pkts = []
    n_frames = 10
    for i in range(n_frames):
        enc.send(*_gradient_frame(i), pts_s=i / FPS)
        pkts += _drain(enc)[0]
    enc.send_eof()
    pkts += _drain(enc)[0]
    assert len(pkts) == n_frames
    assert pkts[0].is_keyframe

    dec = VideoDecoder(codec, enc.extradata())
    frames = []
    for p in pkts:
        dec.send(p.data, p.pts_s or 0.0)
        frames += _drain(dec)[0]
    dec.send_eof()
    frames += _drain(dec)[0]
    assert len(frames) == n_frames
    y, u, v, pts, _ = frames[0]
    assert y.shape == (H, W) and u.shape == (H // 2, W // 2)
    # lossy but flat frames should be close
    assert abs(float(y.mean()) - 16) < 4
    assert abs(float(u.mean()) - 100) < 4
    enc.close()
    dec.close()


def test_mp4_mux_demux_video_audio():
    path = tempfile.mktemp(suffix=".mp4")
    venc = VideoEncoder(Codec.H264, W, H, FPS)
    aenc = AudioEncoder(Codec.AAC, 44100, 2)

    vpkts = []
    for i in range(FPS):
        venc.send(*_gradient_frame(i), pts_s=i / FPS)
        vpkts += _drain(venc)[0]
    venc.send_eof()
    vpkts += _drain(venc)[0]

    # 1s of 440 Hz stereo sine
    t = np.arange(44100) / 44100.0
    sine = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pcm = np.stack([sine, sine], axis=1)
    apkts = []
    aenc.send(pcm, 0.0)
    apkts += _drain(aenc)[0]
    aenc.send_eof()
    apkts += _drain(aenc)[0]
    assert len(apkts) > 30

    mux = Muxer(path)
    vs = mux.add_video(Codec.H264, W, H, FPS, 1, venc.extradata())
    as_ = mux.add_audio(Codec.AAC, 44100, 2, aenc.extradata())
    mux.write_header()
    for p in vpkts:
        mux.write(vs, p.data, p.pts_s, p.dts_s, p.is_keyframe)
    for p in apkts:
        mux.write(as_, p.data, p.pts_s, p.dts_s, p.is_keyframe)
    mux.close()
    assert os.path.getsize(path) > 1000

    d = Demuxer(path)
    infos = {s.media_type: s for s in d.streams()}
    assert infos["video"].codec == Codec.H264
    assert infos["video"].width == W
    assert infos["audio"].codec == Codec.AAC
    assert infos["audio"].sample_rate == 44100

    vdec = VideoDecoder(Codec.H264, infos["video"].extradata)
    adec = AudioDecoder(
        Codec.AAC, 48000, 2,
        extradata=infos["audio"].extradata,
        in_sample_rate=44100, in_channels=2,
    )
    n_v, n_a_samples = 0, 0
    while True:
        pkt = d.read()
        if pkt is None:
            break
        if pkt.stream_index == infos["video"].index:
            vdec.send(pkt.data, pkt.pts_s or 0.0)
            n_v += len(_drain(vdec)[0])
        else:
            adec.send(pkt.data, pkt.pts_s or 0.0)
            for samples, _pts in _drain(adec)[0]:
                n_a_samples += samples.shape[0]
    vdec.send_eof()
    n_v += len(_drain(vdec)[0])
    adec.send_eof()
    for samples, _pts in _drain(adec)[0]:
        n_a_samples += samples.shape[0]
    assert n_v == FPS
    # ~1s at 48k out (resampled from 44.1k), allow codec priming slop
    assert abs(n_a_samples - 48000) < 4800
    d.close()
    os.unlink(path)


def test_opus_roundtrip():
    enc = AudioEncoder(Codec.OPUS, 48000, 2)
    t = np.arange(48000) / 48000.0
    sine = (0.25 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    pcm = np.stack([sine, sine], axis=1)
    enc.send(pcm, 0.0)
    pkts = _drain(enc)[0]
    enc.send_eof()
    pkts += _drain(enc)[0]
    assert len(pkts) >= 45  # 20ms frames

    dec = AudioDecoder(Codec.OPUS, 48000, 2, extradata=enc.extradata(),
                       in_sample_rate=48000, in_channels=2)
    total = 0
    for p in pkts:
        dec.send(p.data, p.pts_s or 0.0)
        for samples, _ in _drain(dec)[0]:
            total += samples.shape[0]
    dec.send_eof()
    for samples, _ in _drain(dec)[0]:
        total += samples.shape[0]
    assert abs(total - 48000) < 9600


def test_demux_seek():
    path = tempfile.mktemp(suffix=".mp4")
    enc = VideoEncoder(Codec.H264, W, H, FPS, opts="g=30")
    pkts = []
    for i in range(90):
        enc.send(*_gradient_frame(i % 44), pts_s=i / FPS)
        pkts += _drain(enc)[0]
    enc.send_eof()
    pkts += _drain(enc)[0]
    mux = Muxer(path)
    vs = mux.add_video(Codec.H264, W, H, FPS, 1, enc.extradata())
    mux.write_header()
    for p in pkts:
        mux.write(vs, p.data, p.pts_s, p.dts_s, p.is_keyframe)
    mux.close()

    d = Demuxer(path)
    d.seek(2.0)
    pkt = d.read()
    assert pkt is not None
    assert pkt.pts_s is not None and pkt.pts_s >= 0.9  # seeks to a keyframe at/before 2s
    d.close()
    os.unlink(path)


def test_audio_encoder_resamples_input_rate():
    """A 48 kHz mixer feeding a 44.1 kHz AAC encoder must not pitch-shift
    (reference encoder/resampler.rs)."""
    enc = AudioEncoder(Codec.AAC, 44100, 2, input_sample_rate=48000)
    t = np.arange(96000) / 48000.0  # 2s at 48 kHz
    sine = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    enc.send(np.stack([sine, sine], axis=1), 0.0)
    enc.send_eof()
    pkts = _drain(enc)[0]
    assert pkts

    dec = AudioDecoder(Codec.AAC, 48000, 2, extradata=enc.extradata(),
                       in_sample_rate=44100, in_channels=2)
    chunks = []
    for p in pkts:
        dec.send(p.data, p.pts_s or 0.0)
        chunks += [s for s, _ in _drain(dec)[0]]
    dec.send_eof()
    chunks += [s for s, _ in _drain(dec)[0]]
    pcm = np.concatenate(chunks).mean(axis=1)
    assert pcm.shape[0] > 48000
    seg = pcm[24000:72000]
    spectrum = np.abs(np.fft.rfft(seg))
    freqs = np.fft.rfftfreq(len(seg), 1 / 48000)
    peak = float(freqs[int(np.argmax(spectrum))])
    assert abs(peak - 440.0) < 5.0, f"tone moved to {peak} Hz"
