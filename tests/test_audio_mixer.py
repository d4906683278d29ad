"""Audio mixer tests (reference model: audio_mixer/mix/mixer_tests.rs,
input/resampler tests)."""

import numpy as np
import pytest

from smelter_tpu.core.types import AudioSamples
from smelter_tpu.audio.mixer import (
    AudioMixer,
    AudioMixerConfig,
    AudioMixerInputConfig,
    InputResampler,
    SampleMixer,
)


def _chunk(pts, value, n=960, rate=48000):
    return AudioSamples(np.full((n, 2), value, np.float64), pts)


def _mixer(strategy="sum_clip", channels="stereo", volumes=(1.0,)):
    m = AudioMixer(48000)
    cfgs = []
    for i, v in enumerate(volumes):
        m.register_input(f"in_{i}")
        cfgs.append(AudioMixerInputConfig(f"in_{i}", volume=v))
    m.register_output("out", AudioMixerConfig(cfgs, strategy, channels))
    return m


def test_simple_mix_two_inputs():
    m = _mixer(volumes=(1.0, 1.0))
    out, pts = m.process_batch_set(
        0.0, 0.02, {"in_0": [_chunk(0.0, 0.3)], "in_1": [_chunk(0.0, 0.2)]}
    )["out"]
    assert pts == 0.0
    assert out.shape == (960, 2)
    assert np.allclose(out, 0.5, atol=1e-6)


def test_volume_applied():
    m = _mixer(volumes=(0.5,))
    out, _ = m.process_batch_set(0.0, 0.02, {"in_0": [_chunk(0.0, 0.8)]})["out"]
    assert np.allclose(out, 0.4, atol=1e-6)


def test_sum_clip_clamps():
    m = _mixer(volumes=(1.0, 1.0))
    out, _ = m.process_batch_set(
        0.0, 0.02, {"in_0": [_chunk(0.0, 0.9)], "in_1": [_chunk(0.0, 0.9)]}
    )["out"]
    assert out.max() <= 1.0


def test_sum_scale_agc_reduces_over_time():
    m = _mixer(strategy="sum_scale", volumes=(1.0, 1.0))
    peaks = []
    for i in range(30):
        pts = i * 0.02
        out, _ = m.process_batch_set(
            pts, pts + 0.02,
            {"in_0": [_chunk(pts, 0.9)], "in_1": [_chunk(pts, 0.9)]},
        )["out"]
        peaks.append(out.max())
    assert peaks[-1] < peaks[0]  # AGC ramping down
    assert peaks[-1] <= 1.0


def test_mono_downmix():
    m = _mixer(channels="mono")
    out, _ = m.process_batch_set(0.0, 0.02, {"in_0": [_chunk(0.0, 0.4)]})["out"]
    assert out.shape == (960, 1)
    assert np.allclose(out, 0.4)


def test_gap_filled_with_silence():
    m = _mixer()
    m.process_batch_set(0.0, 0.02, {"in_0": [_chunk(0.0, 0.5)]})
    # skip chunk [0.02, 0.04): next batch starts at 0.04
    out, pts = m.process_batch_set(0.04, 0.06, {"in_0": [_chunk(0.04, 0.5)]})["out"]
    assert pts == pytest.approx(0.02)
    assert out.shape[0] == 1920  # 960 silence + 960 mixed
    assert np.allclose(out[:960], 0.0)
    assert np.allclose(out[960:], 0.5)


def test_missing_input_is_silence():
    m = _mixer(volumes=(1.0, 1.0))
    out, _ = m.process_batch_set(0.0, 0.02, {"in_0": [_chunk(0.0, 0.6)]})["out"]
    assert np.allclose(out, 0.6, atol=1e-6)


def test_resampler_44100_to_48000():
    r = InputResampler(44100, 48000)
    t = np.arange(4410) / 44100.0
    sine = np.sin(2 * np.pi * 440.0 * t)
    r.write_batch(AudioSamples(np.stack([sine, sine], 1), 0.0), 44100)
    out = r.get_samples((0.0, 0.02))
    assert out.shape == (960, 2)
    # still a 440 Hz sine: check rms close to input rms
    assert abs(np.sqrt((out**2).mean()) - np.sqrt((sine**2).mean())) < 0.05


def test_resampler_gap_fill_zeros():
    r = InputResampler(48000, 48000)
    r.write_batch(_chunk(0.1, 0.5), 48000)  # input starts late
    out = r.get_samples((0.0, 0.02))
    assert np.allclose(out, 0.0)  # entire chunk before input: silence


def test_resampler_drop_when_ahead():
    r = InputResampler(48000, 48000)
    r.write_batch(_chunk(0.0, 0.5, n=4800), 48000)  # 100ms buffered
    out = r.get_samples((0.08, 0.10))  # request far ahead: drop old input
    assert out.shape == (960, 2)
    assert np.allclose(out, 0.5)


def test_mono_input_upmixed():
    m = _mixer()
    mono = AudioSamples(np.full((960, 1), 0.3, np.float64), 0.0)
    out, _ = m.process_batch_set(0.0, 0.02, {"in_0": [mono]})["out"]
    assert out.shape == (960, 2)
    assert np.allclose(out, 0.3)
