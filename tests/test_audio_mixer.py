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


def _thd_db(out: np.ndarray, rate: int, f0: float) -> float:
    """THD+N of a mono signal in dB relative to the fundamental."""
    sig = out[:, 0] * np.hanning(len(out))
    spec = np.abs(np.fft.rfft(sig))
    freqs = np.fft.rfftfreq(len(sig), 1.0 / rate)
    fund = np.abs(freqs - f0) < 50.0
    # ignore DC/near-DC leakage
    band = freqs > 20.0
    p_fund = (spec[fund & band] ** 2).sum()
    p_rest = (spec[~fund & band] ** 2).sum()
    return 10.0 * np.log10(p_rest / p_fund)


def test_resampler_sinc_quality_44100_to_48000():
    """Windowed-sinc interpolation keeps resampling artifacts far below
    what linear interpolation produces (reference quality anchor: rubato
    sinc, audio_mixer/input/resampler.rs)."""
    r = InputResampler(44100, 48000)
    t = np.arange(44100) / 44100.0
    sine = np.sin(2 * np.pi * 997.0 * t)
    r.write_batch(AudioSamples(np.stack([sine, sine], 1), 0.0), 44100)
    chunks = [r.get_samples((i * 0.02, (i + 1) * 0.02)) for i in range(40)]
    out = np.concatenate(chunks)[960:]  # skip warmup edge
    thd = _thd_db(out, 48000, 997.0)
    assert thd < -55.0, f"sinc THD+N {thd:.1f} dB"


def test_resampler_sustained_drift_correction_quality():
    """A sustained ~1% drift keeps the stretch branch engaged; the sinc
    path must stay clean (linear interp is audible here: ~-40 dB)."""
    rate = 48000
    r = InputResampler(rate, rate)
    t = np.arange(rate) / rate
    sine = np.sin(2 * np.pi * 997.0 * t)
    # deliver input 5 ms late so the stretch branch engages and stays on
    r.write_batch(AudioSamples(np.stack([sine, sine], 1), 0.005), rate)
    chunks = [r.get_samples((i * 0.02, (i + 1) * 0.02)) for i in range(40)]
    out = np.concatenate(chunks)[960:]
    thd = _thd_db(out, rate, 997.0)
    assert thd < -50.0, f"drift-corrected THD+N {thd:.1f} dB"


def test_resampler_phase_continuity_across_chunks():
    """No clicks at chunk boundaries: the read phase carries over, so a
    resampled sine has no sample-to-sample jump larger than its natural
    slope allows."""
    r = InputResampler(44100, 48000)
    t = np.arange(44100) / 44100.0
    sine = np.sin(2 * np.pi * 440.0 * t)
    r.write_batch(AudioSamples(np.stack([sine, sine], 1), 0.0), 44100)
    out = np.concatenate([r.get_samples((i * 0.02, (i + 1) * 0.02)) for i in range(20)])
    diffs = np.abs(np.diff(out[480:, 0]))  # skip filter warmup
    # max slope of a 440 Hz unit sine at 48 kHz is 2*pi*440/48000 ~ 0.0576
    assert diffs.max() < 0.08, diffs.max()


def test_sum_scaler_exact_ramp_mirror():
    """Mirror of mixer_tests.rs sum_scaler_* with the production constants
    (mixer.rs:91-94): a clipping chunk drops the factor by 0.02 with a
    per-sample linear ramp old + diff*i/n (mix.rs:103-111); an in-range
    chunk leaves it; a quiet chunk raises it by 0.01."""
    sm = SampleMixer()
    cfg = AudioMixerConfig([AudioMixerInputConfig("a")], "sum_scale", "stereo")

    def scale(vals):
        arr = np.array([[v, -v] for v in vals], np.float64)
        return sm.mix({"a": arr}, cfg, len(vals))

    # chunk 1: clipping -> factor 1.0 -> 0.98, ramped per sample
    out = scale([0.9, 1.1, 0.95, 0.98, 0.7])
    assert sm.scaling_factor == pytest.approx(0.98)
    factors = [1.0 - 0.02 * i / 5 for i in range(5)]
    want = [min(v * f, 1.0) for v, f in zip([0.9, 1.1, 0.95, 0.98, 0.7], factors)]
    assert np.allclose(out[:, 0], want, atol=1e-12), (out[:, 0], want)

    # chunk 2: in range at the current factor -> unchanged
    scale([0.8, 0.75, 0.9, 0.85, 0.72])
    assert sm.scaling_factor == pytest.approx(0.98)

    # chunk 3: quiet -> factor rises by VOL_UP_INCREMENT
    scale([0.3, 0.2, 0.4, 0.35, 0.45])
    assert sm.scaling_factor == pytest.approx(0.99)


def test_resampler_window_overlap_semantics_mirror():
    """Mirror of equal_sample_rate_tests.rs window semantics at 48k→48k:
    (a) input entirely before the request → silence;
    (b) input overlapping only the request start → audio then silence;
    (c) input covering the request → the source signal at the right phase."""
    rate = 48000
    freq = 440.0

    def batch(start_s, dur_s):
        n = int(round(dur_s * rate))
        t = (np.arange(n) + round(start_s * rate)) / rate
        sig = 0.5 * np.sin(2 * np.pi * freq * t)
        return AudioSamples(np.stack([sig, sig], axis=1), start_s)

    # (a) input [0, 20ms) requested [40ms, 60ms): all silence
    r = InputResampler(rate, rate)
    r.write_batch(batch(0.0, 0.010), rate)
    r.write_batch(batch(0.010, 0.010), rate)
    out = r.get_samples((0.040, 0.060))
    assert out is not None and len(out) == 960
    assert np.max(np.abs(out[64:])) < 1e-6, "expected silence"

    # (b) input [0, 30ms) requested [20ms, 40ms): first half audio,
    # second half silence
    r = InputResampler(rate, rate)
    r.write_batch(batch(0.0, 0.010), rate)
    r.write_batch(batch(0.010, 0.020), rate)
    out = r.get_samples((0.020, 0.040))
    assert out is not None and len(out) == 960
    head = out[64:416, 0]
    assert np.max(np.abs(head)) > 0.2, "expected audio in the first half"
    tail = out[544:, 0]
    assert np.max(np.abs(tail)) < 1e-3, "expected silence after input ends"

    # (c) input [10ms, 50ms) requested [20ms, 40ms): reproduces the source
    # at the requested pts (correlate against the ideal signal)
    r = InputResampler(rate, rate)
    r.write_batch(batch(0.010, 0.040), rate)
    out = r.get_samples((0.020, 0.040))
    assert out is not None and len(out) == 960
    t = (np.arange(960) + round(0.020 * rate)) / rate
    ideal = 0.5 * np.sin(2 * np.pi * freq * t)
    seg = out[64:896, 0]
    ref = ideal[64:896]
    corr = float(np.dot(seg, ref) / (np.linalg.norm(seg) * np.linalg.norm(ref) + 1e-12))
    assert corr > 0.99, corr


def test_resampler_input_after_request_is_silence():
    """Mirror of equal_sample_rate_tests.rs input_after_request: buffered
    input lies entirely after the requested window → pure silence, and the
    input remains buffered for the NEXT window."""
    rate = 48000
    sig = 0.5 * np.ones((960, 2), np.float64)
    r = InputResampler(rate, rate)
    r.write_batch(AudioSamples(sig, 0.040), rate)  # input [40ms, 60ms)
    out = r.get_samples((0.0, 0.020))
    assert out is not None and np.max(np.abs(out)) == 0.0
    # the buffered audio still plays when its window arrives
    out2 = r.get_samples((0.040, 0.060))
    assert out2 is not None
    assert np.max(np.abs(out2)) > 0.4
