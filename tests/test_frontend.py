"""Audio front-end tests: 12 kS/s real audio <-> 375 S/s complex baseband.

Golden path = the reference example flowgraph chain
(examples/AudioSourceDecode.grc: band-pass 1500 Hz -> translate -> decimate
x32; examples/c2ToWaveFile.grc for the sender direction).
"""

import numpy as np
import pytest

from uwspr_tpu.frontend.downconvert import (
    Downconverter,
    design_lowpass,
    downconvert,
    upconvert,
)
from uwspr_tpu.io.wavfile import read_wav, write_wav
from uwspr_tpu.pipeline.decoder import WindowDecoder
from uwspr_tpu.protocol.modulate import synthesize_frame


@pytest.fixture(scope="module")
def decoder():
    return WindowDecoder()


def test_lowpass_design():
    taps = design_lowpass(257, 100.0, 12000.0)
    assert taps.sum() == pytest.approx(1.0, abs=1e-6)
    # stopband: response at 375 Hz must be well down
    w = np.exp(-2j * np.pi * 375.0 / 12000.0 * np.arange(257))
    assert 20 * np.log10(abs(np.dot(taps, w))) < -40


def test_tone_downconversion():
    """A 1502 Hz audio tone lands at +2 Hz complex baseband."""
    fs = 12000
    t = np.arange(fs * 16) / fs
    audio = np.cos(2 * np.pi * 1502.0 * t).astype(np.float32)
    z = downconvert(audio)
    assert len(z) == len(audio) // 32
    # instantaneous frequency of the settled portion
    seg = z[1000:5000]
    dphi = np.angle(seg[1:] * np.conj(seg[:-1]))
    f_est = np.mean(dphi) * 375 / (2 * np.pi)
    assert f_est == pytest.approx(2.0, abs=0.05)
    # amplitude ~0.5 (mixer halves a real tone)
    assert np.mean(np.abs(seg)) == pytest.approx(0.5, rel=0.05)


def test_wav_golden_decode(decoder, reference_examples):
    """examples/test_1500_Hz.wav holds the VE3EMB frame at 1500 Hz."""
    audio, rate = read_wav(reference_examples / "test_1500_Hz.wav")
    assert rate == 12000
    z = downconvert(audio)
    result = decoder(z[:45000])
    assert "VE3EMB FN25 30" in [s.message for s in result.spots]


def test_real_capture_decode(decoder, reference_examples):
    """examples/150613_1920.wav is a real over-the-air capture."""
    audio, rate = read_wav(reference_examples / "150613_1920.wav")
    z = downconvert(audio)
    result = decoder(z[:45000])
    assert "VE3EMB FN42 33" in [s.message for s in result.spots]


def test_upconvert_loopback(decoder, tmp_path):
    """sender -> wav -> receiver closed loop (c2ToWaveFile + AudioSourceDecode)."""
    z = synthesize_frame("N0CAL", "JN58", 20, start_sample=900,
                         freq_offset=-1.5)
    audio = upconvert(z)
    path = tmp_path / "loop.wav"
    write_wav(path, audio, 12000)
    audio2, rate = read_wav(path)
    assert rate == 12000
    back = downconvert(audio2)
    result = decoder(back[:45000])
    assert "N0CAL JN58 20" in [s.message for s in result.spots]


def test_downconverter_length_handling():
    d = Downconverter()
    out = d(np.zeros(12037, dtype=np.float32))   # non-multiple of 32
    assert len(out) == 12032 // 32
