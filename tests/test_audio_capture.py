"""io.audio.AudioCapture — the live soundcard source (r5).

No capture stack exists in CI, so the backend probe must fail cleanly
with the probe log, and an injected fake backend must drive the full
capture -> downconvert -> decode chain end-to-end on a synthesized
12 kS/s frame (the AudioSourceDecode.grc receive path).
"""

import numpy as np
import pytest

from uwspr_tpu.io.audio import AudioCapture, AudioUnavailable


class FakeBackend:
    """Replays a prepared s16 stream in blocks, then EOF."""

    name = "fake"

    def __init__(self, samples: np.ndarray, blocksize: int = 4096):
        self._s = np.asarray(samples, np.int16)
        self._pos = 0
        self.blocksize = blocksize

    def read(self) -> np.ndarray:
        if self._pos >= len(self._s):
            raise EOFError
        block = self._s[self._pos:self._pos + self.blocksize]
        self._pos += self.blocksize
        return block

    def close(self):
        pass


def test_probe_fails_cleanly_without_backends():
    with pytest.raises(AudioUnavailable) as e:
        AudioCapture(rate=12000)
    # every known backend shows up in the probe log
    log = "; ".join(e.value.probes)
    for name in ("sounddevice", "pyaudio", "alsa", "arecord"):
        assert name in log, log


def test_fake_capture_decodes_frame():
    from uwspr_tpu.config import DemodConfig, PipelineConfig
    from uwspr_tpu.frontend.downconvert import (StreamingDownconverter,
                                                upconvert)
    from uwspr_tpu.pipeline.decoder import WindowDecoder
    from uwspr_tpu.protocol.modulate import synthesize_frame

    z = synthesize_frame("VE3EMB", "FN25", 30, freq_offset=1.5)
    audio = upconvert(z, amplitude=0.5)               # 12 kS/s float
    s16 = np.clip(np.round(audio * 32767), -32768, 32767).astype(np.int16)

    cap = AudioCapture(rate=12000, backend=FakeBackend(s16))
    assert cap.backend_name == "fake"
    dc = StreamingDownconverter()
    chunks = [dc.push(b.astype(np.float32) / 32768.0) for b in cap]
    zb = np.concatenate([c for c in chunks if len(c)])
    assert len(zb) >= 44000
    dec = WindowDecoder(PipelineConfig(demod=DemodConfig(maxcycles=2000)))
    window = np.zeros(45000, np.complex64)
    window[:len(zb[:45000])] = zb[:45000]
    msgs = {s.message for s in dec(window).spots}
    assert "VE3EMB FN25 30" in msgs
