"""Closed-loop interference test: decode through whale-song interference,
the reference's de-facto integration scenario
(examples/WaveFilePlusNoiseDecode.grc, README.md:61-65: signal at 0.1 gain
mixed with whales_12000sps.wav at unit gain)."""

import numpy as np
import pytest

from uwspr_tpu.frontend.downconvert import downconvert
from uwspr_tpu.io.wavfile import read_wav
from uwspr_tpu.pipeline.decoder import WindowDecoder
from uwspr_tpu.protocol.modulate import synthesize_frame


def test_decode_through_whale_song(reference_examples):
    whales, rate = read_wav(reference_examples / "whales_12000sps.wav")
    assert rate == 12000
    interference = downconvert(whales)
    # mirror the flowgraph's gain ratio: signal x0.1 against unit whales.
    # The whale capture is shorter than a window; tile it.
    reps = int(np.ceil(45000 / len(interference)))
    interference = np.tile(interference, reps)[:45000]
    z = 0.1 * synthesize_frame("VE3EMB", "FN25", 30, start_sample=500)
    w = (z + interference).astype(np.complex64)
    r = WindowDecoder()(w)
    assert "VE3EMB FN25 30" in [s.message for s in r.spots]
