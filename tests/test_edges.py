"""Window-edge and multichannel edge cases.

The reference supports "partial decoding" of frames hanging off the window
edge: out-of-window samples contribute nothing to the correlations
(0 < n < N guard, sync_and_demodulate_impl.cc:205, comment
FDR_impl.cc:326-328), and the Fano decoder can ride over a few missing
trailing symbols.
"""

import numpy as np
import pytest

from uwspr_tpu.io.channel import awgn
from uwspr_tpu.pipeline.decoder import WindowDecoder
from uwspr_tpu.pipeline.stream import StreamDecoder
from uwspr_tpu.protocol.modulate import synthesize_frame


@pytest.fixture(scope="module")
def decoder():
    return WindowDecoder()


def test_partial_frame_head_before_window(decoder):
    """A frame that started just before this window (head cut off) still
    decodes: the staged lag refinement reaches negative shifts and the
    missing leading samples contribute nothing to the correlations. The
    greedy staged search (same schedule as the reference) recovers head
    cuts up to about half a half-symbol; beyond that the overlapping next
    window owns the frame."""
    frame = synthesize_frame("VE3EMB", "FN25", 30, pad_to=None)
    cut = 64
    w = np.zeros(45000, np.complex64)
    w[:len(frame) - cut] = frame[cut:]
    w = awgn(w, -10, rng=np.random.default_rng(0))
    r = decoder(w)
    assert "VE3EMB FN25 30" in [s.message for s in r.spots]


def test_frame_too_far_off_window_fails(decoder):
    """A frame missing a third of its symbols does not decode (and does
    not crash anything)."""
    frame = synthesize_frame("VE3EMB", "FN25", 30, pad_to=None)
    w = np.zeros(45000, np.complex64)
    cut = len(frame) // 3
    w[:len(frame) - cut] = frame[cut:]
    w = awgn(w, -10, rng=np.random.default_rng(1))
    r = decoder(w)
    assert "VE3EMB FN25 30" not in [s.message for s in r.spots]


def test_multichannel_2d_push():
    """(channels, n) pushes route windows to per-channel ring buffers."""
    sd = StreamDecoder(n_channels=2, engine="host")
    z0 = synthesize_frame("K1ABC", "FN42", 37, start_sample=500)
    z1 = synthesize_frame("VE3EMB", "FN25", 30, start_sample=900,
                          freq_offset=2.0)
    out = sd.push(np.stack([z0, z1]))
    got = {ch: [s.message for s in r.spots] for ch, r in out}
    assert got[0] == ["K1ABC FN42 37"]
    assert got[1] == ["VE3EMB FN25 30"]
    assert sd.stats.windows == 2


def test_short_push_accumulates():
    sd = StreamDecoder(n_channels=1, engine="host")
    assert sd.push(np.zeros(10, np.complex64)) == []
    assert sd.windows[0].state().shape == (10,)
