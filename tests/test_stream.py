"""Streaming orchestration tests: windowing semantics, multichannel push,
checkpoint/resume, spot dedup (reference behavioral spec:
lib/sliding_window_stream_to_pdu_impl.cc:97-138)."""

import numpy as np
import pytest

from uwspr_tpu.config import PipelineConfig, StreamConfig
from uwspr_tpu.io.channel import noise_sigma
from uwspr_tpu.pipeline.stream import (
    SlidingWindow,
    SpotAggregator,
    StreamDecoder,
)
from uwspr_tpu.pipeline.decoder import Spot
from uwspr_tpu.protocol.modulate import synthesize_frame


def test_window_emission_timing():
    """fl=45000, hop=9*375=3375: first window after ceil(fl/hop)=14 pushes
    of one hop each, then one window per push."""
    sw = SlidingWindow(StreamConfig())
    hop = sw.hop
    emitted = []
    for i in range(20):
        out = sw.push(np.full(hop, i + 1, dtype=np.complex64))
        emitted.append(len(out))
    assert emitted[:13] == [0] * 13
    assert emitted[13:] == [1] * 7


def test_window_content_overlap():
    """Consecutive windows overlap by fl-hop samples (111 s)."""
    sw = SlidingWindow(StreamConfig())
    stream = np.arange(60000, dtype=np.float32).astype(np.complex64)
    wins = sw.push(stream)
    assert len(wins) == 5          # (60000-45000)//3375 + 1
    for i, w in enumerate(wins):
        assert w[0] == i * sw.hop  # each advanced by one hop
        assert len(w) == 45000


def test_ring_capacity_drops_oldest():
    cfg = StreamConfig(capacity_windows=2)
    sw = SlidingWindow(cfg)
    big = np.arange(3 * cfg.fl, dtype=np.float32).astype(np.complex64)
    wins = sw.push(big)
    # buffer was capped at 2*fl: the first window starts at sample fl
    assert wins[0][0] == cfg.fl


def test_stream_decoder_decodes_across_hops():
    """A frame split across hop-sized pushes decodes once windows form."""
    sd = StreamDecoder(n_channels=1)
    hop = sd.windows[0].hop
    rng = np.random.default_rng(7)
    sigma = noise_sigma(-15.0)
    frame = synthesize_frame("VE3EMB", "FN25", 30, pad_to=None,
                             freq_offset=1.0)
    stream = (rng.normal(scale=sigma, size=16 * hop)
              + 1j * rng.normal(scale=sigma, size=16 * hop)
              ).astype(np.complex64)
    stream[1000:1000 + len(frame)] += frame
    msgs = []
    for i in range(16):
        for _, r in sd.push(stream[i * hop:(i + 1) * hop]):
            msgs += [s.message for s in r.spots]
    assert "VE3EMB FN25 30" in msgs
    assert sd.stats.windows == 3
    assert sd.stats.spots >= 1


def test_checkpoint_resume(tmp_path):
    """Ring-buffer state survives a save/load cycle mid-stream."""
    z = synthesize_frame("K1ABC", "FN42", 37, start_sample=500)
    sd1 = StreamDecoder(n_channels=1)
    hop = sd1.windows[0].hop
    # feed 13 hops (no window yet), checkpoint, resume in a fresh decoder
    for i in range(13):
        assert sd1.push(z[i * hop:(i + 1) * hop]) == []
    sd1.save_checkpoint(tmp_path)

    sd2 = StreamDecoder(n_channels=1)
    sd2.load_checkpoint(tmp_path)
    out = sd2.push(z[13 * hop:14 * hop])
    assert len(out) == 1
    ch, r = out[0]
    assert "K1ABC FN42 37" in [s.message for s in r.spots]


def test_spot_aggregator_dedups():
    agg = SpotAggregator()
    a = Spot(message="M", payload=b"x", freq=1.0, snr=0, sync=0, shift=0,
             drift=0, mode=0)
    b = Spot(message="M", payload=b"x", freq=1.2, snr=0, sync=0, shift=0,
             drift=0, mode=0)
    c = Spot(message="M", payload=b"x", freq=5.0, snr=0, sync=0, shift=0,
             drift=0, mode=0)
    assert agg.add(a) is True
    assert agg.add(b) is False     # same message, same freq bucket
    assert agg.add(c) is True      # same message, distant freq
    assert len(agg.unique) == 2
