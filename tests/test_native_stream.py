"""Native C++ streaming runtime: windower parity with the Python
SlidingWindow, and the batched serving engine end-to-end.

Reference semantics under test: the window builder's circular buffer of
capacity C*fl with fl-window / hop advance
(/root/reference/lib/sliding_window_stream_to_pdu_impl.cc:65,97-138).
"""

import numpy as np
import pytest

from uwspr_tpu.config import DemodConfig, PipelineConfig, StreamConfig
from uwspr_tpu.io.channel import awgn
from uwspr_tpu.pipeline.native import NativeWindower, num_threads
from uwspr_tpu.pipeline.stream import (
    BatchedStreamDecoder,
    SlidingWindow,
    StreamDecoder,
)
from uwspr_tpu.protocol.modulate import synthesize_frame


def test_native_windower_matches_sliding_window():
    """Random multi-push patterns (including a ring-overflowing giant
    push) must emit windows identical to the Python SlidingWindow, in the
    same channel order."""
    cfg = StreamConfig(fl=500, shift=1, fs=50)          # fl=500, hop=50
    rng = np.random.default_rng(0)
    C = 3
    nw = NativeWindower(C, cfg.fl, cfg.shift * cfg.fs, cfg.capacity_windows)
    py = [SlidingWindow(cfg) for _ in range(C)]
    total = 0
    for it in range(40):
        n = int(rng.integers(1, 400)) if it != 20 else 1500
        block = (rng.normal(size=(C, n))
                 + 1j * rng.normal(size=(C, n))).astype(np.complex64)
        nw.push(block)
        exp = [(c, w) for c in range(C) for w in py[c].push(block[c])]
        got_ri, got_ch = nw.pop_batch(64)
        assert len(exp) == len(got_ri), it
        for (ec, ew), gri, gc in zip(exp, got_ri, got_ch):
            assert ec == gc
            np.testing.assert_array_equal(ew, (gri[0] + 1j * gri[1]))
        total += len(exp)
    assert total > 100                  # the pattern actually emitted
    assert nw.dropped > 0               # the giant push overflowed
    assert num_threads() >= 1


def test_native_windower_partial_pop():
    """pop_batch smaller than ready leaves the remaining windows intact."""
    fl, hop = 400, 100
    nw = NativeWindower(1, fl, hop, capacity_windows=4)
    x = np.arange(1, 1201, dtype=np.float32)
    nw.push(np.stack([x, -x])[None])
    assert nw.ready == (1200 - fl) // hop + 1           # 9 windows
    first, ch = nw.pop_batch(4)
    rest, _ = nw.pop_batch(16)
    assert len(first) == 4 and len(rest) == 5 and nw.ready == 0
    allw = np.concatenate([first, rest])
    for w in range(9):
        np.testing.assert_array_equal(allw[w, 0], x[w * hop:w * hop + fl])
        np.testing.assert_array_equal(allw[w, 1], -x[w * hop:w * hop + fl])


def test_batched_stream_decoder_end_to_end():
    """Native ingest -> batched XLA decode finds the same spots as the
    Python StreamDecoder on a 2-channel stream with one frame each."""
    config = PipelineConfig(demod=DemodConfig(maxcycles=2000))
    rng = np.random.default_rng(3)
    frames = [
        awgn(synthesize_frame("VE3EMB", "FN25", 30, start_sample=700,
                              freq_offset=1.5), -20, rng=rng),
        awgn(synthesize_frame("K1ABC", "FN42", 37, start_sample=300,
                              freq_offset=-3.0), -20, rng=rng),
    ]
    stream = np.stack(frames)                            # (2, 45000)

    dec = BatchedStreamDecoder(config, n_channels=2, batch_windows=4)
    ref = StreamDecoder(config, n_channels=2, engine="device")

    got, exp = [], []
    hop = 9 * 375
    for lo in range(0, 45000, hop):
        block = stream[:, lo:lo + hop]
        got.extend(dec.push(block))
        exp.extend(ref.push(block))
    got.extend(dec.flush())

    def spotset(results):
        return {(ch, s.message) for ch, r in results for s in r.spots}

    assert spotset(got) == spotset(exp)
    assert (0, "VE3EMB FN25 30") in spotset(got)
    assert (1, "K1ABC FN42 37") in spotset(got)
    assert dec.stats.windows == ref.stats.windows


def test_batched_stream_decoder_default_batch_can_fill():
    """The ring must hold a full batch of ready windows.  Regression: with
    the default batch_windows=32 a capacity-2 ring saturated at 14 ready
    windows, so push() (which drains only complete batches) never fired
    and samples were silently dropped forever."""
    dec = BatchedStreamDecoder(n_channels=1)             # batch_windows=32
    scfg = dec.config.stream
    hop = scfg.shift * scfg.fs
    rng = np.random.default_rng(0)
    # fill to one window short of a full batch — no decode (and hence no
    # heavyweight W=32 compile); the old ring would have stuck at 14
    for _ in range(-(-scfg.fl // hop) + 30):   # 14 pushes to the first
        # window (fl is not a hop multiple), then 30 more windows
        block = (rng.normal(size=hop) + 1j * rng.normal(size=hop)
                 ).astype(np.complex64) * np.float32(0.01)
        assert dec.push(block[None, :]) == []
    assert dec.windower.ready == 31
    assert dec.windower.dropped == 0


def test_batched_stream_decoder_pads_flush():
    """flush() with fewer ready windows than batch_windows zero-pads the
    final batch and must not emit spots for the padding."""
    config = PipelineConfig(demod=DemodConfig(maxcycles=2000))
    dec = BatchedStreamDecoder(config, n_channels=1, batch_windows=8)
    z = awgn(synthesize_frame("VE3EMB", "FN25", 30, start_sample=100),
             -18, rng=np.random.default_rng(1))
    assert dec.push(z[None, :]) == []        # 1 window ready < batch of 8
    out = dec.flush()
    assert len(out) == 1
    ch, r = out[0]
    assert ch == 0
    assert "VE3EMB FN25 30" in [s.message for s in r.spots]
