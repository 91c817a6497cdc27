"""Wideband (reference GRC default halfbandwidth=187) and multi-signal
stress coverage, including the fano_max_lanes overflow path.

The reference GRC block default searches the FULL spectrum: hpbm =
ceil(187/0.7324) = 256 bins, so the smoothing window starts at m-hpbm=0
(grc/uwspr_FDR.xml:31-36, lib/FDR_impl.cc:268-275) — the edge case the
narrowband example configs never touch.
"""

import numpy as np
import pytest

from uwspr_tpu.config import (
    CoarseConfig,
    DemodConfig,
    PipelineConfig,
)
from uwspr_tpu.io.channel import awgn, noise_sigma
from uwspr_tpu.pipeline.decoder import WindowDecoder
from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder
from uwspr_tpu.protocol.modulate import synthesize_frame

WIDEBAND = CoarseConfig(halfbandwidth=187, maxfreqs=32)


def test_wideband_passband_covers_full_spectrum():
    assert WIDEBAND.hpbm == 256          # smoothing window starts at bin 0
    with pytest.raises(ValueError):
        WindowDecoder(PipelineConfig(coarse=CoarseConfig(halfbandwidth=200)))


def test_wideband_decode_far_offsets():
    """Signals far outside the narrowband +/-10 Hz examples must decode
    when the passband is the reference default."""
    cfg = PipelineConfig(coarse=WIDEBAND, demod=DemodConfig(maxcycles=2000))
    dec = WindowDecoder(cfg)
    rng = np.random.default_rng(0)
    for f in (80.0, -150.0):
        z = awgn(synthesize_frame("K1ABC", "FN42", 37, start_sample=700,
                                  freq_offset=f), -18, rng=rng)
        spots = dec(z).spots
        msgs = {s.message for s in spots}
        assert "K1ABC FN42 37" in msgs, (f, msgs)
        s = next(s for s in spots if s.message == "K1ABC FN42 37")
        assert s.freq == pytest.approx(f, abs=0.4)


@pytest.mark.slow
def test_wideband_ten_signal_window_and_overflow():
    """A 10-signal wideband window (the BASELINE.md multi-candidate
    stress): all signals decode with the default lane budget; a tiny
    fano_max_lanes degrades gracefully and reports the overflow count."""
    rng = np.random.default_rng(1)
    sigma = noise_sigma(-15.0)
    z = (rng.normal(scale=sigma, size=45000)
         + 1j * rng.normal(scale=sigma, size=45000)).astype(np.complex64)
    calls = ["K1ABC", "W9XYZ", "VE3EMB", "K2DEF", "W8GHI",
             "N3JKL", "K4MNO", "W7PQR", "N5STU", "K6VWX"]
    freqs = np.linspace(-160, 160, 10)
    for call, f in zip(calls, freqs):
        z += synthesize_frame(call, "FN25", 30, pad_to=45000,
                              start_sample=600, freq_offset=float(f))

    cfg = PipelineConfig(coarse=WIDEBAND, demod=DemodConfig(maxcycles=2000))
    dec = DeviceDecoder(cfg)
    out = dec(z)
    msgs = set(dec.messages(out))
    assert int(out.fano_overflow) == 0
    missing = {f"{c} FN25 30" for c in calls} - msgs
    assert not missing, missing

    # overflow path: 10 candidates x 17 jiggles gate far more than 8 lanes
    cfg_small = PipelineConfig(
        coarse=WIDEBAND,
        demod=DemodConfig(maxcycles=2000, fano_max_lanes=8))
    dec_small = DeviceDecoder(cfg_small)
    out_small = dec_small(z)
    msgs_small = set(dec_small.messages(out_small))
    assert int(out_small.fano_overflow) > 0          # drop was observable
    assert 0 < len(msgs_small) < len(calls)          # degraded, not crashed
    assert msgs_small <= msgs

    # refine-lane compaction on the wideband batch (its payoff case:
    # C=32 lanes, ~10 worth): identical message set via the batched path
    cfg_comp = PipelineConfig(
        coarse=WIDEBAND,
        demod=DemodConfig(maxcycles=2000, refine_max_lanes=16))
    dec_comp = DeviceDecoder(cfg_comp)
    out_comp = dec_comp.decode_batch(z[None, :])
    msgs_comp = set(dec_comp.messages(out_comp.window(0)))
    assert msgs_comp == msgs, msgs ^ msgs_comp
    assert int(out_comp.fano_overflow.sum()) == 0
