"""Ordered-statistics decoding — the deep-SNR Fano fallback (fec/osd.py).

The reference has no equivalent: its only decoder is the 1994 Fano
sequential decoder (lib/Fano.cc), which hits the sequential-decoding
computational cutoff near -30 dB regardless of cycle budget. OSD inverts
the linear (162, 50) code on the most-reliable positions and re-encodes
low-order bit-flip patterns.
"""

import numpy as np
import pytest

from uwspr_tpu.config import DemodConfig, PipelineConfig
from uwspr_tpu.fec.osd import generator_matrix, osd_decode
from uwspr_tpu.io.channel import awgn
from uwspr_tpu.pipeline.decoder import WindowDecoder
from uwspr_tpu.protocol.fec_encode import encode_frame_bits
from uwspr_tpu.protocol.modulate import synthesize_frame

MSG = "VE3EMB FN25 30"


def test_generator_matrix_matches_encoder():
    """G @ u over GF(2) must equal the convolutional encoding of u."""
    G = generator_matrix()
    rng = np.random.default_rng(0)
    for _ in range(5):
        u = rng.integers(0, 2, 50).astype(np.uint8)
        np.testing.assert_array_equal((G @ u) % 2, encode_frame_bits(u))


@pytest.mark.parametrize("order", [2, 3, 4])
def test_osd_roundtrip_under_soft_noise(order):
    rng = np.random.default_rng(order)
    bits = rng.integers(0, 2, 50).astype(np.uint8)
    coded = encode_frame_bits(bits)
    soft = 128 + (2 * coded.astype(int) - 1) * 100
    noisy = np.clip(soft + rng.normal(0, 55, 162), 0, 255).astype(np.uint8)
    res = osd_decode(noisy, order=order)
    assert np.array_equal(res.info_bits, bits)
    assert res.quality > 0.5


def test_osd_corrects_hard_errors_beyond_fano_style_flips():
    """Plant 3 hard errors at moderately reliable positions: order-3+
    must recover, order-1 must not (the flips are independent)."""
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, 50).astype(np.uint8)
    coded = encode_frame_bits(bits)
    soft = (128 + (2 * coded.astype(int) - 1) * 60).astype(np.int64)
    soft += rng.integers(-20, 21, 162)
    flip = [10, 70, 140]
    soft[flip] = 256 - soft[flip]          # wrong side, same reliability
    soft = np.clip(soft, 0, 255).astype(np.uint8)
    res3 = osd_decode(soft, order=3)
    assert np.array_equal(res3.info_bits, bits)


def test_window_decoder_osd_fallback_recovers_deep_snr():
    """A -30 dB window the Fano budget cannot decode: osd_depth=4 must
    recover the message, tagged as an OSD spot (seed pre-screened:
    Fano fails, OSD succeeds)."""
    rng = np.random.default_rng(40002)
    f = float(rng.uniform(-5, 5))
    start = int(rng.integers(0, 750))
    z = awgn(synthesize_frame("VE3EMB", "FN25", 30, start_sample=start,
                              freq_offset=f), -30.0, rng=rng)
    base = WindowDecoder(PipelineConfig(demod=DemodConfig(maxcycles=2000)))
    assert MSG not in {s.message for s in base(z).spots}

    deep = WindowDecoder(PipelineConfig(
        demod=DemodConfig(maxcycles=2000, osd_depth=4)))
    spots = deep(z).spots
    by = {s.message: s for s in spots}
    assert MSG in by
    assert by[MSG].osd == 4


def test_hybrid_engine_osd_fallback():
    """The hybrid engine (device pipeline + host Fano) applies the same
    OSD fallback and tags the output."""
    from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder
    rng = np.random.default_rng(40002)
    f = float(rng.uniform(-5, 5))
    start = int(rng.integers(0, 750))
    z = awgn(synthesize_frame("VE3EMB", "FN25", 30, start_sample=start,
                              freq_offset=f), -30.0, rng=rng)
    dec = DeviceDecoder(PipelineConfig(
        demod=DemodConfig(maxcycles=2000, osd_depth=4)), fano_mode="host")
    out = dec(z)
    spots = dec.spots(out)
    by = {s.message: s for s in spots}
    assert MSG in by, sorted(by)
    assert by[MSG].osd == 4
