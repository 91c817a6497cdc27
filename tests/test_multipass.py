"""Multipass successive-interference-cancellation decode.

A WSPR signal occupies ~6 Hz; a strong frame masks weaker co-channel
frames, and the reference (single-pass, candidates handled in isolation,
lib/sync_and_demodulate_impl.cc) cannot recover them. The multipass
decoder subtracts each decoded frame's fitted replica and re-decodes.
"""

import numpy as np

from uwspr_tpu.io.channel import awgn
from uwspr_tpu.pipeline.decoder import WindowDecoder
from uwspr_tpu.pipeline.multipass import multipass_spots, subtract_spot
from uwspr_tpu.protocol.modulate import synthesize_frame

STRONG = ("VE3EMB", "FN25", 30, "VE3EMB FN25 30")
WEAK = ("K1ABC", "FN42", 37, "K1ABC FN42 37")


def _masked_scene(seed, sep_hz=1.5, weak_rel_db=-9.0, strong_snr=-13.0):
    """Strong frame at 0 Hz + weak frame ``sep_hz`` away, AWGN."""
    rng = np.random.default_rng(seed)
    strong = synthesize_frame(*STRONG[:3],
                              start_sample=int(rng.integers(500, 2500)),
                              freq_offset=0.0)
    weak = synthesize_frame(*WEAK[:3],
                            start_sample=int(rng.integers(500, 2500)),
                            freq_offset=sep_hz)
    a = 10.0 ** (weak_rel_db / 20.0)
    return awgn(strong + a * weak, strong_snr, rng=rng)


def test_subtraction_cancels_decoded_frame():
    clean = synthesize_frame(*STRONG[:3], start_sample=750, freq_offset=1.23)
    rng = np.random.default_rng(0)
    noisy = awgn(clean, -15, rng=rng)
    dec = WindowDecoder()
    spots = dec(noisy).spots
    assert [s.message for s in spots] == [STRONG[3]]

    subtracted = subtract_spot(noisy, spots[0], dec.config)
    residual = subtracted - (noisy - clean)   # leftover signal energy
    depth_db = 10 * np.log10(np.mean(np.abs(residual) ** 2)
                             / np.mean(np.abs(clean) ** 2))
    assert depth_db < -18.0, depth_db


def test_subtraction_cancels_drifting_frame():
    """The polish must recover the residual drift the refinement quantized
    away (refine searches drift in +/-0.5 Hz steps): a 1 Hz/frame drifting
    frame still cancels deeply."""
    from uwspr_tpu.io.channel import apply_linear_drift
    clean = apply_linear_drift(
        synthesize_frame(*STRONG[:3], start_sample=800, freq_offset=0.5),
        1.0)
    noisy = awgn(clean, -15, rng=np.random.default_rng(2))
    dec = WindowDecoder()
    spots = dec(noisy).spots
    assert [s.message for s in spots] == [STRONG[3]]
    subtracted = subtract_spot(noisy, spots[0], dec.config)
    residual = subtracted - (noisy - clean)
    depth_db = 10 * np.log10(np.mean(np.abs(residual) ** 2)
                             / np.mean(np.abs(clean) ** 2))
    assert depth_db < -16.0, depth_db


def test_multipass_unmasks_weak_cochannel_signal():
    dec = WindowDecoder()
    z = _masked_scene(seed=100)
    spots = multipass_spots(z, lambda w: dec(w).spots, dec.config, passes=2)
    by_msg = {s.message: s for s in spots}
    assert STRONG[3] in by_msg and WEAK[3] in by_msg, sorted(by_msg)
    # pass_index proves the weak frame was NOT decodable in pass 0
    # (i.e. a single-pass decoder — the reference — misses it)
    assert by_msg[STRONG[3]].pass_index == 0
    assert by_msg[WEAK[3]].pass_index == 1


def test_stream_decoder_passes():
    from uwspr_tpu.pipeline.stream import StreamDecoder
    z = _masked_scene(seed=100)
    sd = StreamDecoder(engine="host", passes=2)
    msgs = {s.message
            for _, r in sd.push(z)
            for s in r.spots}
    assert {STRONG[3], WEAK[3]} <= msgs, msgs


def test_multipass_single_signal_no_duplicates():
    rng = np.random.default_rng(7)
    z = awgn(synthesize_frame(*STRONG[:3], start_sample=1200,
                              freq_offset=-2.0), -18, rng=rng)
    dec = WindowDecoder()
    spots = multipass_spots(z, lambda w: dec(w).spots, dec.config, passes=3)
    assert [s.message for s in spots] == [STRONG[3]]
    assert spots[0].pass_index == 0
