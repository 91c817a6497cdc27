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


# ---- on-device OSD (fec/osd_jax.py) -----------------------------------


def _quantized_soft(rng, nerr):
    """A codeword's soft symbols with nerr flips at random positions, in
    the uint8 Fano convention (shared by host and device paths)."""
    bits = rng.integers(0, 2, 50).astype(np.uint8)
    cw = encode_frame_bits(bits)
    rel = rng.uniform(5, 100, 162)
    soft = np.where(cw, 128 + rel, 128 - rel)
    err = rng.choice(162, nerr, replace=False)
    soft[err] = 256 - soft[err]
    return np.clip(np.round(soft), 0, 255).astype(np.uint8), bits


def test_device_osd_matches_host_osd():
    """osd2_decode_jax must pick the exact same order-2 codeword (and
    quality, and flip count) as the host fec/osd.osd_decode on identical
    quantized lanes."""
    import jax
    import jax.numpy as jnp

    from uwspr_tpu.fec.osd_jax import bits_to_payload, osd2_decode_jax
    from uwspr_tpu.protocol.fec_encode import bits_to_bytes

    G = generator_matrix()
    f = jax.jit(lambda s: osd2_decode_jax(s, G))
    rng = np.random.default_rng(5)
    for _ in range(8):
        soft, _ = _quantized_soft(rng, int(rng.integers(0, 12)))
        ref = osd_decode(soft, order=2)
        u, q, m, nf = f(jnp.asarray(soft, jnp.float32))
        np.testing.assert_array_equal(np.asarray(u), ref.info_bits)
        assert abs(float(q) - ref.quality) < 1e-3
        assert abs(float(m) - ref.margin) < 1e-3
        assert int(nf) == ref.flips
        pl = np.asarray(bits_to_payload(jnp.asarray(u)[None]))[0]
        assert bytes(pl) == bytes(bits_to_bytes(ref.info_bits)[:7])


def test_device_osd_quality_calibration():
    """Documents the quality-margin landscape the config default relies
    on (DemodConfig.osd_min_quality = 0.6): confident true rescues score
    > 0.9, noise-only lanes land in ~0.6-0.75 — so 0.6 only rejects
    degenerate lanes, and the authoritative noise screen is protocol
    unpacking at spot egress."""
    import jax
    import jax.numpy as jnp

    from uwspr_tpu.fec.osd_jax import osd2_decode_jax

    G = generator_matrix()
    f = jax.jit(lambda s: osd2_decode_jax(s, G))
    rng = np.random.default_rng(9)
    for _ in range(4):                       # confident rescues
        bits = rng.integers(0, 2, 50).astype(np.uint8)
        cw = encode_frame_bits(bits).astype(np.float64)
        soft = np.clip(np.round(128 + (2 * cw - 1) * 40
                                + rng.normal(0, 25, 162)), 0, 255)
        u, q, m, _ = f(jnp.asarray(soft, jnp.float32))
        assert np.array_equal(np.asarray(u), bits)
        assert float(q) > 0.85, float(q)
        # confident rescues clear the margin screen on their own
        assert float(m) > 0.02, float(m)
    for _ in range(6):                       # noise-only lanes
        soft = np.clip(np.round(128 + rng.normal(0, 30, 162)), 0, 255)
        _, q, m, _ = f(jnp.asarray(soft, jnp.float32))
        assert 0.55 < float(q) < 0.8, float(q)


def test_device_osd_noise_window_yields_no_spots():
    """A noise-only window through the device engine with OSD enabled:
    any OSD 'successes' on noise must be screened out at spot egress by
    protocol unpacking (seeded; the false-valid rate is quantified in
    SWEEP_OSD artifacts)."""
    from uwspr_tpu.io.channel import noise_sigma
    from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder

    rng = np.random.default_rng(33)
    sigma = noise_sigma(-14.0)
    z = (rng.normal(scale=sigma, size=45000)
         + 1j * rng.normal(scale=sigma, size=45000)).astype(np.complex64)
    dec = DeviceDecoder(PipelineConfig(
        demod=DemodConfig(maxcycles=64, n_jiggles=3, osd_depth=2)))
    assert dec.spots(dec(z)) == []


def test_device_engine_osd_fallback():
    """The all-device engine: a frame whose gated lanes all bust a
    crippled Fano budget is rescued by the in-program OSD, tagged
    Spot.osd == 2 — no host round trip (the device analogue of
    test_hybrid_engine_osd_fallback)."""
    from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder

    rng = np.random.default_rng(21)
    z = awgn(synthesize_frame("VE3EMB", "FN25", 30, start_sample=500,
                              freq_offset=1.0), -18.0, rng=rng)
    crippled = DeviceDecoder(PipelineConfig(
        demod=DemodConfig(maxcycles=1, n_jiggles=3)))
    assert MSG not in {s.message for s in crippled.spots(crippled(z))}

    dec = DeviceDecoder(PipelineConfig(
        demod=DemodConfig(maxcycles=1, n_jiggles=3, osd_depth=2)))
    by = {s.message: s for s in dec.spots(dec(z))}
    assert MSG in by, sorted(by)
    assert by[MSG].osd == 2


def test_device_engine_osd_batched_windows():
    """The vmapped window batch applies the cross-window OSD compaction:
    every window's failed worth lane is rescued in one OSD batch."""
    from uwspr_tpu.pipeline.jit_decoder import DeviceDecoder

    rng = np.random.default_rng(22)
    zs = np.stack([
        awgn(synthesize_frame("VE3EMB", "FN25", 30, start_sample=300 * w,
                              freq_offset=float(w) - 1.0), -18.0, rng=rng)
        for w in range(3)])
    dec = DeviceDecoder(PipelineConfig(
        demod=DemodConfig(maxcycles=1, n_jiggles=3, osd_depth=2)))
    out = dec.decode_batch(zs)
    for w in range(3):
        one = out.window(w)
        by = {s.message: s for s in dec.spots(one)}
        assert MSG in by, (w, sorted(by))
        assert by[MSG].osd == 2


def test_device_osd_order3_matches_host():
    """Order-3: the (K,K,K) inclusion-exclusion triple scoring must pick
    the exact same codeword (quality, flip count) as the host's
    sequential 19,600-triple walk on identical quantized lanes."""
    import jax
    import jax.numpy as jnp

    from uwspr_tpu.fec.osd_jax import osd2_decode_jax

    G = generator_matrix()
    f = jax.jit(lambda s: osd2_decode_jax(s, G, order=3))
    rng = np.random.default_rng(23)
    for _ in range(8):
        soft, _ = _quantized_soft(rng, int(rng.integers(0, 14)))
        ref = osd_decode(soft, order=3)
        u, q, m, nf = f(jnp.asarray(soft, jnp.float32))
        np.testing.assert_array_equal(np.asarray(u), ref.info_bits)
        assert abs(float(q) - ref.quality) < 1e-3
        assert abs(float(m) - ref.margin) < 1e-3
        assert int(nf) == ref.flips


def test_device_osd_order4_matches_host():
    """Order-4 (r5): the chunked +/-1-product quadruple scoring (one
    (K,K,K) tensor per leading flip index, fori_loop) must pick the same
    codeword (quality, flip count) as the host's blocked
    C(50,4)-combination walk on identical quantized lanes."""
    import jax
    import jax.numpy as jnp

    from uwspr_tpu.fec.osd_jax import osd2_decode_jax

    G = generator_matrix()
    f = jax.jit(lambda s: osd2_decode_jax(s, G, order=4))
    rng = np.random.default_rng(29)
    for _ in range(6):
        soft, _ = _quantized_soft(rng, int(rng.integers(0, 16)))
        ref = osd_decode(soft, order=4)
        u, q, m, nf = f(jnp.asarray(soft, jnp.float32))
        np.testing.assert_array_equal(np.asarray(u), ref.info_bits)
        assert abs(float(q) - ref.quality) < 1e-3
        assert abs(float(m) - ref.margin) < 1e-3
        assert int(nf) == ref.flips
