"""Fano decoder tests: roundtrip through the encoder and cross-backend
bit-exactness (ref oracle vs native C++ vs batched JAX)."""

import numpy as np
import pytest

from uwspr_tpu.fec import fano_decode_batch
from uwspr_tpu.fec.fano_ref import fano_decode
from uwspr_tpu.protocol.constants import FANO_METTAB
from uwspr_tpu.protocol.fec_encode import encode_bits
from uwspr_tpu.protocol.messages import pack_message


def _golden_lanes(n, sigma, seed=3, scale=50.0):
    payload = pack_message("VE3EMB", "FN25", 30)
    bits = np.unpackbits(payload[:7])[:50]
    coded = encode_bits(np.concatenate([bits, np.zeros(31, np.uint8)]))
    rng = np.random.default_rng(seed)
    lanes = np.stack([
        np.clip(np.where(coded == 1, 1.0, -1.0) * scale
                + rng.normal(0, sigma, 162) + 128, 0, 255).astype(np.uint8)
        for _ in range(n)])
    return payload, lanes


def test_clean_roundtrip():
    payload, lanes = _golden_lanes(1, 0.0)
    r = fano_decode(lanes[0])
    assert r.success
    assert np.array_equal(r.data[:7], payload[:7])
    assert r.maxnp == 80


def test_noisy_roundtrip_ref():
    payload, lanes = _golden_lanes(8, 45.0)
    ok = 0
    for lane in lanes:
        r = fano_decode(lane)
        if r.success and np.array_equal(r.data[:7], payload[:7]):
            ok += 1
    assert ok >= 6  # moderate noise: most lanes decode


def test_native_matches_ref():
    _, lanes = _golden_lanes(24, 50.0)
    sn, dn, mn, cn, xn = fano_decode_batch(lanes, backend="native",
                                           maxcycles=2000)
    for i, lane in enumerate(lanes):
        r = fano_decode(lane, maxcycles=2000)
        assert r.success == sn[i]
        assert np.array_equal(r.data, dn[i])
        assert r.metric == mn[i]
        assert r.cycles == cn[i]
        assert r.maxnp == xn[i]


@pytest.mark.slow
def test_jax_matches_native():
    _, lanes = _golden_lanes(16, 50.0)
    sj, dj, mj, cj, xj = fano_decode_batch(lanes, backend="jax", maxcycles=150)
    sn, dn, mn, cn, xn = fano_decode_batch(lanes, backend="native",
                                           maxcycles=150)
    assert np.array_equal(sj, sn)
    assert np.array_equal(dj, dn)
    assert np.array_equal(mj, mn)
    assert np.array_equal(cj, cn)
    assert np.array_equal(xj, xn)


def test_active_mask():
    payload, lanes = _golden_lanes(6, 20.0)
    active = np.array([True, False, True, False, True, False])
    s, d, *_ = fano_decode_batch(lanes, active=active, maxcycles=2000)
    assert not s[1] and not s[3] and not s[5]
    assert s[0] and np.array_equal(d[0][:7], payload[:7])


def test_timeout_reports_failure():
    rng = np.random.default_rng(0)
    junk = rng.integers(0, 256, (2, 162)).astype(np.uint8)
    s, d, m, c, x = fano_decode_batch(junk, backend="native", maxcycles=50)
    # pure noise: overwhelmingly likely to time out with tiny budget
    assert c[0] >= 50 * 81
