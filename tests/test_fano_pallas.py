"""Bit-exactness of the Pallas Fano kernel against the Python oracle.

Covers the regimes that exercise every branch of the state machine:
clean decodes (forward-only), noisy decodes (deep backtracking), hopeless
lanes (full-budget timeout), tiny budgets (the timeout quirk), and
inactive lanes. Runs in the Pallas interpreter on the CPU grid; the
compiled Mosaic path is exercised on real TPU hardware by bench/serving
(same traced program, interpret flag only).
"""

import numpy as np
import pytest

from uwspr_tpu.fec.fano_pallas import fano_decode_batch
from uwspr_tpu.fec.fano_ref import fano_decode
from uwspr_tpu.protocol.constants import FANO_METTAB
from uwspr_tpu.protocol.fec_encode import encode_bits


def _lanes(rng, n, sigma, scale=50.0):
    """n soft-symbol lanes: encoded random payloads + gaussian noise.
    sigma ~ scale puts lanes near the decode threshold (deep
    backtracking); sigma >> scale makes them hopeless (timeouts)."""
    lanes = []
    for _ in range(n):
        bits = rng.integers(0, 2, size=50).astype(np.uint8)
        coded = encode_bits(np.concatenate([bits, np.zeros(31, np.uint8)]))
        soft = (np.where(coded == 1, 1.0, -1.0) * scale
                + rng.normal(0, sigma, 162) + 128)
        lanes.append(np.clip(soft, 0, 255).astype(np.uint8))
    return np.stack(lanes)


def _assert_matches_oracle(symbols, active=None, *, delta=60,
                           maxcycles=10000):
    succ, data, metric, cycles, maxnp = fano_decode_batch(
        symbols, FANO_METTAB, active, delta=delta, maxcycles=maxcycles,
        interpret=True)
    for i in range(len(symbols)):
        if active is not None and not active[i]:
            assert not succ[i]
            continue
        r = fano_decode(symbols[i], FANO_METTAB, delta=delta,
                        maxcycles=maxcycles)
        assert succ[i] == r.success, f"lane {i} success"
        assert metric[i] == r.metric, f"lane {i} metric"
        assert cycles[i] == r.cycles, f"lane {i} cycles"
        assert maxnp[i] == r.maxnp, f"lane {i} maxnp"
        if r.success:
            np.testing.assert_array_equal(data[i], r.data, f"lane {i} data")


def test_clean_decodes():
    rng = np.random.default_rng(0)
    _assert_matches_oracle(_lanes(rng, 6, sigma=10.0))


def test_noisy_backtracking():
    rng = np.random.default_rng(1)
    _assert_matches_oracle(_lanes(rng, 6, sigma=48.0))


def test_timeout_lanes():
    # pure noise: every lane exhausts the (small) budget; cycle counts and
    # the finish-on-last-cycle quirk must match the oracle exactly
    rng = np.random.default_rng(2)
    symbols = rng.integers(0, 256, size=(4, 162)).astype(np.uint8)
    _assert_matches_oracle(symbols, maxcycles=40)


def test_tiny_budget_mixed():
    rng = np.random.default_rng(3)
    lanes = np.concatenate([
        _lanes(rng, 3, sigma=45.0),
        rng.integers(0, 256, size=(3, 162)).astype(np.uint8),
    ])
    _assert_matches_oracle(lanes, maxcycles=25)


def test_inactive_lanes():
    rng = np.random.default_rng(4)
    lanes = _lanes(rng, 5, sigma=25.0)
    active = np.array([True, False, True, False, True])
    _assert_matches_oracle(lanes, active)


def test_matches_jax_backend_batch():
    """Cross-check the whole result dict against the lax.while_loop
    implementation on a mixed batch (both already oracle-exact)."""
    from uwspr_tpu.fec.fano_jax import fano_decode_batch_jax as jax_batch

    rng = np.random.default_rng(5)
    lanes = np.concatenate([
        _lanes(rng, 4, sigma=20.0),
        _lanes(rng, 4, sigma=50.0),
        rng.integers(0, 256, size=(2, 162)).astype(np.uint8),
    ])
    active = np.ones(10, bool)
    active[7] = False
    from uwspr_tpu.fec.fano_pallas import fano_decode_batch_pallas
    import jax.numpy as jnp
    a = fano_decode_batch_pallas(jnp.asarray(lanes, jnp.int32),
                                 jnp.asarray(FANO_METTAB),
                                 jnp.asarray(active), maxcycles=120,
                                 interpret=True)
    b = jax_batch(jnp.asarray(lanes, jnp.int32), jnp.asarray(FANO_METTAB),
                  jnp.asarray(active), maxcycles=120)
    assert set(a) == set(b)
    for key in a:
        np.testing.assert_array_equal(np.asarray(a[key]),
                                      np.asarray(b[key]), err_msg=key)


@pytest.mark.parametrize("L", [1, 129])
def test_lane_padding(L):
    """Lane counts off the 128 block size pad correctly."""
    rng = np.random.default_rng(6)
    lanes = _lanes(rng, L, sigma=15.0)
    succ, data, *_ = fano_decode_batch(lanes, FANO_METTAB, interpret=True,
                                       maxcycles=200)
    assert succ.shape == (L,)
    assert succ.all()
